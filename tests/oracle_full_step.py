"""Independent full-step NumPy/scipy oracle for the msqg model.

This is the lockstep correctness harness demanded by BASELINE.md's north
star ("psi/q allclose vs reference after N steps of the double-gyre run").
qcc/Basilisk is NOT available in this environment, so a compiled-reference
trajectory cannot be produced here; this oracle is the documented fallback:
an independent NumPy transcription of one full reference time step --

  update_qg   /root/reference/msqg/qg.h:609-650
    invertq   :113-163  (elliptic inversion -- here an EXACT sparse-LU
                         solve of the same discrete operator)
    comp_del2 :171-200  (zeta = lap psi, Dirichlet ghosts + sbc overwrite)
    advection_pv :287-393 (Arakawa 12-pt + beta + stretch cascade + CFL)
    dissip    :406-422  (harmonic iRe + two-sweep biharmonic iRe4)
    ekman_friction :428-440, surface_forcing :446-459
  Basilisk predictor-corrector (SURVEY.md S3.1): dt = dtnext(update(q0));
    q_half = q0 + dq*dt/2; update(q_half); q_new = q0 + dq_mid*dt
  Basilisk timestep() CFL controller with the static `previous` smoothing
    (transcribed from /root/reference/qg-node/qg.h:258-284 which is
    "ajusted from timestep.h" and states the exact recurrence).

All arrays are float64, all stencils are written against explicitly padded
(N+2, N+2) arrays with slice offsets -- a different data path from the JAX
model's roll-based ghost views. The 12-point Jacobian here is validated
index-for-index against the per-cell loop transcription in
tests/reference_numpy.py (test_lockstep.py::test_oracle_matches_loop_level).

The PV inversion is exact (sparse LU of lap + Gamma with ghost = -interior
Dirichlet walls), matching the model's solver="spectral" direct solve to
roundoff -- strictly tighter than the reference's multigrid at tol = 1e-3
(msqg/qg.h:159). The mg-vs-exact trajectory gap is measured separately and
recorded in GOLDEN.md.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from tests.reference_numpy import layer_metrics_ref


def pad_dirichlet(a):
    """ghost = -interior (dirichlet(0) half a cell outside,
    /root/reference/msqg/layer.h:17-27); x first then y so corner ghosts get
    two sign flips (= +interior corner)."""
    out = np.empty(a.shape[:-2] + (a.shape[-2] + 2, a.shape[-1] + 2), a.dtype)
    out[..., 1:-1, 1:-1] = a
    out[..., 1:-1, 0] = -a[..., :, 0]
    out[..., 1:-1, -1] = -a[..., :, -1]
    out[..., 0, :] = -out[..., 1, :]
    out[..., -1, :] = -out[..., -2, :]
    return out


def pad_zeta(zeta, psi_pad, sbc, delta):
    """comp_del2 ghost handling (/root/reference/msqg/qg.h:181-198): default
    Dirichlet fill, then for sbc > 0 the partial-slip overwrite of the edge
    (non-corner) ghosts: zeta_ghost = c*(psi_in - psi_ghost)."""
    zp = pad_dirichlet(zeta)
    if sbc > 0:
        c = sbc / ((0.5 * sbc + 1.0) * delta * delta)
        zp[..., 1:-1, 0] = c * (psi_pad[..., 1:-1, 1] - psi_pad[..., 1:-1, 0])
        zp[..., 1:-1, -1] = c * (psi_pad[..., 1:-1, -2] - psi_pad[..., 1:-1, -1])
        zp[..., 0, 1:-1] = c * (psi_pad[..., 1, 1:-1] - psi_pad[..., 0, 1:-1])
        zp[..., -1, 1:-1] = c * (psi_pad[..., -2, 1:-1] - psi_pad[..., -1, 1:-1])
    return zp


def _sl(p, a, b):
    """Basilisk offset view: f[a,b] (a = x-offset, b = y-offset) of a padded
    array -> interior-shaped slice."""
    ny, nx = p.shape[-2] - 2, p.shape[-1] - 2
    return p[..., 1 + b:1 + b + ny, 1 + a:1 + a + nx]


def jacobian(pp, qp, delta):
    """-J(p, q): the 12-point Arakawa macro (/root/reference/msqg/qg.h:252-262)
    transcribed against padded arrays."""
    p = lambda a, b: _sl(pp, a, b)
    q = lambda a, b: _sl(qp, a, b)
    return ((q(1, 0) - q(-1, 0)) * (p(0, 1) - p(0, -1))
            + (q(0, -1) - q(0, 1)) * (p(1, 0) - p(-1, 0))
            + q(1, 0) * (p(1, 1) - p(1, -1))
            - q(-1, 0) * (p(-1, 1) - p(-1, -1))
            - q(0, 1) * (p(1, 1) - p(-1, 1))
            + q(0, -1) * (p(1, -1) - p(-1, -1))
            + p(0, 1) * (q(1, 1) - q(-1, 1))
            - p(0, -1) * (q(1, -1) - q(-1, -1))
            - p(1, 0) * (q(1, 1) - q(1, -1))
            + p(-1, 0) * (q(-1, 1) - q(-1, -1))) / (12.0 * delta * delta)


def laplacian(p, delta):
    return (_sl(p, 1, 0) + _sl(p, -1, 0) + _sl(p, 0, 1) + _sl(p, 0, -1)
            - 4.0 * _sl(p, 0, 0)) / (delta * delta)


class Oracle:
    """One reference msqg time step, exactly (free/partial-slip walls,
    uniform stratification, no tracers/stochastic/topography)."""

    def __init__(self, cfg, pp=None):
        if cfg.sbc == -1:
            raise NotImplementedError("oracle covers wall BCs (sbc >= 0)")
        self.cfg = cfg
        N, nl = cfg.N, cfg.nl
        self.delta = h = cfg.L0 / N
        dh = np.asarray(cfg.dh[:nl], np.float64)
        _, self.idh0, self.idh1 = layer_metrics_ref(dh)
        Fr = np.asarray(cfg.Fr[:nl - 1], np.float64)
        self.strl = (Fr / cfg.Rom) ** 2                       # (nl-1,) uniform
        self.DT = cfg.dt_clamped()

        y = (np.arange(N, dtype=np.float64) + 0.5) * h
        self.wind = (cfg.tau0 / (cfg.Rom * dh[0])
                     * np.sin(2 * np.pi * y / cfg.L0)
                     * np.sin(np.pi * y / cfg.L0))[:, None] * np.ones(N)
        self.dh = dh
        # large-scale psi (pp): zero by default (no PG inputs)
        self.pp_pad = (np.zeros((nl, N + 2, N + 2))
                       if pp is None else pad_dirichlet(np.asarray(pp)))

        # exact inversion operator: A = I_nl x L2d + Gamma x I_{N^2},
        # L2d the 5-point Laplacian with ghost = -interior walls
        main = -2.0 * np.ones(N)
        main[0] = main[-1] = -3.0          # Dirichlet half-cell wall
        T = sp.diags([np.ones(N - 1), main, np.ones(N - 1)],
                     [-1, 0, 1]) / h ** 2
        I_N = sp.identity(N)
        L2d = sp.kron(T, I_N) + sp.kron(I_N, T)               # (j slow, i fast)
        G = np.zeros((nl, nl))
        for l in range(nl):
            if l > 0:
                G[l, l - 1] += self.strl[l - 1] * self.idh0[l]
                G[l, l] -= self.strl[l - 1] * self.idh0[l]
            if l < nl - 1:
                G[l, l + 1] += self.strl[l] * self.idh1[l]
                G[l, l] -= self.strl[l] * self.idh1[l]
        A = sp.kron(sp.identity(nl), L2d) + sp.kron(G, sp.identity(N * N))
        self.lu = spla.splu(A.tocsc())
        self.G = G

    # -- operators ---------------------------------------------------------
    def stretch(self, a):
        """comp_stretch (/root/reference/msqg/qg.h:202-246) via the same
        tridiagonal coupling matrix used in the inversion operator."""
        return np.einsum("lm,myx->lyx", self.G, a)

    def comp_q(self, psi):
        return laplacian(pad_dirichlet(psi), self.delta) + self.stretch(psi)

    def invert(self, q):
        nl, N = self.cfg.nl, self.cfg.N
        return self.lu.solve(q.reshape(-1)).reshape(nl, N, N)

    def rhs(self, q, psi):
        """update_qg tendency assembly (/root/reference/msqg/qg.h:609-650)."""
        cfg, h, nl = self.cfg, self.delta, self.cfg.nl
        psi_pad = pad_dirichlet(psi)
        zeta = laplacian(psi_pad, h)
        zeta_pad = pad_zeta(zeta, psi_pad, cfg.sbc, h)
        pp_pad = self.pp_pad
        dq = np.zeros_like(q)

        if nl > 1:
            # advection_pv (:287-393): -J conventions via the jacobian macro
            dq += jacobian(psi_pad, zeta_pad, h) + jacobian(pp_pad, zeta_pad, h)
            # beta_effect (:269): beta*(po[-1] - po[1])/(2 Delta)
            dq += cfg.beta * (_sl(psi_pad, -1, 0) - _sl(psi_pad, 1, 0)) / (2 * h)
            # stretch-Jacobian cascade ju/jd
            jd_all = (jacobian(psi_pad[:-1], psi_pad[1:], h)
                      + jacobian(pp_pad[:-1], psi_pad[1:], h)
                      + jacobian(psi_pad[:-1], pp_pad[1:], h))  # (nl-1, N, N)
            for l in range(nl - 1):
                dq[l] += self.strl[l] * jd_all[l] * self.idh1[l]
                dq[l + 1] -= self.strl[l] * jd_all[l] * self.idh0[l + 1]

        # dissip (:406-422)
        if cfg.iRe != 0.0:
            dq += cfg.iRe * (self.stretch(zeta) + laplacian(zeta_pad, h))
        if cfg.iRe4 != 0.0:
            tmp = laplacian(zeta_pad, h)
            tmp_pad = pad_zeta(tmp, zeta_pad, cfg.sbc, h)
            dq += cfg.iRe4 * (self.stretch(tmp) + laplacian(tmp_pad, h))

        # ekman_friction (:428-440)
        if cfg.Eks != 0.0:
            dq[0] -= cfg.Eks / (cfg.Rom * 2 * self.dh[0]) * zeta[0]
        if cfg.Ekb != 0.0:
            dq[nl - 1] -= cfg.Ekb / (cfg.Rom * 2 * self.dh[nl - 1]) * zeta[nl - 1]

        # surface_forcing (:446-459)
        dq[0] -= self.wind
        return dq, psi_pad, pp_pad

    # -- CFL controller ----------------------------------------------------
    def face_umax(self, p_pad):
        """max |uf| over ALL faces (incl. boundary faces), comp_vel
        (/root/reference/msqg/qg.h:275-283): uf.x = -avg d psi/dy of the two
        adjacent cells; uf.y = +avg d psi/dx."""
        h = self.delta
        # cell-centered derivatives on the padded array (ghost cells included
        # need their own neighbors: build a wider view via the pad of the pad)
        # x-faces between (i-1, i) for i = 0..N: need d/dy at ghost columns.
        dpy = (p_pad[..., 2:, :] - p_pad[..., :-2, :]) / (2 * h)   # (N, N+2)
        ux = -0.5 * (dpy[..., :, 1:] + dpy[..., :, :-1])           # (N, N+1)
        dpx = (p_pad[..., :, 2:] - p_pad[..., :, :-2]) / (2 * h)   # (N+2, N)
        uy = 0.5 * (dpx[..., 1:, :] + dpx[..., :-1, :])            # (N+1, N)
        return max(np.abs(ux).max(), np.abs(uy).max())

    def timestep(self, umax, dtmax, previous):
        """Basilisk timestep()/adjust_dt recurrence
        (/root/reference/qg-node/qg.h:258-284)."""
        if umax > 0:
            dtmax = min(dtmax, self.cfg.CFL * self.delta / umax)
        if dtmax > previous:
            dtmax = (previous + 0.1 * dtmax) / 1.1
        return dtmax, dtmax

    def cfl(self, psi_pad, pp_pad, previous):
        """advection_pv dtmax chain (:383-391): per layer, psi then pp,
        sharing the `previous` state."""
        dtm = self.DT
        for l in range(self.cfg.nl):
            dtm, previous = self.timestep(self.face_umax(psi_pad[l]), dtm,
                                          previous)
            dtm, previous = self.timestep(self.face_umax(pp_pad[l]), dtm,
                                          previous)
        return dtm, previous

    @staticmethod
    def dtnext(t, tnext, dt):
        """Basilisk events.h dtnext (TEPS = 1e-9)."""
        dd = tnext - t
        n = np.floor(dd / dt)
        if n == 0:
            return dd
        dt1 = dd / n
        if dt1 > dt * (1.0 + 1e-9):
            dt1 = dd / (n + 1)
        return min(dt, dt1)

    # -- full predictor-corrector step --------------------------------------
    def step(self, q, psi, prev, t, tnext):
        """Returns (q_new, psi_new, prev_new, dt, ke)."""
        dq, psi_pad, pp_pad = self.rhs(q, self.invert(q))
        dtm, prev = self.cfl(psi_pad, pp_pad, prev)
        dt = self.dtnext(t, tnext, dtm)
        q_half = q + dq * (dt / 2)
        dq2, psi2_pad, _ = self.rhs(q_half, self.invert(q_half))
        _, prev = self.cfl(psi2_pad, pp_pad, prev)
        q_new = q + dq2 * dt
        psi2 = psi2_pad[:, 1:-1, 1:-1]
        ke = -np.sum(0.5 * psi2[0] * laplacian(pad_dirichlet(psi2[0]),
                                               self.delta)) * self.delta ** 2
        return q_new, psi2, prev, dt, ke
