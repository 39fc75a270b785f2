"""Multi-layer multiple-scale quasi-geostrophic model (msqg).

TPU-native re-implementation of the reference dynamical core
/root/reference/msqg/qg.h: nondimensional multi-layer QG with PV inversion,
Arakawa advection with large-scale (PG) coupling, harmonic + biharmonic
dissipation, Ekman friction, double-gyre wind forcing, bottom topography,
passive tracers and stochastic forcing, stepped with Basilisk's 2nd-order
predictor-corrector and CFL-controlled adaptive dt.

State is a pytree of (nl, N, N) arrays; every reference foreach/layer loop is
a vectorized array op (layer coupling via shifted slices), the per-cell
tridiagonal inversion is the red-black line multigrid in msom_tpu.solvers.mg,
and the whole step (including the elliptic while_loop) jits into a single XLA
computation suitable for lax.scan time loops and GSPMD sharding.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from msom_tpu.ops.bc import BC, pad, pad_zeta_slip
from msom_tpu.ops import ghost
from msom_tpu.ops.ghost import (Ghosted, arakawa_mjac_g, beta_effect_g,
                                max_face_speed_layers,
                                ghosted, ghosted_from_padded, ghosted_slip,
                                laplacian_g, max_face_speed)
from msom_tpu.ops.stencil import (arakawa_mjac, beta_effect, face_velocities,
                                  laplacian)
from msom_tpu.ops.stretch import layer_metrics, stretch
from msom_tpu.params import QGConfig
from msom_tpu.solvers import mg


@dataclasses.dataclass(frozen=True)
class QGConstants:
    """Time-independent fields derived at setup (set_const,
    /root/reference/msqg/qg.h:931-1116)."""
    pp_pad: jnp.ndarray        # (nl, N+2, N+2) large-scale psi, ghosts filled
    zetap_pad: jnp.ndarray     # (nl, N+2, N+2) large-scale rel. vorticity
    strl: jnp.ndarray | None   # (nl-1, N, N) stretching (Fr/Ro)^2
    Ro: jnp.ndarray            # (N, N) Rossby number field
    topo_pad: jnp.ndarray | None   # (N+2, N+2)
    qforc: jnp.ndarray | None  # (nl, N, N) 3-D forcing
    wind: jnp.ndarray          # (N, N) surface forcing term for layer 0
    s_stoch: jnp.ndarray | None    # (nl, N, N) stochastic noise sigma
    ptr_relax: jnp.ndarray | None  # (nl, nptr, N, N)
    sig_lev: tuple | None      # per-level wavelet filter weights (high-pass)
    iBu: jnp.ndarray | None    # (nl, N, N) modal Helmholtz coeffs (<= 0)
    l2m: jnp.ndarray | None    # layer->mode matrices
    m2l: jnp.ndarray | None
    levels: Any                # multigrid levels pytree
    mlevels: Any               # modal-path multigrid levels (or None)
    idh0: tuple                # hashable: pytree metadata
    idh1: tuple
    rhsk: Any = None           # pallas_rhs.RhsKernelData fast path (or None)
    spec: Any = None           # spectral.SpectralData direct inversion (or None)
    sig_filt: Any = None       # (N, N) wavelet cutoff min(afilt*Rd, Lfmax)
    Rd: Any = None             # (N, N) deformation radius used for sig_filt


jax.tree_util.register_dataclass(
    QGConstants,
    data_fields=["pp_pad", "zetap_pad", "strl", "Ro", "topo_pad", "qforc",
                 "wind", "s_stoch", "ptr_relax", "sig_lev", "iBu", "l2m",
                 "m2l", "levels", "mlevels", "rhsk", "spec", "sig_filt",
                 "Rd"],
    meta_fields=["idh0", "idh1"])


@dataclasses.dataclass
class QGState:
    q: jnp.ndarray             # (nl, N, N) potential vorticity
    psi: jnp.ndarray           # (nl, N, N) streamfunction (warm start / diag)
    t: jnp.ndarray             # scalar model time
    dt_prev: jnp.ndarray       # CFL controller smoothing state (timestep.h)
    i: jnp.ndarray             # step counter
    key: jnp.ndarray           # PRNG key (stochastic forcing)
    tracers: jnp.ndarray | None = None   # (nl, nptr, N, N)
    qof: jnp.ndarray | None = None       # (nl, N, N) filter-mean accumulator
    nbar: jnp.ndarray | None = None      # filter-mean counter
    psi_old: jnp.ndarray | None = None   # previous step's psi (mg_extrap
    #                                      warm-start state; None on the
    #                                      direct-solve paths)


jax.tree_util.register_dataclass(
    QGState,
    data_fields=["q", "psi", "t", "dt_prev", "i", "key", "tracers", "qof",
                 "nbar", "psi_old"],
    meta_fields=[])


class StepDiag(NamedTuple):
    dt: jnp.ndarray
    ke: jnp.ndarray            # surface-layer kinetic energy (writestdout)
    mg_iters: jnp.ndarray
    mg_res: jnp.ndarray


def _dtype(cfg: QGConfig):
    return jnp.dtype(cfg.dtype)


def _bc_psi(cfg: QGConfig) -> BC:
    return BC.PERIODIC if cfg.sbc == -1 else BC.DIRICHLET


def build_constants(cfg: QGConfig, *, psipg=None, frpg=None, rdpg=None,
                    topo=None, qforc=None, dh=None, s_stoch=None,
                    ptr_relax=None) -> QGConstants:
    """Derive the static model fields. Optional arrays override the defaults
    exactly as the reference's input files do (psipg_*.bas etc.,
    /root/reference/msqg/qg.h:950-985)."""
    dt = _dtype(cfg)
    nl, N = cfg.nl, cfg.N
    dh = np.asarray(dh if dh is not None else cfg.dh[:nl], np.float64)
    _, idh0, idh1 = layer_metrics(dh)

    x = (np.arange(N, dtype=np.float64) + 0.5) * cfg.delta
    X, Y = np.meshgrid(x, x, indexing="xy")

    # large-scale streamfunction: pp = vpg*x - upg*y (msqg/qg.h:904-909)
    upg = np.zeros(nl)
    vpg = np.zeros(nl)
    upg[:len(cfg.upg)] = cfg.upg[:nl]
    vpg[:len(cfg.vpg)] = cfg.vpg[:nl]
    have_pg = psipg is not None or np.any(upg[:nl]) or np.any(vpg[:nl])
    if psipg is not None:
        pp = np.asarray(psipg, np.float64)
    else:
        pp = vpg[:, None, None] * X - upg[:, None, None] * Y

    if not have_pg:
        # no large-scale coupling: pp == 0 identically, so every J(.,pp)
        # term vanishes — prune them statically (pp_pad=None) so the RHS and
        # CFL chain skip ~half their stencil work in the uncoupled case
        pp_pad = None
    elif cfg.sbc == -1:
        # periodic run: pp ghosts follow dirichlet(vpg*x - upg*y) applied to
        # the non-periodic large-scale field (msqg/qg.h:1105-1114):
        # ghost = 2*value(face) - interior.
        def fbc(xg, yg):
            return vpg[:, None, None] * xg - upg[:, None, None] * yg
        pp_pad = np.zeros((nl, N + 2, N + 2))
        pp_pad[:, 1:-1, 1:-1] = pp
        xl, xr = 0.0, cfg.L0
        pp_pad[:, 1:-1, 0] = 2 * (vpg[:, None] * xl - upg[:, None] * x) - pp[:, :, 0]
        pp_pad[:, 1:-1, -1] = 2 * (vpg[:, None] * xr - upg[:, None] * x) - pp[:, :, -1]
        xpad = np.concatenate([[x[0] - cfg.delta], x, [x[-1] + cfg.delta]])
        pp_pad[:, 0, :] = 2 * (vpg[:, None] * xpad - upg[:, None] * 0.0) - pp_pad[:, 1, :]
        pp_pad[:, -1, :] = 2 * (vpg[:, None] * xpad - upg[:, None] * cfg.L0) - pp_pad[:, -2, :]
        pp_pad = jnp.asarray(pp_pad, dt)
    else:
        pp_pad = pad(jnp.asarray(pp, dt), BC.DIRICHLET)

    # variable Rossby number (msqg/qg.h:1032-1037)
    if cfg.varRo > 0:
        Ro = cfg.Rom / (1.0 + cfg.Rom * cfg.beta * (Y - 0.5 * cfg.L0))
    else:
        Ro = np.full((N, N), cfg.Rom)

    # stretching strl = (Fr/Ro)^2 at the nl-1 interfaces (msqg/qg.h:1043-1048)
    strl = None
    if nl > 1:
        if frpg is not None:
            Fr = np.asarray(frpg, np.float64)[:nl - 1]
        else:
            Fr = np.asarray(cfg.Fr[:nl - 1], np.float64)[:, None, None] \
                * np.ones((nl - 1, N, N))
        strl = jnp.asarray((Fr / Ro) ** 2, dt)

    # large-scale relative vorticity (only if flsrv, msqg/qg.h:1094-1096)
    if cfg.flsrv == 1 and pp_pad is not None:
        zetap = laplacian(pp_pad, cfg.delta)
        zetap_pad = pad(zetap, _bc_psi(cfg))
    else:
        zetap_pad = None

    # surface forcing field (msqg/qg.h:446-459): dq0 -= wind
    wind = jnp.asarray(
        cfg.tau0 / (cfg.Rom * dh[0]) * np.sin(2 * np.pi * Y / cfg.L0)
        * np.sin(np.pi * Y / cfg.L0), dt)

    topo_pad = None
    if topo is not None:
        topo_pad = pad(jnp.asarray(topo, dt), BC.NEUMANN)

    levels = mg.build_layered_coeffs(nl=nl, N=N, L0=cfg.L0, s=strl,
                                     idh0=idh0, idh1=idh1, dtype=dt,
                                     pallas=cfg.use_pallas)

    # vertical modes (modal inversion path, MODE_PV_INVERT): one eigensolve
    # per distinct column — uniform or a y-batch for varRo (eigmode.h re-design,
    # SURVEY.md §7)
    iBu = l2m = m2l = None
    mlevels = None
    Rd_modal = None
    if cfg.mode_pv_invert and nl > 1:
        from msom_tpu.ops import modes as modes_mod
        s_np = np.asarray(strl, np.float64)            # (nl-1, N, N)
        if np.allclose(s_np, s_np[:, :1, :1]):         # uniform column
            vm = modes_mod.eigmod(dh, s_np[:, 0, 0])
            iBu_f = np.broadcast_to(vm.iBu[:, None, None], (nl, N, N))
            Rd_modal = float(vm.Rd[1]) * np.ones((N, N))
        elif np.allclose(s_np, s_np[..., :1]):         # y-varying (varRo)
            vm = modes_mod.eigmod(dh, np.moveaxis(s_np[..., 0], 0, -1))
            iBu_f = np.broadcast_to(np.moveaxis(vm.iBu, -1, 0)[..., None],
                                    (nl, N, N))
            Rd_modal = np.broadcast_to(vm.Rd[:, 1][:, None], (N, N))
        else:                                          # fully varying
            vm = modes_mod.eigmod(dh, np.moveaxis(s_np, 0, -1))
            iBu_f = np.moveaxis(vm.iBu, -1, 0)
            Rd_modal = vm.Rd[..., 1]
        iBu = jnp.asarray(iBu_f, dt)
        l2m = jnp.asarray(vm.l2m, dt)
        m2l = jnp.asarray(vm.m2l, dt)
        mlevels = mg.build_layered_coeffs(nl=nl, N=N, L0=cfg.L0, s=None,
                                          lam=iBu, dtype=dt,
                                          pallas=cfg.use_pallas)

    # wavelet filter scale sig_filt = min(afilt*Rd, Lfmax) and per-level
    # high-pass weights (msqg/qg.h:1052-1090); Rd defaults to 1, overridden
    # by the rdpg input field; the modal path uses the first-baroclinic
    # deformation radius sqrt(-1/iBu_1) (msqg/qg.h:1052-1057).
    from msom_tpu.ops.wavelet import sig_lev_pyramid
    if cfg.mode_pv_invert and Rd_modal is not None:
        Rd = Rd_modal
    else:
        Rd = np.ones((N, N)) if rdpg is None else np.asarray(rdpg, np.float64)
    sig_filt = np.minimum(cfg.afilt * Rd, cfg.Lfmax)
    sig_lev = tuple(jnp.asarray(s_, dt)
                    for s_ in sig_lev_pyramid(sig_filt, cfg.L0))

    # direct spectral inversion (solver="spectral"): exact one-shot solve.
    # Uniform strl (varRo == 0, no frpg) -> modal DST/FFT diagonalization;
    # y-varying strl (varRo, or a y-profile frpg) -> the FACR-style
    # DST-in-x + block-Thomas-in-y direct solve (solvers/vary.py). Only a
    # fully 2-D-varying frpg still requires the multigrid.
    spec = None
    if cfg.solver == "spectral":
        from msom_tpu.solvers import spectral as spectral_mod
        if spectral_mod.applicable(nl, strl):
            sprof_spec = None if strl is None else np.asarray(strl)[:, 0, 0]
            spec = spectral_mod.build_spectral(
                nl=nl, N=N, L0=cfg.L0, dh=dh, s_profile=sprof_spec,
                periodic=(cfg.sbc == -1), dtype=dt, transform=cfg.transform)
        else:
            from msom_tpu.solvers import vary as vary_mod
            if not vary_mod.applicable(strl) or cfg.sbc == -1:
                raise ValueError(
                    "solver='spectral' requires stretching uniform or "
                    "varying in y only, walled BCs (x-varying frpg or "
                    "periodic varRo: use solver='mg')")
            spec = vary_mod.build_spectral_vary(
                nl=nl, N=N, L0=cfg.L0,
                s_prof=np.asarray(strl)[..., 0], idh0=idh0, idh1=idh1,
                dtype=dt, transform=cfg.transform)

    # fused Pallas RHS fast path: every walled (sbc >= 0) configuration —
    # coupled (PG/topo/qforc/tracers) or not, standard/stochastic/EC
    # advection — plus the plain doubly-periodic case, with y-profile
    # (x-constant) strl/wind/Ro (build_kernel_data decides)
    rhsk = None
    if cfg.use_pallas:
        from msom_tpu.models import pallas_rhs
        ok, sprof = pallas_rhs.strl_profile(strl)
        if ok:
            rhsk = pallas_rhs.build_kernel_data(
                cfg, np.asarray(wind), sprof, Ro=Ro,
                pp_pad=pp_pad, topo_pad=topo_pad, zetap_pad=zetap_pad,
                need_q=bool(cfg.stochastic or cfg.energy_conserv),
                has_qforc=qforc is not None)

    return QGConstants(
        pp_pad=pp_pad, zetap_pad=zetap_pad, strl=strl,
        Ro=jnp.asarray(Ro, dt), topo_pad=topo_pad,
        qforc=None if qforc is None else jnp.asarray(qforc, dt),
        wind=wind,
        s_stoch=None if s_stoch is None else jnp.asarray(s_stoch, dt),
        ptr_relax=None if ptr_relax is None else jnp.asarray(ptr_relax, dt),
        sig_lev=sig_lev, iBu=iBu, l2m=l2m, m2l=m2l, levels=levels,
        mlevels=mlevels, idh0=tuple(float(v) for v in idh0),
        idh1=tuple(float(v) for v in idh1), rhsk=rhsk, spec=spec,
        sig_filt=jnp.asarray(sig_filt, dt), Rd=jnp.asarray(Rd, dt))


def comp_q(cfg: QGConfig, const: QGConstants, psi: jnp.ndarray) -> jnp.ndarray:
    """q = lap(psi) + Gamma(psi) (comp_q, /root/reference/msqg/qg.h:396-403)."""
    q = laplacian_g(ghosted(psi, _bc_psi(cfg)), cfg.delta)
    if cfg.nl > 1:
        q = q + stretch(psi, const.strl, const.idh0, const.idh1)
    return q


def invert_q(cfg: QGConfig, const: QGConstants, psi_guess, q):
    """PV inversion psi = L^-1 q, warm-started (invertq,
    /root/reference/msqg/qg.h:113-163; tolerance 1e-3 at :159).

    The modal path (MODE_PV_INVERT, :116-157) projects q onto vertical modes
    with a batched matmul, solves nl INDEPENDENT 2-D Helmholtz problems in
    one batched multigrid (no vertical coupling -> the line solver
    degenerates to a diagonal), and projects back.

    The spectral path (solver="spectral") solves the same discrete system
    exactly in one shot — see solvers/spectral.py — so iters=0 and the
    reported residual is 0 by construction."""
    if const.spec is not None:
        from msom_tpu.solvers import spectral as spectral_mod
        from msom_tpu.solvers import vary as vary_mod
        if isinstance(const.spec, vary_mod.VarySpectralData):
            psi = vary_mod.solve_spectral_vary(const.spec, q)
        else:
            psi = spectral_mod.solve_spectral(const.spec, q)
        z = jnp.zeros((), q.dtype)
        return psi, mg.MGStats(iters=jnp.zeros((), jnp.int32), resb=z,
                               resa=z, nrelax=jnp.zeros((), jnp.int32))
    if cfg.mode_pv_invert and const.iBu is not None:
        from msom_tpu.ops import modes as modes_mod
        vm = modes_mod.VerticalModes(l2m=const.l2m, m2l=const.m2l,
                                     iBu=None, Rd=None)
        qm = modes_mod.to_modes(vm, q)
        pm_guess = modes_mod.to_modes(vm, psi_guess)
        pm, st = mg.solve_layered(pm_guess, qm, L0=cfg.L0, s=None,
                                  lam=const.iBu, bc=_bc_psi(cfg),
                                  tolerance=cfg.tol, levels=const.mlevels)
        return modes_mod.to_layers(vm, pm), st
    return mg.solve_layered(psi_guess, q, L0=cfg.L0, s=const.strl,
                            idh0=const.idh0, idh1=const.idh1,
                            bc=_bc_psi(cfg), tolerance=cfg.tol,
                            levels=const.levels)


def init_state(cfg: QGConfig, const: QGConstants, *, psi0=None, seed=0,
               tracers0=None) -> QGState:
    """Initial conditions: psi from p0 array or 1e-3 noise, zero-mean for the
    periodic case, then q = comp_q(psi) (/root/reference/msqg/qg.c:53-92 and
    qg.h:1092)."""
    dt = _dtype(cfg)
    key = jax.random.PRNGKey(seed)
    if psi0 is None:
        key, sub = jax.random.split(key)
        # reference noise() is uniform in [-1, 1]
        psi = 1e-3 * jax.random.uniform(sub, (cfg.nl, cfg.N, cfg.N), dt,
                                        minval=-1.0, maxval=1.0)
    else:
        psi = jnp.asarray(psi0, dt)
    psi = psi - jnp.mean(psi, axis=(-2, -1), keepdims=True)
    q = comp_q(cfg, const, psi)
    tracers = None
    qof = None
    nbar = None
    if cfg.nptr > 0:
        if tracers0 is None:
            key, sub = jax.random.split(key)
            tracers = 1e-3 * jax.random.uniform(
                sub, (cfg.nl, cfg.nptr, cfg.N, cfg.N), dt, minval=-1., maxval=1.)
        else:
            tracers = jnp.asarray(tracers0, dt)
    if cfg.dtflt > 0:
        qof = jnp.zeros_like(q)
        nbar = jnp.asarray(0, jnp.int32)
    # mg warm-start extrapolation state (guess = 2 psi - psi_old); starts
    # equal to psi so the first step's guess degenerates to psi itself
    psi_old = psi if (cfg.solver == "mg" and cfg.mg_extrap) else None
    return QGState(q=q, psi=psi, t=jnp.asarray(0.0, dt),
                   dt_prev=jnp.asarray(0.0, dt), i=jnp.asarray(0, jnp.int32),
                   key=key, tracers=tracers, qof=qof, nbar=nbar,
                   psi_old=psi_old)


# ---------------------------------------------------------------------------
# RHS assembly
# ---------------------------------------------------------------------------

def _pad_deriv(cfg, field, parent_pad):
    """Ghost pad for a Laplacian-derived field: periodic, or Dirichlet with
    the partial-slip overwrite relative to its parent (comp_del2 sbc branch,
    /root/reference/msqg/qg.h:183-198)."""
    if cfg.sbc == -1:
        return pad(field, BC.PERIODIC)
    return pad_zeta_slip(field, parent_pad, cfg.sbc, cfg.delta)


def _ghost_deriv(cfg, field, parent_g: Ghosted) -> Ghosted:
    """Roll-based version of _pad_deriv."""
    if cfg.sbc == -1:
        return ghosted(field, BC.PERIODIC)
    return ghosted_slip(field, parent_g, cfg.sbc, cfg.delta)


def rhs(cfg: QGConfig, const: QGConstants, q, psi, psi_g: Ghosted, zeta,
        zeta_g: Ghosted, tracers, *, ghost_deriv_fn=None, ghost_fn=None,
        from_padded_fn=None):
    """Full tendency assembly (update_qg, /root/reference/msqg/qg.h:609-650).

    Returns (dq, dtracers). The advected vorticity is zeta (advection_pv is
    called with zetal in the qol slot, qg.h:623), with the stretching-Jacobian
    cascade supplying the remaining part of J(psi, q).

    `from_padded_fn` builds the Ghosted view of the PADDED constant fields
    (pp/zetap/topo, whose ghosts carry custom boundary laws precomputed at
    setup): the default reads the global padded array; the explicit sharded
    step passes a window-slicer that cuts this device's (tile + ghost ring)
    window out of the replicated padded constant (parallel/step.py)."""
    d = cfg.delta
    nl = cfg.nl
    mj = arakawa_mjac_g
    if ghost_deriv_fn is None:
        ghost_deriv_fn = lambda f, parent: _ghost_deriv(cfg, f, parent)
    if ghost_fn is None:
        ghost_fn = ghosted
    if from_padded_fn is None:
        from_padded_fn = ghosted_from_padded
    have_pg = const.pp_pad is not None
    pp = from_padded_fn(const.pp_pad) if have_pg else None
    dq = jnp.zeros_like(q)

    if nl > 1:
        # advection_pv (/root/reference/msqg/qg.h:287-393); the stochastic
        # variant (/root/reference/msqg/qg_stochastic.h:17-111) drops the
        # self-advection in the top layer, drops J(po,po2) from the cascade,
        # and adds linear damping -q/tr_stoch. Every J(., pp) term is pruned
        # statically when pp == 0 (no PG coupling inputs).
        if cfg.energy_conserv:
            # ENERGY_CONSERV split (/root/reference/msqg/qg.h:310-340): the
            # self-advection carries the FULL PV — J(po, qot) with qot = q —
            # so J(po, po2) drops out of the stretching cascade (it is
            # already inside J(psi, Gamma(psi))); the discretely
            # energy-conserving form of the same equations. q takes psi's
            # ghost law (qol is created with bc_type 0 / periodic,
            # msqg/qg.h:850).
            q_g = ghost_fn(q, _bc_psi(cfg))
            self_jac = mj(psi_g, q_g, d)
        else:
            self_jac = mj(psi_g, zeta_g, d)
        if cfg.stochastic:
            self_jac = self_jac.at[0].set(0.0)
        dq = dq + self_jac + beta_effect_g(psi_g, cfg.beta, d)
        if have_pg:
            dq = dq + mj(pp, zeta_g, d)
        # interface stretch-Jacobians jd/ju cascade
        J = None
        if have_pg:
            J = mj(pp[:-1], psi_g[1:], d) + mj(psi_g[:-1], pp[1:], d)
        if not cfg.stochastic and not cfg.energy_conserv:
            Jself = mj(psi_g[:-1], psi_g[1:], d)
            J = Jself if J is None else J + Jself
        if J is not None:
            idh0 = jnp.asarray(const.idh0, q.dtype).reshape(nl, 1, 1)
            idh1 = jnp.asarray(const.idh1, q.dtype).reshape(nl, 1, 1)
            dq = dq.at[:-1].add(const.strl * J * idh1[:-1])
            dq = dq.at[1:].add(-const.strl * J * idh0[1:])
        if cfg.flsrv == 1 and const.zetap_pad is not None:
            dq = dq + mj(psi_g, from_padded_fn(const.zetap_pad), d)
        if cfg.stochastic:
            dq = dq - q * cfg.itr_stoch
    # nl == 1: advection contributes nothing (msqg/qg.h:376-379)

    # dissipation (dissip, /root/reference/msqg/qg.h:406-422); the harmonic
    # iRe terms and the biharmonic iRe4 terms are skipped statically when
    # their (static) coefficients are zero
    tmp = None
    if cfg.iRe != 0.0:
        if cfg.nl > 1:
            dq = dq + cfg.iRe * stretch(zeta, const.strl, const.idh0,
                                        const.idh1)
        tmp = laplacian_g(zeta_g, d)
        dq = dq + cfg.iRe * tmp
    if cfg.iRe4 != 0.0:
        if tmp is None:
            tmp = laplacian_g(zeta_g, d)
        tmp_g = ghost_deriv_fn(tmp, zeta_g)
        bih = laplacian_g(tmp_g, d)
        if cfg.nl > 1:
            bih = bih + stretch(tmp, const.strl, const.idh0, const.idh1)
        dq = dq + cfg.iRe4 * bih

    # Ekman friction (/root/reference/msqg/qg.h:428-440)
    dh = cfg.dh
    if cfg.Eks != 0.0:
        dq = dq.at[0].add(-cfg.Eks / (cfg.Rom * 2 * dh[0]) * zeta[0])
    if cfg.Ekb != 0.0:
        dq = dq.at[nl - 1].add(
            -cfg.Ekb / (cfg.Rom * 2 * dh[nl - 1]) * zeta[nl - 1])

    # surface wind forcing (/root/reference/msqg/qg.h:446-459)
    dq = dq.at[0].add(-const.wind)

    # 3-D forcing (/root/reference/msqg/qg.h:465-474)
    if const.qforc is not None:
        dq = dq + const.qforc

    # bottom topography (/root/reference/msqg/qg.h:480-488)
    if const.topo_pad is not None:
        dq = dq.at[nl - 1].add(
            mj(psi_g[nl - 1], from_padded_fn(const.topo_pad), d)
            / (const.Ro * dh[nl - 1]))

    # passive tracers (ptr_rhs, /root/reference/msqg/qg.h:573-588)
    dtr = None
    if tracers is not None:
        bc_tr = BC.PERIODIC if cfg.sbc == -1 else BC.NEUMANN
        tr_g = ghost_fn(tracers, bc_tr)
        iPe = jnp.asarray(cfg.iPe[:cfg.nptr], q.dtype).reshape(1, -1, 1, 1)
        ir = jnp.asarray(cfg.ptr_ir[:cfg.nptr], q.dtype).reshape(1, -1, 1, 1)
        psi_gb = psi_g[:, None]
        dtr = mj(psi_gb, tr_g, d) + iPe * laplacian_g(tr_g, d)
        if const.ptr_relax is not None:
            dtr = dtr + ir * (const.ptr_relax - tracers)
        else:
            dtr = dtr + ir * (-tracers)
    return dq, dtr


def cfl_dtmax(cfg: QGConfig, const: QGConstants, psi_g: Ghosted, dtmax0,
              prev, *, reduce_fn=None, from_padded_fn=None):
    """CFL controller chain: timestep() called per layer for psi then pp, all
    sharing the `previous` smoothing state (advection_pv,
    /root/reference/msqg/qg.h:383-391; Basilisk timestep.h semantics, cf.
    adjust_dt /root/reference/qg-node/qg.h:258-284)."""
    d = cfg.delta
    dtm = dtmax0
    dtype = psi_g.a.dtype
    big = jnp.asarray(jnp.finfo(dtype).max / 4, dtype)
    # All layers' face-speed maxima come out of ONE fused pass over the
    # (nl, N, N) array (the per-layer Python loop used to launch 4x the
    # kernels and re-read psi per layer: 1.5 ms -> ~0.4 ms at 2048^2x4);
    # only the scalar smoothing recurrence below is inherently sequential.
    # pp == 0 iterations are exact no-ops (umax = 0 -> dt_cfl = big -> dtm
    # unchanged, and the smoothing branch dtm > prev is false since prev was
    # just set to dtm), so they are skipped when pp is pruned.
    if from_padded_fn is None:
        from_padded_fn = ghosted_from_padded
    umax_psi = max_face_speed_layers(psi_g, d)           # (nl,)
    umax_pp = None if const.pp_pad is None else \
        max_face_speed_layers(from_padded_fn(const.pp_pad), d)
    return cfl_from_umax(cfg, umax_psi, umax_pp, dtmax0, prev,
                         reduce_fn=reduce_fn)


def cfl_from_umax(cfg: QGConfig, umax_psi, umax_pp, dtmax0, prev, *,
                  reduce_fn=None):
    """The scalar tail of the CFL chain, given the (nl,) per-layer face-speed
    maxima (from max_face_speed_layers or the fused Pallas RHS kernel)."""
    d = cfg.delta
    dtm = dtmax0
    dtype = umax_psi.dtype
    big = jnp.asarray(jnp.finfo(dtype).max / 4, dtype)
    if reduce_fn is not None:
        umax_psi = reduce_fn(umax_psi)   # global max across the device mesh
        if umax_pp is not None:
            umax_pp = reduce_fn(umax_pp)
    for l in range(cfg.nl):
        umaxes = (umax_psi[l],) if umax_pp is None \
            else (umax_psi[l], umax_pp[l])
        for umax in umaxes:
            dt_cfl = jnp.where(umax > 0, cfg.CFL * d / umax, big)
            dtm = jnp.minimum(dtm, dt_cfl)
            dtm = jnp.where(dtm > prev, (prev + 0.1 * dtm) / 1.1, dtm)
            prev = dtm
    return dtm, prev


def time_filter(q, q_mean, dt, tau_f: float = 20.0):
    """Exponential running mean of the PV (time_filter,
    /root/reference/msqg/qg.h:491-507; tau_f = 20 hard-coded there; the
    subtraction line is commented out in the reference, so this only
    maintains the mean): q_mean <- (1 - dt/tau_f)*q_mean + (dt/tau_f)*q."""
    alpha = dt / tau_f
    return (1.0 - alpha) * q_mean + alpha * q


def dtnext(t, tnext, dt):
    """Basilisk event scheduling: shrink dt so an integer number of steps
    lands exactly on the next event time (events.h dtnext, TEPS=1e-9)."""
    dd = tnext - t
    n = jnp.floor(dd / dt)
    dt1 = dd / jnp.maximum(n, 1)
    dt1 = jnp.where(dt1 > dt * (1.0 + 1e-9), dd / (n + 1), dt1)
    return jnp.where(n == 0, dd, jnp.minimum(dt, dt1))


def kinetic_energy(cfg: QGConfig, psi: jnp.ndarray) -> jnp.ndarray:
    """Surface-layer KE as logged every step: ke = -sum 0.5*psi*lap(psi)*Delta^2
    (/root/reference/msqg/qg.c:101-109)."""
    p0 = psi[0]
    lap = laplacian_g(ghosted(p0, _bc_psi(cfg)), cfg.delta)
    return -jnp.sum(0.5 * p0 * lap) * cfg.delta ** 2


def update(cfg: QGConfig, const: QGConstants, q, psi_guess, tracers, prev,
           dtmax0):
    """One RHS evaluation: PV inversion + tendencies + CFL (update_qg)."""
    from msom_tpu.models import pallas_rhs
    from msom_tpu.solvers import pallas_mg as _pk
    psi, st = invert_q(cfg, const, psi_guess, q)
    kd = const.rhsk
    if (pallas_rhs.applicable(cfg, const) and _pk.enabled(psi.dtype)
            and (tracers is None or kd.Ttr > 0)):
        # the fused kernel also produces the psi CFL face maxima; the pp
        # part of the chain is precomputed at build time (pp is constant)
        need_q = cfg.stochastic or cfg.energy_conserv
        dq, umax = pallas_rhs.rhs_fused(cfg, const, psi,
                                        q if need_q else None)
        dtr = None
        if tracers is not None:
            dtr = pallas_rhs.tracer_fused(cfg, const, psi, tracers)
        dtm, prev = cfl_from_umax(cfg, umax, kd.umax_pp, dtmax0, prev)
    else:
        psi_g = ghosted(psi, _bc_psi(cfg))
        zeta = laplacian_g(psi_g, cfg.delta)
        zeta_g = _ghost_deriv(cfg, zeta, psi_g)
        dq, dtr = rhs(cfg, const, q, psi, psi_g, zeta, zeta_g, tracers)
        dtm, prev = cfl_dtmax(cfg, const, psi_g, dtmax0, prev)
    return dq, dtr, psi, prev, dtm, st


def make_step(cfg: QGConfig):
    """Build the jittable step function.

    step(state, const, tnext) -> (state, StepDiag) implements one Basilisk
    predictor-corrector step (predictor-corrector.h semantics, SURVEY.md
    §3.1): dt from the CFL-limited first update + dtnext event clamping, a
    half-step Euler predictor, a corrector RHS at the midpoint, and the full
    step. The stochastic variant adds the Euler-Maruyama kick in both
    advances with shared noise (/root/reference/msqg/qg_stochastic.h:128-149).
    """
    DT = cfg.dt_clamped()

    def step(state: QGState, const: QGConstants, tnext):
        noise = None
        key = state.key
        if cfg.stochastic:
            key, sub = jax.random.split(key)
            sigma = const.s_stoch if const.s_stoch is not None else 1.0
            noise = cfg.amp_stoch * sigma * jax.random.normal(
                sub, state.q.shape, state.q.dtype)

        q0 = state.q
        tr0 = state.tracers
        have_tr = tr0 is not None

        # predictor (half step) and corrector (full step), inlined: wrapping
        # the two substeps in a lax.scan costs ~20 ms/step at 2048^2 on TPU
        # (carry materialization defeats buffer aliasing); inlining trades
        # compile size for that.
        def substep(q_eval, tr_eval, psi, prev, dt, is_first):
            dq, dtr, psi, prev, dtm, st = update(
                cfg, const, q_eval, psi, tr_eval, prev, DT)
            if is_first:
                dt = dtnext(state.t, tnext, dtm)
            frac = 0.5 if is_first else 1.0
            q_eval = q0 + dq * (frac * dt)
            if cfg.stochastic:
                # predictor: sqrt(dt/2)/sqrt(2) = sqrt(dt)/2; corrector:
                # sqrt(dt) (qg_stochastic.h:128-149, shared noise)
                q_eval = q_eval + noise * jnp.sqrt(dt) * frac
            if have_tr:
                tr_eval = tr0 + dtr * (frac * dt)
            return q_eval, tr_eval, psi, prev, dt, st

        zero = jnp.zeros((), q0.dtype)
        # mg warm-start: extrapolate the previous two steps' psi as the
        # first inversion's initial guess (the reference's in-place solve
        # gets the same benefit implicitly, msqg/qg.h:113-163)
        guess0 = state.psi
        if state.psi_old is not None:
            guess0 = 2.0 * state.psi - state.psi_old
        q1, tr1, psi1, prev, dt, st1 = substep(
            q0, tr0, guess0, state.dt_prev, zero, True)
        q_new, tr_new, psi2, prev, dt, st2 = substep(
            q1, tr1, psi1, prev, dt, False)

        new = QGState(q=q_new, psi=psi2, t=state.t + dt, dt_prev=prev,
                      i=state.i + 1, key=key, tracers=tr_new,
                      qof=state.qof, nbar=state.nbar,
                      psi_old=None if state.psi_old is None else state.psi)
        diag = StepDiag(dt=dt, ke=kinetic_energy(cfg, psi2),
                        mg_iters=st1.iters, mg_res=st1.resa)
        return new, diag

    return step
