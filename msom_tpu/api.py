"""Public pure-tendency API — the reference's SWIG embedding layer (L5).

The reference exposes its steppers to Python for data assimilation
(back-and-forth nudging, /root/reference/msqg/qg_bfn.h), offline energy
budgets (qg_energy.h pystep_de) and bifurcation continuation around a flat
state vector (/root/reference/mspg/pg.h:1058-1153, driven by
pg_trilinos.py's matrix-free NOX/LOCA). In JAX the jitted tendency function
IS the API — every function here is pure, jittable and differentiable.

Also provides the steady-state Newton-Krylov solver that replaces the
PyTrilinos continuation driver (scipy.optimize.newton_krylov over the pure
tendency, with the continuation parameter exposed the same way).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from msom_tpu.ops.bc import pad
from msom_tpu.ops.ghost import ghosted, laplacian_g
from msom_tpu.ops.stencil import laplacian
from msom_tpu.models import qg as _qg


# ---------------------------------------------------------------------------
# msqg: q <-> psi conversions and the BFN tendency
# ---------------------------------------------------------------------------

def q_to_psi(cfg, const, q, psi_guess=None):
    """pyq2p (/root/reference/msqg/qg_bfn.h:85-93)."""
    if psi_guess is None:
        psi_guess = jnp.zeros_like(q)
    psi, _ = _qg.invert_q(cfg, const, psi_guess, q)
    return psi


def psi_to_q(cfg, const, psi):
    """pyp2q (/root/reference/msqg/qg_bfn.h:95-103)."""
    return _qg.comp_q(cfg, const, psi)


def qg_tendency(cfg, const, q, direction: float = 1.0, tracers=None):
    """Pure PV tendency f(q) -> dq/dt, the BFN hook
    (pystep_bfn vartype=1, /root/reference/msqg/qg_bfn.h:65-79).

    direction = -1 flips the sign of the irreversible terms (dissipation and
    Ekman friction, :34-44) for backward integration; advection, beta and
    forcing keep their signs. Time stepping lives with the caller (the
    reference drives this with an AB3 loop in NumPy, msqg/scripts/qg_bfn.py).
    """
    import dataclasses

    if direction > 0:
        c = cfg
    else:
        # sign-flipped dissipation: iRe -> -iRe, iRe4 -> -iRe4, Ek -> -Ek.
        # iRe/iRe4 derive from Re/Re4, so flip via negative Re/Re4 and Ek.
        c = dataclasses.replace(cfg, Re=-cfg.Re, Re4=-cfg.Re4,
                                Eks=-abs(cfg.Eks), Ekb=-abs(cfg.Ekb))
    psi, _ = _qg.invert_q(c, const, jnp.zeros_like(q), q)
    psi_g = ghosted(psi, _qg._bc_psi(c))
    zeta = laplacian_g(psi_g, c.delta)
    zeta_g = _qg._ghost_deriv(c, zeta, psi_g)
    dq, dtr = _qg.rhs(c, const, q, psi, psi_g, zeta, zeta_g, tracers)
    return (dq, dtr) if tracers is not None else dq


def qg_energy_tendencies(cfg, const, psi):
    """pystep_de equivalent (/root/reference/msqg/qg_energy.h:294-340):
    per-term tendency fields with ediag = 1, dt = 1."""
    import dataclasses
    from msom_tpu.models import qg_energy as en

    c = dataclasses.replace(cfg, ediag=1)
    acc = en.energy_tend(c, const, en.init_energy(c), psi, dt=1.0)
    return dict(de_j1=acc.de_j1, de_j2=acc.de_j2, de_j3=acc.de_j3,
                de_vd=acc.de_vd, de_bf=acc.de_bf)


def bfn_integrate(cfg, const, var0, nsteps: int, *, direction: float = 1.0,
                  flag_q: bool = True, nudge_fn=None, dt: float | None = None):
    """AB3 Back-and-Forth-Nudging integration loop — the capability of the
    reference's NumPy driver (/root/reference/msqg/qg_bfn.py:62-73), fused
    into one jitted lax.scan instead of a Python loop over a SWIG call.

    var0 is q when flag_q (integration in PV) else psi; nudge_fn(var, i) is
    added to the instantaneous tendency F1 (the "BFN nudging goes here" hook,
    qg_bfn.py:66-67). direction=-1 runs the dissipation-flipped backward
    model. Returns the integrated var after nsteps third-order
    Adams-Bashforth steps var += dt/12 (23 F1 - 16 F2 + 5 F3)."""
    if dt is None:
        dt = cfg.DT
    q0 = var0 if flag_q else psi_to_q(cfg, const, var0)

    def tend(q, i):
        F1 = qg_tendency(cfg, const, q, direction)
        if nudge_fn is not None:
            F1 = F1 + nudge_fn(q, i)
        return F1

    def body(carry, i):
        q, F2, F3 = carry
        F1 = tend(q, i)
        q = q + dt / 12.0 * (23.0 * F1 - 16.0 * F2 + 5.0 * F3)
        return (q, F1, F2), None

    z = jnp.zeros_like(q0)
    (q, _, _), _ = jax.lax.scan(body, (q0, z, z), jnp.arange(nsteps))
    return q if flag_q else q_to_psi(cfg, const, q)


# ---------------------------------------------------------------------------
# mspg: flat-vector tendency + steady-state / continuation solver
# ---------------------------------------------------------------------------

def pg_pack(state):
    """Flat state vector [b, ux, uy] (layout of pyget_field,
    /root/reference/mspg/pg.h:1094-1120 modulo ordering inside blocks)."""
    return np.concatenate([np.asarray(state.b).ravel(),
                           np.asarray(state.ux).ravel(),
                           np.asarray(state.uy).ravel()])


def pg_unpack(cfg, vec):
    nl, N = cfg.nl, cfg.N
    nb = nl * N * N
    nx = nl * N * (N + 1)
    b = vec[:nb].reshape(nl, N, N)
    ux = vec[nb:nb + nx].reshape(nl, N, N + 1)
    uy = vec[nb + nx:].reshape(nl, N + 1, N)
    return b, ux, uy


def pg_tendency(cfg, const, vec, dtconv: float = 1e-1):
    """pystep (/root/reference/mspg/pg.h:1123-1153): the all-explicit PG
    tendency for the bifurcation solver — advection + horizontal diffusion +
    explicit surface forcing + explicit vertical diffusion + convection
    tendency (finite-difference over dtconv) + momentum, with the barotropic
    adjustment applied to u on entry (btfac=1) and to du with btfac=0."""
    from msom_tpu.models import mspg

    b, ux, uy = pg_unpack(cfg, np.asarray(vec))
    dt = jnp.dtype(cfg.dtype)
    b = jnp.asarray(b, dt)
    ux = jnp.asarray(ux, dt)
    uy = jnp.asarray(uy, dt)

    ux, uy = mspg.adjust_bt_velocity(cfg, const, ux, uy, 1.0)
    ux, uy = mspg._zero_walls(ux, uy)

    db, _ = mspg.advection(cfg, const, b, ux, uy)
    db = db + mspg.hdiffusion(cfg, const, b)
    # explicit surface relaxation (forcing_explicit, pg.h:1002-1009)
    db = db.at[0].add((const.b_surf - b[0]) / cfg.tau_s)
    # explicit vertical diffusion (vdiff_explicit, pg.h:964-977): mirror
    # vertical ghosts (vertbc) make the surface/bottom fluxes vanish — the
    # surface input enters through forcing_explicit only
    ds = 1.0 / cfg.nl
    K = const.kv_prof
    dif = K[1:cfg.nl] * (b[:-1] - b[1:])       # interface fluxes
    flux_up = jnp.concatenate([jnp.zeros_like(b[:1]), dif], axis=0)
    flux_dn = jnp.concatenate([dif, jnp.zeros_like(b[:1])], axis=0)
    db = db + (flux_up - flux_dn) / (ds * ds)
    # convection tendency (convection_tend, pg.h:979-1000)
    b_conv = mspg.convection(b)
    db = db + (b_conv - b) / dtconv
    dux, duy = mspg.momentum(cfg, const, b, ux, uy)
    dux, duy = mspg.adjust_bt_velocity(cfg, const, dux, duy, 0.0)
    return np.concatenate([np.asarray(db).ravel(), np.asarray(dux).ravel(),
                           np.asarray(duy).ravel()])


def pg_steady_state(cfg, const, vec0=None, *, f_tol=1e-8, maxiter=50,
                    forcing_mag: float = 1.0, verbose=False, strict=False):
    """Steady state F(x) = 0 by matrix-free Newton-Krylov — the capability
    of pg_trilinos.py's NOX driver. `forcing_mag` is the continuation
    parameter (pyadjust_contpar, /root/reference/mspg/pg.h:1022-1028):
    it scales b_surf.

    If NK stalls before f_tol (a damped step hitting maxiter), the best
    iterate found is returned (it still has a much-reduced residual —
    LOCA's behavior on a hard solve); pass strict=True to raise instead."""
    import dataclasses as dc
    import warnings

    import scipy.optimize

    const2 = const
    if forcing_mag != 1.0:
        const2 = dc.replace(const, b_surf=const.b_surf * forcing_mag)
    if vec0 is None:
        from msom_tpu.models import mspg
        vec0 = pg_pack(mspg.init_state(cfg, const2))

    def F(x):
        return pg_tendency(cfg, const2, x)

    try:
        sol = scipy.optimize.newton_krylov(F, vec0, f_tol=f_tol,
                                           maxiter=maxiter, verbose=verbose)
    except scipy.optimize.NoConvergence as e:
        if strict:
            raise
        sol = np.asarray(e.args[0])
        warnings.warn("pg_steady_state: NK did not reach f_tol; returning "
                      "the best iterate", RuntimeWarning)
    return sol


def pg_continuation(cfg, const, mags, vec0=None, **kw):
    """Natural-parameter continuation: chain steady states over a list of
    forcing magnitudes, warm-starting each from the previous branch point
    (the simple-continuation mode of pg_trilinos.py)."""
    branch = []
    x = vec0
    for mag in mags:
        x = pg_steady_state(cfg, const, x, forcing_mag=mag, **kw)
        branch.append((mag, x.copy()))
    return branch


def arclength_continuation(F, x0, lam0, ds, nsteps, *, f_tol=1e-8,
                           maxiter=60):
    """Keller pseudo-arclength continuation of F(x, lam) = 0 — the
    LOCA capability of /root/reference/mspg/scripts/pg_trilinos.py:1-401
    (NOX/LOCA arclength stepper), matrix-free.

    Solves the bordered system
        F(x, lam) = 0
        t_x . (x - x_c) + t_lam (lam - lam_c) - ds = 0
    with secant tangents (t_x, t_lam), so the branch is parameterized by
    arclength and continues THROUGH folds where natural continuation in lam
    fails (dF/dx singular). Returns [(lam, x), ...] of 2 + nsteps points
    (the two secant seed points, then nsteps arclength steps)."""
    import scipy.optimize

    x0 = np.asarray(x0, float)

    def solve_nat(lam, xg):
        return scipy.optimize.newton_krylov(lambda x: F(x, lam), xg,
                                            f_tol=f_tol, maxiter=maxiter)

    x0 = solve_nat(lam0, x0)
    branch = [(float(lam0), x0.copy())]
    lam1 = lam0 + ds
    x1 = solve_nat(lam1, x0)
    branch.append((float(lam1), x1.copy()))

    for _ in range(nsteps):
        (lamp, xp), (lamc, xc) = branch[-2], branch[-1]
        dx, dlam = xc - xp, lamc - lamp
        nrm = np.sqrt(dx @ dx + dlam * dlam)
        tx, tlam = dx / nrm, dlam / nrm

        # LOCA-style step-size control: halve ds until the bordered
        # Newton-Krylov solve converges (near a fold the predictor can
        # overshoot the turning point)
        ds_try, y = ds, None
        for _ in range(6):
            def G(y, tx=tx, tlam=tlam, xc=xc, lamc=lamc, ds_try=ds_try):
                x, lam = y[:-1], y[-1]
                arc = tx @ (x - xc) + tlam * (lam - lamc) - ds_try
                return np.concatenate([F(x, lam), [arc]])

            yg = np.concatenate([xc + ds_try * tx, [lamc + ds_try * tlam]])
            try:
                y = scipy.optimize.newton_krylov(G, yg, f_tol=f_tol,
                                                 maxiter=maxiter)
                break
            except (scipy.optimize.NoConvergence, ValueError):
                ds_try *= 0.5
        if y is None:
            raise RuntimeError(
                "arclength_continuation: bordered solve failed even at "
                f"ds = {ds_try * 2}")
        branch.append((float(y[-1]), y[:-1].copy()))
    return branch


def pg_arclength(cfg, const, lam0, ds, nsteps, vec0=None, **kw):
    """Pseudo-arclength continuation of the PG steady branch in the
    surface-forcing magnitude (the b_surf scale — pyadjust_contpar,
    /root/reference/mspg/pg.h:1022-1028)."""
    import dataclasses as dc

    if vec0 is None:
        from msom_tpu.models import mspg
        vec0 = pg_pack(mspg.init_state(cfg, const))

    def F(x, lam):
        c2 = dc.replace(const, b_surf=const.b_surf * lam)
        return pg_tendency(cfg, c2, x)

    return arclength_continuation(F, vec0, lam0, ds, nsteps, **kw)
