"""mspg tests: circulation BC, barotropic solve, conservation properties of
the advection/diffusion operators, convective adjustment, and a spin-up run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msom_tpu.models import mspg
from msom_tpu.params import PGConfig, load_pg_config
from msom_tpu.ops import tridiag

RNG = np.random.default_rng(5)


def pg_cfg(**kw):
    base = dict(N=32, nl=8, ys=0.3, r=0.02, tau_s=3e-2, tau0=0.12, kv=1e-4,
                kh=1e-4, omega=0.2, DT=1e-2, CFL=0.4, tend=0.1, dtout=1.0,
                dtype="float64")
    base.update(kw)
    return PGConfig(**base)


def test_load_reference_deck():
    cfg = load_pg_config("/root/reference/mspg/params.in", dtype="float64")
    assert cfg.N == 64 and cfg.nl == 30
    assert cfg.ys == 0.3 and cfg.r == 0.02 and cfg.omega == 0.2
    # kd/a/nu are ignored exactly as the reference parser ignores them
    assert cfg.kv == 0.0 and cfg.nu == 3e-4


def test_circ_bc_solves_perimeter_system():
    """The ghost ring must satisfy the discrete relation: for each boundary
    cell, sol = (psi_ghost + psi_in)/2 and the tridiagonal row
    -y/(4r)*sol_prev + sol - y/(4r)*(-1)*sol_next... i.e. A sol = rhs."""
    N, r, ys, L0 = 16, 0.05, 0.3, 1.0
    psi = jnp.asarray(RNG.standard_normal((N, N)))
    P = np.asarray(mspg.circ_bc_pad(psi, r, ys, L0))
    delta = L0 / N
    yc = ys + (np.arange(N) + 0.5) * delta
    # reconstruct sol from ghosts: sol = (ghost + interior)/2 along the path
    sol = np.concatenate([
        (P[0, 1:-1] + np.asarray(psi)[0, :]) / 2,
        (P[1:-1, -1] + np.asarray(psi)[:, -1]) / 2,
        ((P[-1, 1:-1] + np.asarray(psi)[-1, :]) / 2)[::-1],
        ((P[1:-1, 0] + np.asarray(psi)[:, 0]) / 2)[::-1]])
    ypath = np.concatenate([np.full(N, yc[0]), yc, np.full(N, yc[-1]),
                            yc[::-1]])
    rhs = np.concatenate([np.asarray(psi)[0, :], np.asarray(psi)[:, -1],
                          np.asarray(psi)[-1, ::-1], np.asarray(psi)[::-1, 0]])
    ad = -ypath / (4 * r)
    lhs = sol.copy()
    lhs[1:] += ad[1:] * sol[:-1]
    lhs[:-1] += -ad[:-1] * sol[1:]
    np.testing.assert_allclose(lhs, rhs, rtol=1e-9, atol=1e-10)
    # corners: ghost_x + ghost_y - cell
    assert np.isclose(P[0, 0], P[1, 0] + P[0, 1] - np.asarray(psi)[0, 0])


def test_thomas_scan_matches_unrolled():
    n = 40
    t0 = RNG.standard_normal(n) * 0.2
    t2 = RNG.standard_normal(n) * 0.2
    t1 = 2 + np.abs(RNG.standard_normal(n))
    t0[0] = t2[-1] = 0
    rhs = RNG.standard_normal(n)
    got = np.asarray(tridiag.thomas_scan(*map(jnp.asarray, (t0, t1, t2, rhs))))
    want = np.asarray(tridiag.thomas(
        *[jnp.asarray(v).reshape(n, 1) for v in (t0, t1, t2, rhs)]))[:, 0]
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_bt_solve_and_velocity():
    cfg = pg_cfg()
    const = mspg.build_constants(cfg)
    psibt = np.asarray(const.psibt)
    assert np.isfinite(psibt).all()
    assert np.abs(psibt).max() > 0  # wind drives a gyre
    # no normal flow through walls
    assert np.all(np.asarray(const.ubtx)[:, 0] == 0)
    assert np.all(np.asarray(const.ubty)[-1, :] == 0)


def test_advection_conserves_buoyancy():
    """Flux-form advection with no-normal-flow walls conserves sum(b)."""
    cfg = pg_cfg()
    const = mspg.build_constants(cfg)
    b = jnp.asarray(RNG.standard_normal((cfg.nl, cfg.N, cfg.N)))
    ux = jnp.asarray(RNG.standard_normal((cfg.nl, cfg.N, cfg.N + 1)))
    uy = jnp.asarray(RNG.standard_normal((cfg.nl, cfg.N + 1, cfg.N)))
    # conservation requires w=0 at the rigid lid, i.e. zero column-integrated
    # divergence: remove the vertical mean (what adjust_bt_velocity enforces
    # up to the quasi-nondivergent ubt)
    ux = ux - jnp.mean(ux, axis=0, keepdims=True)
    uy = uy - jnp.mean(uy, axis=0, keepdims=True)
    ux, uy = mspg._zero_walls(ux, uy)
    db, w = mspg.advection(cfg, const, b, ux, uy)
    # surface w vanishes
    np.testing.assert_allclose(np.asarray(w)[0], 0.0, atol=1e-12)
    # integral of the 3-D flux divergence over the closed domain vanishes
    assert abs(float(jnp.sum(db))) < 1e-10 * float(jnp.sum(jnp.abs(db)))


def test_hdiffusion_conserves_and_smooths():
    cfg = pg_cfg()
    const = mspg.build_constants(cfg)
    b = jnp.asarray(RNG.standard_normal((cfg.nl, cfg.N, cfg.N)))
    db = mspg.hdiffusion(cfg, const, b)
    assert abs(float(jnp.sum(db))) < 1e-10 * float(jnp.sum(jnp.abs(db)) + 1)
    # diffusion decreases variance: sum(b * db) < 0
    assert float(jnp.sum(b * db)) < 0


def test_vdiff_implicit_relaxes_to_uniform():
    cfg = pg_cfg(kv=1.0, tau_s=1e9)
    const = mspg.build_constants(cfg)
    b = jnp.asarray(RNG.standard_normal((cfg.nl, cfg.N, cfg.N)))
    const = mspg.PGConstants(**{**dataclasses_asdict_shallow(const),
                                "b_surf": jnp.zeros_like(const.b_surf)})
    out = mspg.vdiff_implicit(cfg, const, b, dt=100.0)
    # strong implicit diffusion with zero surface flux homogenizes columns
    col_std = np.asarray(out).std(axis=0)
    assert col_std.max() < 0.05 * np.asarray(b).std(axis=0).max()


def dataclasses_asdict_shallow(dc):
    import dataclasses as d
    return {f.name: getattr(dc, f.name) for f in d.fields(dc)}


def test_convection_removes_instability():
    b = jnp.asarray(RNG.standard_normal((6, 4, 4)))
    out = np.asarray(mspg.convection(b))
    # single downward sweep: at minimum, mean is conserved
    np.testing.assert_allclose(out.sum(axis=0), np.asarray(b).sum(axis=0),
                               rtol=1e-12)
    # a two-layer unstable column is exactly averaged
    b2 = jnp.asarray(np.array([[[0.0]], [[1.0]]]))
    out2 = np.asarray(mspg.convection(b2))
    np.testing.assert_allclose(out2, 0.5)


def test_bt_adjustment_zero_mean():
    cfg = pg_cfg()
    const = mspg.build_constants(cfg)
    ux = jnp.asarray(RNG.standard_normal((cfg.nl, cfg.N, cfg.N + 1)))
    uy = jnp.asarray(RNG.standard_normal((cfg.nl, cfg.N + 1, cfg.N)))
    ax, ay = mspg.adjust_bt_velocity(cfg, const, ux, uy, 1.0)
    ds = 1.0 / cfg.nl
    np.testing.assert_allclose(np.asarray(jnp.sum(ax * ds, axis=0)),
                               np.asarray(const.ubtx), rtol=1e-9, atol=1e-10)


def test_pg_spinup_runs():
    cfg = pg_cfg(tend=0.05, DT=1e-2)
    const = mspg.build_constants(cfg)
    state = mspg.init_state(cfg, const)
    step = jax.jit(mspg.make_step(cfg))
    for _ in range(5):
        state, diag = step(state, const, jnp.asarray(1e9))
    b = np.asarray(state.b)
    assert np.isfinite(b).all()
    # surface relaxation pulls b[0] toward b_surf pattern
    corr = np.corrcoef(b[0].ravel(), np.asarray(const.b_surf).ravel())[0, 1]
    assert corr > 0.5
    assert float(state.t) > 0


def test_gm_velocities():
    cfg = pg_cfg(k_gm=0.1)
    const = mspg.build_constants(cfg)
    # stable stratification with a horizontal gradient
    y = np.linspace(0, 1, cfg.N)
    b = np.zeros((cfg.nl, cfg.N, cfg.N))
    for l in range(cfg.nl):
        b[l] = (cfg.nl - l) * 1.0 + y[:, None] * 0.5
    gx, gy = mspg.comp_gm(cfg, const, jnp.asarray(b))
    assert np.isfinite(np.asarray(gx)).all()
    # eddy-induced flow integrates to zero over the column (bolus transport)
    ds = 1.0 / cfg.nl
    colsum = np.asarray(jnp.sum(gy * ds, axis=0))
    np.testing.assert_allclose(colsum, 0.0, atol=1e-10)


def test_mspg_step_sharded_matches_single():
    """GSPMD shard-vs-single equality for the PG step on the 8-device CPU
    mesh (the reference runs mspg under the same MPI decomposition as the
    QG families, /root/reference/mspg/pg.c:115-118): the circ_bc perimeter
    concatenations, face-staggered fields (N+1 axes stay unsharded), the
    batched vertical Thomas solves and the convection scan must all
    survive XLA auto-partitioning."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg = pg_cfg(N=32, nl=4)
    const = mspg.build_constants(cfg)
    state0 = mspg.init_state(cfg, const)
    step = jax.jit(mspg.make_step(cfg))
    tnext = jnp.asarray(1e9)

    s1 = state0
    for _ in range(5):
        s1, d1 = step(s1, const, tnext)

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("y", "x"))

    def place(x):
        if not hasattr(x, "ndim") or x.ndim < 2:
            return x
        spec = [None] * x.ndim
        if x.shape[-2] % 2 == 0:
            spec[-2] = "y"
        if x.shape[-1] % 4 == 0:
            spec[-1] = "x"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    s8 = jax.tree.map(place, state0)
    c8 = jax.tree.map(place, const)
    with mesh:
        for _ in range(5):
            s8, d8 = step(s8, c8, tnext)

    scale = np.abs(np.asarray(s1.b)).max()
    assert np.abs(np.asarray(s8.b) - np.asarray(s1.b)).max() < 1e-13 * scale
    uscale = max(np.abs(np.asarray(s1.ux)).max(), 1e-30)
    assert np.abs(np.asarray(s8.ux) - np.asarray(s1.ux)).max() < 1e-12 * uscale
    assert np.abs(np.asarray(s8.uy) - np.asarray(s1.uy)).max() < 1e-12 * uscale
    np.testing.assert_allclose(float(d8.dt), float(d1.dt), rtol=1e-13)


def test_mspg_btsolver_sharded_matches_single():
    """The init-time barotropic solve (mg.solve_bt with the circ_bc
    post-cycle hook) under GSPMD sharding reproduces the single-device
    psibt: the pseudo-SOR relaxation, perimeter Thomas solve and the
    restriction pyramid are decomposition-safe."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from msom_tpu.solvers import mg

    cfg = pg_cfg(N=32, nl=4)
    N = cfg.N
    delta = cfg.L0 / N
    y = cfg.ys + (np.arange(N) + 0.5) * delta
    yf = cfg.ys + np.arange(N + 1) * delta
    X, Y = np.meshgrid((np.arange(N) + 0.5) * delta, y, indexing="xy")
    wind = cfg.tau0 * (2 * np.pi * Y * np.cos(2 * (Y - cfg.ys) * np.pi))
    r = cfg.r
    ax = np.broadcast_to((r / (r**2 + Y[:, 0]**2))[:, None], (N, N + 1))
    ay = r / (r**2 + yf[:, None]**2) * np.ones((N + 1, N))
    by = -(r**2 - Y**2) / (r**2 + Y**2)**2
    bx = np.zeros((N, N))
    pad_fn = lambda a: mspg.circ_bc_pad(a, cfg.r, cfg.ys, cfg.L0)

    def solve(device_put_fn):
        args = dict(
            L0=cfg.L0, alpha_x=device_put_fn(jnp.asarray(ax)),
            alpha_y=device_put_fn(jnp.asarray(ay)),
            beta_x=device_put_fn(jnp.asarray(bx)),
            beta_y=device_put_fn(jnp.asarray(by)),
            omega=cfg.omega, tolerance=cfg.tol, pad_fn=pad_fn)
        f = jax.jit(lambda a0, b: mg.solve_bt(a0, b, **args))
        psibt, st = f(device_put_fn(jnp.zeros((N, N))),
                      device_put_fn(jnp.asarray(wind)))
        return np.asarray(psibt), int(st.iters)

    p1, it1 = solve(lambda x: x)

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("y", "x"))
    sh = NamedSharding(mesh, P("y", "x"))

    def put(x):
        if x.ndim == 2 and x.shape[0] % 2 == 0 and x.shape[1] % 4 == 0:
            return jax.device_put(x, sh)
        return x

    with mesh:
        p8, it8 = solve(put)
    scale = np.abs(p1).max()
    assert np.abs(p8 - p1).max() < 1e-12 * scale
    assert it8 == it1
