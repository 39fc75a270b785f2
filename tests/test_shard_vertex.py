"""Vertex-grid sharding (parallel/vshard.py) — the inner-vertex.h ownership
problem (VERDICT round-1 item 4), tested on the virtual 8-device CPU mesh.

Two-part contract:
  1. BITWISE decomposition invariance: the sharded step produces identical
     bits on a 1x1, 2x4 and 4x2 mesh — the ownership convention and halo
     exchange are exact, no shared vertex is double-counted.
  2. Model equivalence: the sharded step matches the single-device
     models.qg_node step to ~1 ulp/step (different data movement — roll
     -based ghosted views vs slice stencils — lets XLA fuse differently,
     so exact bit equality across the two CODE PATHS is not expected;
     the observed drift is <= 2 ulp/step in q)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from msom_tpu.models import qg_node as node
from msom_tpu.parallel import vshard


def make_mesh(shape):
    devs = np.array(jax.devices()[:shape[0] * shape[1]]).reshape(shape)
    return Mesh(devs, ("y", "x"))


def _cfg(nl, bc_fac, nu4=0.0, N=64):
    return node.NodeQGConfig(
        N=N, nl=nl, L0=100.0, f0=46.5, beta=0.5, hEkb=1e-3, tau0=1e-3,
        tau1=5e-4, tf1=2.0, tf2=3.0, dy_ws=0.3, nu=5.0, nu4=nu4,
        dh=tuple([1.0 / nl] * nl), N2=tuple([1.0] * max(nl - 1, 1)),
        noise_init=1e-3, bc_fac=bc_fac, DT=5e-2, tend=1.0, dtout=1.0,
        # solver="vmg": the sharded vertex step runs the multigrid, so the
        # unsharded reference must too (the default "auto" picks the exact
        # nodal spectral solve, which differs at the mg-tolerance level)
        CFL=0.2, TOLERANCE=1e-8, solver="vmg", dtype="float64")


def _run_sharded(cfg, const, state0, shape, steps):
    mesh = make_mesh(shape)
    own0 = vshard.owned_state(state0)
    step, place, csh = vshard.make_node_step_sharded(
        cfg, mesh, const, np.asarray(state0.q), own0)
    s = place(own0)
    tnext = jnp.asarray(1e18, state0.t.dtype)
    for _ in range(steps):
        s, d = step(s, csh, tnext)
    return s, d, csh


@pytest.mark.parametrize("nl,bc_fac,nu4", [
    (1, 0.0, 0.0),          # barotropic free slip
    (1, 1.0, 0.0),          # barotropic no slip (slip ring ghosts)
    (3, 0.0, 0.0),          # baroclinic free slip
    (3, 1.0, 1e-5),         # baroclinic no slip + biharmonic
])
def test_sharded_step_decomposition_invariant_and_matches_model(
        nl, bc_fac, nu4):
    cfg = _cfg(nl, bc_fac, nu4)
    const = node.build_constants(cfg)
    state0 = node.init_state(cfg, const, seed=3)
    steps = 5

    s11, d11, csh = _run_sharded(cfg, const, state0, (1, 1), steps)
    s24, d24, _ = _run_sharded(cfg, const, state0, (2, 4), steps)
    s42, d42, _ = _run_sharded(cfg, const, state0, (4, 2), steps)

    # 1. bitwise decomposition invariance
    for s_other, name in ((s24, "2x4"), (s42, "4x2")):
        np.testing.assert_array_equal(np.asarray(s_other.q),
                                      np.asarray(s11.q), err_msg=name)
        np.testing.assert_array_equal(np.asarray(s_other.psi),
                                      np.asarray(s11.psi), err_msg=name)
    assert float(d24.dt) == float(d11.dt) == float(d42.dt)
    # ke is a psum of per-tile partial sums: the reduction ORDER depends on
    # the decomposition, so the scalar may differ by an ulp (the state does
    # not — it never consumes a summed diagnostic)
    np.testing.assert_allclose(float(d24.ke), float(d11.ke), rtol=1e-14)

    # 2. equivalence with the single-device model (<= a few ulp over 5 steps)
    step1 = jax.jit(node.make_step(cfg))
    s1 = state0
    tnext = jnp.asarray(1e18, state0.t.dtype)
    for _ in range(steps):
        s1, d1 = step1(s1, const, tnext)
    q1 = np.asarray(s1.q)[..., :-1, :-1]
    scale = np.max(np.abs(q1))
    assert np.max(np.abs(np.asarray(s24.q) - q1)) < 1e-12 * scale
    np.testing.assert_allclose(float(d24.dt), float(d1.dt), rtol=1e-12)
    np.testing.assert_allclose(float(d24.ke), float(d1.ke), rtol=1e-10)
    np.testing.assert_allclose(float(d24.f_ke), float(d1.f_ke), rtol=1e-10)

    # 3. the dropped ring is reconstructible: psi ring zero, q ring frozen
    q_full = vshard.to_full(
        jnp.asarray(np.asarray(s24.q)),
        ring_row=jnp.asarray(np.asarray(csh.ring.q_top)),
        ring_col=jnp.asarray(np.asarray(csh.ring.q_right)))
    np.testing.assert_allclose(np.asarray(q_full)[..., :-1, :],
                               np.asarray(s1.q)[..., :-1, :],
                               atol=1e-12 * scale)


def test_vpoisson_sharded_matches_single_exactly():
    """The sharded vertex multigrid alone (identical inputs, one call) is
    exact vs solvers.vmg on the initial state, including iteration count."""
    cfg = _cfg(2, 0.0)
    const = node.build_constants(cfg)
    state = node.init_state(cfg, const, seed=7)
    psi1, st1 = node.invert_q(cfg, const, state.psi, state.q)

    mesh = make_mesh((2, 4))
    my, mx = 2, 4
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    csh = vshard.shard_const(cfg, const, np.asarray(state.q), my, mx)
    specs = vshard._specs_const(csh, my, mx)
    fld = P(None, "y", "x")

    def local(a0, b, c):
        a, st = vshard.vpoisson_sharded(
            a0, b, levels=c.vlevels, sharded_flags=c.sharded_flags,
            my=my, mx=mx, idh0=c.idh0, idh1=c.idh1,
            tolerance=cfg.TOLERANCE)
        return vshard.bc_psi_own(a), st.iters

    f = shard_map(local, mesh=mesh, in_specs=(fld, fld, specs),
                  out_specs=(fld, P()), check_vma=False)
    psi8, iters8 = f(vshard.to_owned(state.psi), vshard.to_owned(state.q),
                     csh)
    np.testing.assert_array_equal(np.asarray(psi8),
                                  np.asarray(psi1)[..., :-1, :-1])
    assert int(iters8) == int(st1.iters)


def test_rhs_and_cfl_sharded_exact():
    """rhs_pv_sharded / adjust_dt_sharded are bit-exact vs the unsharded
    model on identical inputs (both no-slip and free-slip ghosts)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    for nl, bc_fac in ((1, 0.0), (1, 1.0), (2, 1.0)):
        cfg = _cfg(nl, bc_fac)
        const = node.build_constants(cfg)
        state = node.init_state(cfg, const, seed=5)
        mesh = make_mesh((2, 4))
        csh = vshard.shard_const(cfg, const, np.asarray(state.q), 2, 4)
        specs = vshard._specs_const(csh, 2, 4)
        fld = P(None, "y", "x")

        def loc(q, psi, c):
            dq = vshard.rhs_pv_sharded(cfg, c, q, psi, jnp.asarray(0.25))
            dtm, _ = vshard.adjust_dt_sharded(cfg, psi, cfg.dt_clamped(),
                                              jnp.zeros(()))
            return dq, dtm

        f = shard_map(loc, mesh=mesh, in_specs=(fld, fld, specs),
                      out_specs=(fld, P()), check_vma=False)
        dq8, dtm8 = f(vshard.to_owned(state.q), vshard.to_owned(state.psi),
                      csh)
        dq1 = node.rhs_pv(cfg, const, state.q, state.psi,
                          jnp.asarray(0.25))
        dtm1, _ = node.adjust_dt(cfg, state.psi, cfg.dt_clamped(),
                                 jnp.zeros(()))
        np.testing.assert_array_equal(np.asarray(dq8),
                                      np.asarray(dq1)[..., :-1, :-1],
                                      err_msg=f"nl={nl} bc_fac={bc_fac}")
        assert float(dtm8) == float(dtm1)


def _smooth(N, k=2, amp=1.0):
    x = np.linspace(0.0, 1.0, N + 1)
    X, Y = np.meshgrid(x, x, indexing="xy")
    return amp * np.sin(k * np.pi * X) * np.sin((k + 1) * np.pi * Y)


def test_sharded_step_topography_and_3d_forcing():
    """v2 scope: topography (dropped-ring riding replicated) and a 3-D
    forcing field, decomposition-invariant and matching the model."""
    cfg = _cfg(3, 1.0)
    rng = np.random.default_rng(11)
    topo = _smooth(cfg.N, amp=0.3)
    qf3 = 1e-3 * rng.standard_normal((cfg.nl, cfg.N + 1, cfg.N + 1))
    const = node.build_constants(cfg, topo=topo, q_forcing_3d=qf3)
    state0 = node.init_state(cfg, const, seed=3)
    steps = 4

    s11, d11, csh = _run_sharded(cfg, const, state0, (1, 1), steps)
    s24, d24, _ = _run_sharded(cfg, const, state0, (2, 4), steps)
    np.testing.assert_array_equal(np.asarray(s24.q), np.asarray(s11.q))
    np.testing.assert_array_equal(np.asarray(s24.psi), np.asarray(s11.psi))

    step1 = jax.jit(node.make_step(cfg))
    s1 = state0
    tnext = jnp.asarray(1e18, state0.t.dtype)
    for _ in range(steps):
        s1, d1 = step1(s1, const, tnext)
    q1 = np.asarray(s1.q)[..., :-1, :-1]
    scale = np.max(np.abs(q1))
    assert np.max(np.abs(np.asarray(s24.q) - q1)) < 1e-12 * scale
    np.testing.assert_allclose(float(d24.dt), float(d1.dt), rtol=1e-12)


def test_sharded_step_stochastic_kick():
    """v2 scope: the Euler-Maruyama kick with spatially-correlated noise —
    the replicated-noise strategy is bitwise-equal to the unsharded draw."""
    import dataclasses as dc
    cfg = dc.replace(_cfg(2, 0.0), stochastic=True, amp_stoch=1e-4,
                     L_filt_stoch=12.5)
    const = node.build_constants(cfg)
    state0 = node.init_state(cfg, const, seed=9)
    steps = 3

    s11, d11, _ = _run_sharded(cfg, const, state0, (1, 1), steps)
    s24, d24, _ = _run_sharded(cfg, const, state0, (2, 4), steps)
    np.testing.assert_array_equal(np.asarray(s24.q), np.asarray(s11.q))

    step1 = jax.jit(node.make_step(cfg))
    s1 = state0
    tnext = jnp.asarray(1e18, state0.t.dtype)
    for _ in range(steps):
        s1, d1 = step1(s1, const, tnext)
    q1 = np.asarray(s1.q)[..., :-1, :-1]
    scale = np.max(np.abs(q1))
    assert np.max(np.abs(np.asarray(s24.q) - q1)) < 1e-12 * scale
    # the kick actually fired: keys advanced
    assert not np.array_equal(np.asarray(s24.key), np.asarray(state0.key))


def test_sharded_wavelet_filter():
    """v2 scope: the in-loop masked wavelet filter under vertex sharding —
    matches models.qg_node.wavelet_filter and re-freezes the q ring."""
    import dataclasses as dc

    cfg = dc.replace(_cfg(3, 1.0), dtflt=0.5, Lfmax=30.0, Lfmin=10.0)
    const = node.build_constants(cfg)
    state0 = node.init_state(cfg, const, seed=3)
    steps = 3

    def run(shape):
        mesh = make_mesh(shape)
        own0 = vshard.owned_state(state0)
        step, place, csh = vshard.make_node_step_sharded(
            cfg, mesh, const, np.asarray(state0.q), own0)
        filt = vshard.make_node_filter_sharded(cfg, mesh, own0)
        s = place(own0)
        tnext = jnp.asarray(1e18, state0.t.dtype)
        for _ in range(steps):
            s, d = step(s, csh, tnext)
        s, ring = filt(s, csh)
        csh = dc.replace(csh, ring=ring)
        s, d = step(s, csh, tnext)          # one step on the new ring
        return s, csh

    s24, c24 = run((2, 4))
    s42, c42 = run((4, 2))
    np.testing.assert_array_equal(np.asarray(s24.q), np.asarray(s42.q))
    np.testing.assert_array_equal(np.asarray(s24.psi_f),
                                  np.asarray(s42.psi_f))
    np.testing.assert_array_equal(np.asarray(c24.ring.q_top),
                                  np.asarray(c42.ring.q_top))

    # unsharded reference trajectory
    step1 = jax.jit(node.make_step(cfg))
    s1 = state0
    tnext = jnp.asarray(1e18, state0.t.dtype)
    for _ in range(steps):
        s1, _ = step1(s1, const, tnext)
    s1 = node.wavelet_filter(cfg, const, s1)
    ring_want_top = np.asarray(s1.q)[..., -1, :-1]
    np.testing.assert_allclose(np.asarray(c24.ring.q_top), ring_want_top,
                               atol=1e-11 * max(np.abs(ring_want_top).max(),
                                                1e-30))
    s1, _ = step1(s1, const, tnext)
    q1 = np.asarray(s1.q)[..., :-1, :-1]
    scale = np.max(np.abs(q1))
    assert np.max(np.abs(np.asarray(s24.q) - q1)) < 5e-12 * scale
    pf1 = np.asarray(s1.psi_f)[..., :-1, :-1]
    pscale = max(np.max(np.abs(pf1)), 1e-30)
    assert np.max(np.abs(np.asarray(s24.psi_f) - pf1)) < 1e-10 * pscale
    assert int(s24.nbar) == int(s1.nbar) == 1
