"""Explicit shard_map path (ppermute halos, sharded MG, sharded step) vs
the single-device reference, on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from msom_tpu.models import qg as m
from msom_tpu.ops.bc import BC
from msom_tpu.ops.ghost import ghosted, ghosted_slip
from msom_tpu.params import QGConfig
from msom_tpu.parallel import halo, shard_mg
from msom_tpu.parallel.mesh import make_mesh
from msom_tpu.parallel.step import make_qg_step_sharded, tree_specs
from msom_tpu.solvers import mg


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh(8)


def _gather_ghosted(g):
    """Materialize a Ghosted's padded array for comparison."""
    return g.padded()


@pytest.mark.parametrize("bc", [BC.DIRICHLET, BC.NEUMANN, BC.PERIODIC])
def test_ghosted_sharded_matches_global(mesh, bc):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((3, 32, 32)))
    # compare through a stencil that touches every ghost (neighbor_sum +
    # corners through a jacobian)
    from msom_tpu.ops.ghost import arakawa_mjac_g, neighbor_sum

    def op_global(x):
        g = ghosted(x, bc)
        return neighbor_sum(g) + arakawa_mjac_g(g, g, 1.0)

    def op_local(x):
        g = halo.ghosted_sharded(x, bc)
        return neighbor_sum(g) + arakawa_mjac_g(g, g, 1.0)

    f2 = shard_map(op_local, mesh=mesh, in_specs=P(None, "y", "x"),
                   out_specs=P(None, "y", "x"), check_vma=False)
    np.testing.assert_allclose(np.asarray(f2(a)), np.asarray(op_global(a)),
                               atol=1e-13)


def test_ghosted_slip_sharded(mesh):
    rng = np.random.default_rng(1)
    psi = jnp.asarray(rng.standard_normal((2, 32, 32)))
    zeta = jnp.asarray(rng.standard_normal((2, 32, 32)))
    sbc, delta = 5.0, 0.25
    from msom_tpu.ops.ghost import neighbor_sum

    def op_global(z, p):
        return neighbor_sum(ghosted_slip(z, ghosted(p, BC.DIRICHLET), sbc,
                                         delta))

    def op_local(z, p):
        pg = halo.ghosted_sharded(p, BC.DIRICHLET)
        return neighbor_sum(halo.ghosted_slip_sharded(z, pg, sbc, delta))

    f = shard_map(op_local, mesh=mesh,
                  in_specs=(P(None, "y", "x"), P(None, "y", "x")),
                  out_specs=P(None, "y", "x"), check_vma=False)
    np.testing.assert_allclose(np.asarray(f(zeta, psi)),
                               np.asarray(op_global(zeta, psi)), atol=1e-13)


def _cfg(N=64, nl=3):
    return QGConfig(N=N, nl=nl, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                    Re4=391, beta=0.5, Fr=(0.0023669, 0.0076173)[:nl - 1],
                    dh=(0.06, 0.14, 0.8)[:nl], DT=5e-2, tend=500.0,
                    dtout=1.0, CFL=0.6, dtype="float64").validate()


def test_sharded_mg_matches_single(mesh):
    cfg = _cfg()
    const = m.build_constants(cfg)
    my, mx = mesh.devices.shape
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((cfg.nl, cfg.N, cfg.N)))
    a0 = jnp.zeros_like(b)
    lv_specs = tree_specs(const.levels, my, mx)
    f = shard_map(
        lambda a, bb, lv: shard_mg.solve_layered_sharded(
            a, bb, levels=lv, my=my, mx=mx, idh0=const.idh0,
            idh1=const.idh1, bc=BC.DIRICHLET, tolerance=1e-8)[0],
        mesh=mesh, in_specs=(P(None, "y", "x"), P(None, "y", "x"), lv_specs),
        out_specs=P(None, "y", "x"), check_vma=False)
    a_sh = f(a0, b, const.levels)
    a_ref, st = mg.solve_layered(a0, b, L0=cfg.L0, s=const.strl,
                                 idh0=const.idh0, idh1=const.idh1,
                                 bc=BC.DIRICHLET, tolerance=1e-8,
                                 levels=const.levels)
    assert float(st.resa) < 1e-8
    np.testing.assert_allclose(np.asarray(a_sh), np.asarray(a_ref),
                               atol=1e-12)


def test_sharded_step_matches_single(mesh):
    cfg = _cfg()
    const = m.build_constants(cfg)
    state0 = m.init_state(cfg, const, seed=0)
    step_sh, place = make_qg_step_sharded(cfg, mesh, state0, const)
    step1 = m.make_step(cfg)
    tnext = jnp.asarray(1e9, state0.t.dtype)
    s_ref, s_p = state0, place(state0)
    const_sh = place(const)
    for _ in range(3):
        s_ref, d_ref = step1(s_ref, const, tnext)
        s_p, d_p = step_sh(s_p, const_sh, tnext)
    np.testing.assert_allclose(np.asarray(s_p.q), np.asarray(s_ref.q),
                               atol=1e-14)
    np.testing.assert_allclose(np.asarray(s_p.psi), np.asarray(s_ref.psi),
                               atol=1e-14)
    np.testing.assert_allclose(float(d_p.ke), float(d_ref.ke), rtol=1e-12)
    np.testing.assert_allclose(float(d_p.dt), float(d_ref.dt), rtol=1e-12)


def test_sharded_step_full_model_matches_single(mesh):
    """v2 scope: PG coupling (psipg + flsrv large-scale vorticity),
    topography and passive tracers under the explicit shard_map step —
    the padded constants ride replicated with per-device window slicing,
    tracers shard and advance like q."""
    N, nl = 64, 3
    cfg = QGConfig(N=N, nl=nl, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                   Re4=391, beta=0.5, Fr=(0.0023669, 0.0076173),
                   dh=(0.06, 0.14, 0.8), DT=5e-2, tend=500.0, dtout=1.0,
                   CFL=0.6, flsrv=1, nptr=2, Pe=(1e3, 1e3),
                   ptr_r=(100.0, 0.0), dtype="float64").validate()
    rng = np.random.default_rng(7)
    x = (np.arange(N) + 0.5) * cfg.L0 / N
    X, Y = np.meshgrid(x, x, indexing="xy")
    psipg = 1e-2 * np.stack([np.sin(2 * np.pi * Y / cfg.L0) * (l + 1)
                             for l in range(nl)])
    topo = 0.05 * np.sin(2 * np.pi * X / cfg.L0) \
        * np.sin(4 * np.pi * Y / cfg.L0)
    const = m.build_constants(cfg, psipg=psipg, topo=topo)
    assert const.pp_pad is not None and const.topo_pad is not None
    state0 = m.init_state(cfg, const, seed=1)
    assert state0.tracers is not None

    step_sh, place = make_qg_step_sharded(cfg, mesh, state0, const)
    step1 = m.make_step(cfg)
    tnext = jnp.asarray(1e9, state0.t.dtype)
    s_ref, s_p = state0, place(state0)
    const_sh = place(const)
    for _ in range(3):
        s_ref, d_ref = step1(s_ref, const, tnext)
        s_p, d_p = step_sh(s_p, const_sh, tnext)
    np.testing.assert_allclose(np.asarray(s_p.q), np.asarray(s_ref.q),
                               atol=1e-14)
    np.testing.assert_allclose(np.asarray(s_p.tracers),
                               np.asarray(s_ref.tracers), atol=1e-14)
    np.testing.assert_allclose(float(d_p.dt), float(d_ref.dt), rtol=1e-12)
    np.testing.assert_allclose(float(d_p.ke), float(d_ref.ke), rtol=1e-11)
