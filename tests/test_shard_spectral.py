"""Sharded direct spectral inversion (parallel/spectral_shard.py) vs the
single-device solve, on the virtual 8-device CPU mesh — the multi-chip story
for the production (spectral) inversion path, covering BOTH bases:
Dirichlet/DST and periodic/Fourier."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from msom_tpu.models import qg as m
from msom_tpu.params import QGConfig
from msom_tpu.parallel import spectral_shard
from msom_tpu.parallel.mesh import make_mesh
from msom_tpu.parallel.step import make_qg_step_sharded
from msom_tpu.solvers import spectral as sp


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh(8)


def test_fourier_matrix_diagonalizes_periodic_laplacian():
    from msom_tpu.ops.bc import BC
    from msom_tpu.ops.ghost import ghosted, laplacian_g

    N, L0 = 32, 2.0
    h = L0 / N
    R, freq = sp.fourier_matrix(N)
    # orthonormal
    np.testing.assert_allclose(R @ R.T, np.eye(N), atol=1e-12)
    # diagonalizes the periodic 1-D second difference: R L R^T = diag(lam)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((1, N, N)))
    lap = laplacian_g(ghosted(a, BC.PERIODIC), h)
    lam = -(4.0 / h ** 2) * np.sin(np.pi * freq / N) ** 2

    # transform both a and lap with R on both axes
    def tf2(x):
        x = np.einsum("kj,mjx->mkx", R, x)
        return np.einsum("ki,myi->myk", R, x)
    A2 = tf2(np.asarray(a))
    LapA = tf2(np.asarray(lap))
    expect = (lam[None, :, None] + lam[None, None, :]) * A2
    np.testing.assert_allclose(LapA, expect, atol=1e-9 / h ** 2)


@pytest.mark.parametrize("periodic", [False, True])
def test_transform_sharded_matches_full(mesh, periodic):
    N = 32
    T = sp.fourier_matrix(N)[0] if periodic else sp.dst_matrix(N)
    T = jnp.asarray(T)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((3, N, N)))

    fwd = shard_map(
        lambda x, t: spectral_shard.transform_sharded(
            x, t, inverse=False, precision=jax.lax.Precision.HIGHEST),
        mesh=mesh, in_specs=(P(None, "y", "x"), P()),
        out_specs=P(None, "y", "x"), check_vma=False)
    inv = shard_map(
        lambda x, t: spectral_shard.transform_sharded(
            x, t, inverse=True, precision=jax.lax.Precision.HIGHEST),
        mesh=mesh, in_specs=(P(None, "y", "x"), P()),
        out_specs=P(None, "y", "x"), check_vma=False)

    Tn = np.asarray(T)
    an = np.asarray(a)
    ref = np.einsum("ki,myi->myk", Tn, np.einsum("kj,mjx->mkx", Tn, an))
    got = np.asarray(fwd(a, T))
    np.testing.assert_allclose(got, ref, atol=1e-12)
    # inverse really inverts (distributed roundtrip)
    back = np.asarray(inv(fwd(a, T), T))
    np.testing.assert_allclose(back, an, atol=1e-12)


@pytest.mark.parametrize("periodic", [False, True])
def test_solve_spectral_sharded_matches_single(mesh, periodic):
    N, nl, L0 = 32, 3, 3.0
    dh = np.array([0.2, 0.3, 0.5])
    s_profile = np.array([12.0, 30.0])
    data = sp.build_spectral(nl=nl, N=N, L0=L0, dh=dh, s_profile=s_profile,
                             periodic=periodic, dtype=jnp.float64,
                             force_matmul=True)
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((nl, N, N)))
    my, mx = mesh.devices.shape
    f = shard_map(
        lambda qq, dd: spectral_shard.solve_spectral_sharded(dd, qq),
        mesh=mesh,
        in_specs=(P(None, "y", "x"), spectral_shard.specs(data, my, mx)),
        out_specs=P(None, "y", "x"), check_vma=False)
    got = np.asarray(f(q, data))
    ref = np.asarray(sp.solve_spectral(data, q))
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=1e-11 * max(scale, 1.0))


def _cfg(sbc, N=64, nl=3):
    return QGConfig(N=N, nl=nl, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                    Re4=391, beta=0.5, Fr=(0.0023669, 0.0076173)[:nl - 1],
                    dh=(0.06, 0.14, 0.8)[:nl], DT=5e-2, tend=500.0,
                    dtout=1.0, CFL=0.6, sbc=sbc, solver="spectral",
                    transform="matmul", dtype="float64").validate()


@pytest.mark.parametrize("sbc", [0.0, -1.0])
def test_sharded_spectral_step_matches_single(mesh, sbc):
    cfg = _cfg(sbc)
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
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_p.psi), np.asarray(s_ref.psi),
                               atol=1e-12)
    np.testing.assert_allclose(float(d_p.ke), float(d_ref.ke), rtol=1e-10)
    np.testing.assert_allclose(float(d_p.dt), float(d_ref.dt), rtol=1e-10)
