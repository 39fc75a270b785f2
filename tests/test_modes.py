"""Vertical-mode tests: eigenstructure vs scipy, Flierl normalization,
modal vs tridiagonal PV inversion equivalence."""

import numpy as np
import pytest

import jax.numpy as jnp

from msom_tpu.ops import modes
from msom_tpu.ops.stretch import layer_metrics

RNG = np.random.default_rng(13)


def test_two_layer_analytic():
    """Two layers: baroclinic eigenvalue lambda = s*(1/(dhc*dh1) + 1/(dhc*dh2))."""
    dh = np.array([0.3, 0.7])
    s = 4.0
    vm = modes.eigmod(dh, np.array([s]))
    dhc = 0.5 * (dh[0] + dh[1])
    lam = s / dhc * (1 / dh[0] + 1 / dh[1])
    assert vm.iBu[0] == 0.0
    np.testing.assert_allclose(vm.iBu[1], -lam, rtol=1e-12)
    # barotropic mode is depth-independent with Flierl norm = 1
    np.testing.assert_allclose(vm.m2l[:, 0], [1.0, 1.0], rtol=1e-10)


def test_flierl_normalization_and_biorthogonality():
    dh = np.array([0.06, 0.14, 0.3, 0.5])
    s = np.abs(RNG.standard_normal(3)) * 10
    vm = modes.eigmod(dh, s)
    # sum_k dh_k vr_km^2 = 1 for every mode
    np.testing.assert_allclose((dh[:, None] * vm.m2l**2).sum(0), 1.0,
                               rtol=1e-10)
    # surface-positive
    assert np.all(vm.m2l[0, :] >= 0)
    # VL^T VR = I  (l2m @ m2l = I)
    np.testing.assert_allclose(vm.l2m @ vm.m2l, np.eye(4), atol=1e-10)
    # eigen-relation: A vr = w vr with w = -iBu
    A = modes.stretching_matrix(dh, s)
    np.testing.assert_allclose(A @ vm.m2l, vm.m2l * (-vm.iBu)[None, :],
                               atol=1e-8)


def test_matches_scipy_eig():
    import scipy.linalg

    dh = np.array([0.2, 0.3, 0.5])
    s = np.array([3.0, 7.0])
    A = modes.stretching_matrix(dh, s)
    w_ref = np.sort(np.real(scipy.linalg.eigvals(A)))
    vm = modes.eigmod(dh, s)
    np.testing.assert_allclose(np.sort(-vm.iBu[1:]), w_ref[1:], rtol=1e-10)


def test_batched_columns():
    dh = np.array([0.5, 0.5])
    s = np.abs(RNG.standard_normal((8, 1))) * 5  # y-batch
    vm = modes.eigmod(dh, s)
    assert vm.iBu.shape == (8, 2)
    for j in range(8):
        vm1 = modes.eigmod(dh, s[j])
        np.testing.assert_allclose(vm.iBu[j], vm1.iBu, rtol=1e-10)


def test_mode_projection_roundtrip():
    dh = np.array([0.2, 0.3, 0.5])
    vm = modes.eigmod(dh, np.array([3.0, 7.0]))
    q = jnp.asarray(RNG.standard_normal((3, 8, 8)))
    qm = modes.to_modes(vm, q)
    q2 = modes.to_layers(vm, qm)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-12)


def test_modal_inversion_matches_tridiagonal():
    """MODE_PV_INVERT and the layered-tridiagonal path must give the same
    psi (uniform stratification; both solved to tight tolerance)."""
    from msom_tpu.models import qg as m
    from msom_tpu.params import QGConfig

    kw = dict(N=32, nl=3, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4, Re4=1563,
              beta=0.5, Fr=(0.0023669, 0.0076173), dh=(0.06, 0.14, 0.8),
              DT=5e-2, tend=1.0, dtout=1.0, CFL=0.6, tol=1e-10,
              dtype="float64")
    cfg_t = QGConfig(**kw).validate()
    cfg_m = QGConfig(mode_pv_invert=True, **kw).validate()
    const_t = m.build_constants(cfg_t)
    const_m = m.build_constants(cfg_m)
    psi = jnp.asarray(RNG.standard_normal((3, 32, 32)) * 0.1)
    q = m.comp_q(cfg_t, const_t, psi)
    p1, st1 = m.invert_q(cfg_t, const_t, jnp.zeros_like(q), q)
    p2, st2 = m.invert_q(cfg_m, const_m, jnp.zeros_like(q), q)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=1e-6,
                               atol=1e-8)


def test_modal_step_runs():
    from msom_tpu.models import qg as m
    from msom_tpu.params import QGConfig
    import jax

    cfg = QGConfig(N=32, nl=3, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                   Re4=1563, beta=0.5, Fr=(0.0023669, 0.0076173),
                   dh=(0.06, 0.14, 0.8), DT=5e-2, tend=1.0, dtout=1.0,
                   CFL=0.6, mode_pv_invert=True, dtype="float64").validate()
    const = m.build_constants(cfg)
    state = m.init_state(cfg, const, seed=0)
    step = jax.jit(m.make_step(cfg))
    for _ in range(3):
        state, d = step(state, const, jnp.asarray(1e9))
    assert np.isfinite(np.asarray(state.q)).all()
    assert float(d.ke) > 0
