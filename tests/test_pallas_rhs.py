"""Fused Pallas RHS kernel vs models.qg.rhs (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msom_tpu.models import pallas_rhs
from msom_tpu.models import qg as m
from msom_tpu.ops.ghost import ghosted, laplacian_g
from msom_tpu.params import QGConfig


@pytest.mark.parametrize("N,nl,Re", [(128, 3, 0), (64, 1, 0), (128, 4, 1000),
                                     (256, 2, 0)])
def test_rhs_fused_matches_xla(N, nl, Re):
    cfg = QGConfig(N=N, nl=nl, L0=80, Rom=0.025, Ekb=0.002, Eks=0.001,
                   tau0=1e-4, Re4=391, Re=Re, beta=0.5,
                   Fr=(0.0023669,) * (nl - 1) if nl > 1 else (),
                   dh=tuple([1.0 / nl] * nl), DT=5e-2, tend=500.0,
                   dtout=1.0, CFL=0.6, dtype="float64").validate()
    const = m.build_constants(cfg)
    assert pallas_rhs.applicable(cfg, const)
    state = m.init_state(cfg, const, seed=1)
    psi = state.psi + 0.1 * jax.random.normal(
        jax.random.PRNGKey(2), state.psi.shape, state.psi.dtype)
    psi_g = ghosted(psi, m._bc_psi(cfg))
    zeta = laplacian_g(psi_g, cfg.delta)
    zeta_g = m._ghost_deriv(cfg, zeta, psi_g)
    dq_ref, _ = m.rhs(cfg, const, state.q, psi, psi_g, zeta, zeta_g, None)
    dq_k, umax_k = pallas_rhs.rhs_fused(cfg, const, psi, interpret=True)
    np.testing.assert_allclose(np.asarray(dq_k), np.asarray(dq_ref),
                               atol=1e-12)
    # the fused CFL face maxima must equal the XLA lowering's, per layer
    from msom_tpu.ops.ghost import max_face_speed_layers
    umax_ref = max_face_speed_layers(psi_g, cfg.delta)
    np.testing.assert_allclose(np.asarray(umax_k), np.asarray(umax_ref),
                               rtol=1e-13, atol=0)


def test_not_applicable_with_coupling():
    """PG coupling / topography / stochastic must disable the kernel."""
    cfg = QGConfig(N=64, nl=2, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                   Re4=391, beta=0.5, Fr=(0.0023669,), dh=(0.5, 0.5),
                   DT=5e-2, tend=1.0, dtout=1.0, CFL=0.6,
                   dtype="float64").validate()
    rng = np.random.default_rng(0)
    const_pg = m.build_constants(cfg, psipg=rng.standard_normal((2, 64, 64)))
    assert not pallas_rhs.applicable(cfg, const_pg)
    const_topo = m.build_constants(cfg, topo=rng.standard_normal((64, 64)))
    assert not pallas_rhs.applicable(cfg, const_topo)
    cfg_st = QGConfig(N=64, nl=2, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                      Re4=391, beta=0.5, Fr=(0.0023669,), dh=(0.5, 0.5),
                      DT=5e-2, tend=1.0, dtout=1.0, CFL=0.6, stochastic=True,
                      dtype="float64").validate()
    const_st = m.build_constants(cfg_st)
    assert not pallas_rhs.applicable(cfg_st, const_st)


def test_step_with_kernel_matches_xla_path(monkeypatch):
    """A full predictor-corrector step routed through the fused kernel
    (MSOM_PALLAS=interpret) must reproduce the pure-XLA step."""
    cfg = QGConfig(N=64, nl=3, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                   Re4=391, beta=0.5, Fr=(0.0023669, 0.0076173),
                   dh=(0.06, 0.14, 0.8), DT=5e-2, tend=500.0, dtout=1.0,
                   CFL=0.6, dtype="float64").validate()
    const = m.build_constants(cfg)
    state0 = m.init_state(cfg, const, seed=0)
    step = m.make_step(cfg)
    tnext = jnp.asarray(1e9, state0.t.dtype)

    monkeypatch.setenv("MSOM_PALLAS", "0")
    s_x = state0
    for _ in range(3):
        s_x, _ = step(s_x, const, tnext)
    monkeypatch.setenv("MSOM_PALLAS", "interpret")
    s_p = state0
    for _ in range(3):
        s_p, _ = step(s_p, const, tnext)
    np.testing.assert_allclose(np.asarray(s_p.q), np.asarray(s_x.q),
                               atol=1e-11)
    np.testing.assert_allclose(float(s_p.t), float(s_x.t), rtol=1e-12)
