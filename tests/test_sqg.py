"""SQG variant (completed sqg_baroclinic_ms design): inversion consistency,
reduction to the baroclinic path at bs == 0, and conservation oracles."""

import numpy as np

import jax
import jax.numpy as jnp

from msom_tpu.models import qg_node as node
from msom_tpu.models import sqg
from msom_tpu.ops import vertex


def _cfg(**kw):
    base = dict(N=32, nl=3, L0=1.0, f0=1.0, beta=0.0, hEkb=0.0, nu=0.0,
                nu4=0.0, tau0=0.0, noise_init=1e-2, dh=(0.2, 0.3, 0.5),
                N2=(1.0, 0.5, 0.25), DT=1e-3, CFL=0.4, TOLERANCE=1e-10,
                dtype="float64")
    base.update(kw)
    return node.NodeQGConfig(**base)


def test_metrics():
    idh0, idh1 = sqg.sqg_metrics((0.2, 0.3, 0.5))
    assert idh0[0] == 1.0 / 0.2
    dhc0 = 0.5 * (0.2 + 0.3)
    assert np.isclose(idh1[0], 1.0 / (dhc0 * 0.2))
    assert idh1[-1] == 0.0


def test_invert_roundtrip():
    """comp_q then invert_q recovers psi (with the bs source present)."""
    cfg = _cfg()
    const = sqg.build_constants(cfg)
    state = sqg.init_state(cfg, const, seed=3)
    q = sqg.comp_q(cfg, const, state.psi, state.bs)
    psi2, st = sqg.invert_q(cfg, const, jnp.zeros_like(state.psi), q,
                            state.bs)
    np.testing.assert_allclose(np.asarray(psi2), np.asarray(state.psi),
                               atol=1e-8)


def test_bs_zero_reduces_to_baroclinic():
    """With bs == 0 the SQG tendencies equal the baroclinic rhs_pv under the
    SQG psi-coupling metrics."""
    cfg = _cfg()
    const = sqg.build_constants(cfg)
    state = sqg.init_state(cfg, const, seed=0, bs0=np.zeros((33, 33)))
    nc = sqg._node_const(cfg, const)
    q = sqg.comp_q(cfg, const, state.psi, state.bs)
    q_node = node.comp_q(cfg, nc, state.psi)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_node), atol=1e-14)
    psi_a, _ = sqg.invert_q(cfg, const, state.psi, q, state.bs)
    psi_b, _ = node.invert_q(cfg, nc, state.psi, q_node)
    np.testing.assert_allclose(np.asarray(psi_a), np.asarray(psi_b),
                               atol=1e-12)


def test_bs_influences_inversion():
    """Nonzero surface buoyancy must change the inverted streamfunction."""
    cfg = _cfg()
    const = sqg.build_constants(cfg)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((3, 33, 33)))
    q = q * const.mask
    bs = jnp.asarray(rng.standard_normal((33, 33))) * const.mask
    p0, _ = sqg.invert_q(cfg, const, jnp.zeros_like(q), q,
                         jnp.zeros_like(bs))
    p1, _ = sqg.invert_q(cfg, const, jnp.zeros_like(q), q, bs)
    assert float(jnp.max(jnp.abs(p1 - p0))) > 1e-6


def test_step_runs_and_conserves_bs_variance():
    """Inviscid, unforced: the Arakawa advection of bs conserves its variance
    up to the O(dt^2) time-discretization error."""
    cfg = _cfg(DT=5e-4)
    const = sqg.build_constants(cfg)
    state = sqg.init_state(cfg, const, seed=1)
    step = sqg.make_step(cfg)
    tnext = jnp.asarray(1e9, state.t.dtype)
    bs2_0 = float(jnp.sum(state.bs ** 2))
    for _ in range(5):
        state, diag = step(state, const, tnext)
    assert np.isfinite(float(diag.ke))
    bs2_1 = float(jnp.sum(state.bs ** 2))
    assert abs(bs2_1 - bs2_0) < 1e-6 * max(bs2_0, 1e-30)


def test_time_filter():
    from msom_tpu.models.qg import time_filter
    q = jnp.ones((2, 4, 4))
    qm = jnp.zeros_like(q)
    qm = time_filter(q, qm, dt=2.0)           # alpha = 0.1
    np.testing.assert_allclose(np.asarray(qm), 0.1)
    qm = time_filter(q, qm, dt=2.0)
    np.testing.assert_allclose(np.asarray(qm), 0.19)
