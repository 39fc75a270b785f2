"""msqg model tests: inversion round-trip, conservation structure,
double-gyre spin-up, event scheduling, stochastic and tracer paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msom_tpu import driver
from msom_tpu.models import qg as m
from msom_tpu.params import QGConfig, load_qg_config

RNG = np.random.default_rng(7)


def verron_cfg(**kw):
    base = dict(N=32, nl=3, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4, Re4=1563,
                beta=0.5, Fr=(0.0023669, 0.0076173), dh=(0.06, 0.14, 0.8),
                DT=5e-2, tend=0.5, dtout=1.0, CFL=0.6, dtype="float64")
    base.update(kw)
    return QGConfig(**base).validate()


def test_params_parser_reads_reference_deck():
    cfg = load_qg_config("/root/reference/msqg/test/params.double_gyre.in",
                         dtype="float64")
    assert cfg.N == 256 and cfg.nl == 3 and cfg.L0 == 80
    assert cfg.Rom == 0.025 and cfg.Re4 == 1563 and cfg.CFL == 0.6
    assert cfg.Fr == (0.0023669, 0.0076173)
    assert cfg.dh == (0.06, 0.14, 0.8)
    # derived: iRe4 has a minus sign; DT halved by the biharmonic clamp
    assert cfg.iRe4 == -1.0 / 1563
    assert cfg.dt_clamped() == pytest.approx(0.025)


def test_invert_compq_roundtrip():
    cfg = verron_cfg()
    const = m.build_constants(cfg)
    psi = jnp.asarray(RNG.standard_normal((3, 32, 32)))
    q = m.comp_q(cfg, const, psi)
    psi2, st = m.invert_q(cfg, const, jnp.zeros_like(psi), q)
    # residual tolerance 1e-3 in q-units; psi error is O(tol * L^2 scale)
    q2 = m.comp_q(cfg, const, psi2)
    assert float(jnp.max(jnp.abs(q2 - q))) < 2e-3


def test_single_layer_no_dynamics():
    """nl=1: advection contributes nothing (msqg/qg.h:376-379); with zero
    forcing/dissipation q must stay constant."""
    cfg = QGConfig(N=32, nl=1, L0=1.0, Rom=0.1, dh=(1.0,), DT=1e-2,
                   tend=0.1, dtype="float64").validate()
    const = m.build_constants(cfg)
    state = m.init_state(cfg, const, seed=1)
    q0 = np.asarray(state.q)
    step = jax.jit(m.make_step(cfg))
    for _ in range(5):
        state, diag = step(state, const, jnp.asarray(1e9))
    np.testing.assert_allclose(np.asarray(state.q), q0, atol=1e-14)


def test_double_gyre_spinup():
    cfg = verron_cfg(tend=1.0)
    kes = []
    hooks = driver.RunHooks(on_log=lambda i, dt, t, ke: kes.append(ke))
    state = driver.run_qg(cfg, hooks=hooks)
    assert np.isfinite(np.asarray(state.q)).all()
    assert kes[-1] > kes[0] > 0  # wind spins up the gyre from noise
    assert float(state.t) == pytest.approx(1.0)


def test_dt_ramp_and_event_landing():
    """CFL previous-smoothing: first dt = 0.1/1.1 of the CFL dt; steps land
    exactly on event times."""
    cfg = verron_cfg(tend=1.0, dtout=0.5)
    dts, ts = [], []
    hooks = driver.RunHooks(on_log=lambda i, dt, t, ke: (dts.append(dt),
                                                         ts.append(t)))
    driver.run_qg(cfg, hooks=hooks)
    assert dts[1] > dts[0]  # ramp-up
    # some step must land exactly on t=0.5 (the output event)
    assert any(abs(t - 0.5) < 1e-12 for t in ts)


def test_stochastic_kick():
    cfg = verron_cfg(stochastic=True, tr_stoch=10.0, amp_stoch=0.5)
    const = m.build_constants(
        cfg, s_stoch=np.ones((3, 32, 32)))
    state = m.init_state(cfg, const, seed=3)
    step = jax.jit(m.make_step(cfg))
    s1, _ = step(state, const, jnp.asarray(1e9))
    s2, _ = step(s1, const, jnp.asarray(1e9))
    # different noise each step: increments differ beyond deterministic drift
    d1 = np.asarray(s1.q - state.q)
    d2 = np.asarray(s2.q - s1.q)
    assert np.std(d1 - d2) > 0
    assert np.isfinite(np.asarray(s2.q)).all()


def test_tracer_advection_conserves_mean():
    """Periodic, Pe=0 (no diffusion), no relaxation: the Arakawa advection
    conserves the tracer integral."""
    cfg = QGConfig(N=32, nl=2, L0=1.0, Rom=0.1, beta=0.0, sbc=-1,
                   Fr=(0.1,), dh=(0.5, 0.5), nptr=1, Pe=(0.0,),
                   ptr_r=(0.0,), DT=1e-3, tend=1.0, dtype="float64").validate()
    const = m.build_constants(cfg)
    state = m.init_state(cfg, const, seed=4)
    tr0 = np.asarray(state.tracers)
    step = jax.jit(m.make_step(cfg))
    for _ in range(10):
        state, _ = step(state, const, jnp.asarray(1e9))
    tr = np.asarray(state.tracers)
    np.testing.assert_allclose(tr.sum(axis=(-2, -1)), tr0.sum(axis=(-2, -1)),
                               rtol=1e-10, atol=1e-10)
    assert np.std(tr - tr0) > 0  # but the field did evolve


def test_jit_scan_compatibility():
    """The step must scan (for bench/TPU time loops)."""
    cfg = verron_cfg(tend=10.0)
    const = m.build_constants(cfg)
    state = m.init_state(cfg, const, seed=0)

    def body(s, _):
        s, d = m.make_step(cfg)(s, const, jnp.asarray(1e9))
        return s, d.ke

    final, kes = jax.jit(lambda s: jax.lax.scan(body, s, None, length=5))(state)
    assert np.isfinite(np.asarray(kes)).all()
    assert int(final.i) == 5
