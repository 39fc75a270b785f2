"""Transcription-independent lockstep: mspg model vs tests/oracle_pg.

The PG model's other tests are property tests (conservation, relaxation,
adjustment) sharing the model's own transcriptions; this harness steps the
model against an independent NumPy re-transcription of the reference
(explicit layer loops, literal Thomas elimination, sequential convection
sweep) from identical ICs — machine precision over >= 100 steps
(GOLDEN.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msom_tpu.models import mspg
from msom_tpu.params import PGConfig
from tests.oracle_pg import PGOracle


def pg_cfg(**kw):
    base = dict(N=32, nl=8, ys=0.3, r=0.02, tau_s=3e-2, tau0=0.12, kv=1e-4,
                kh=1e-4, omega=0.2, DT=1e-2, CFL=0.4, tend=10.0, dtout=10.0,
                dtype="float64")
    base.update(kw)
    return PGConfig(**base)


def test_lockstep_pg_120_steps():
    """120 steps of the PG gyre spin-up from rest: advection + diagnostic w
    + horizontal/implicit-vertical diffusion + convection + surface
    relaxation + momentum + barotropic adjustment, all in lockstep at
    machine precision. ICs: b = 0, u = 0 (the reference starts from
    b0.bas or rest, pg.c:133-162)."""
    cfg = pg_cfg()
    const = mspg.build_constants(cfg)
    state = mspg.init_state(cfg, const)
    step = jax.jit(mspg.make_step(cfg))
    orc = PGOracle(cfg, const)

    b = np.zeros((cfg.nl, cfg.N, cfg.N))
    ux = np.zeros((cfg.nl, cfg.N, cfg.N + 1))
    uy = np.zeros((cfg.nl, cfg.N + 1, cfg.N))
    prev, t = 0.0, 0.0
    tnext = jnp.asarray(1e18, state.t.dtype)
    for i in range(1, 121):
        b, ux, uy, prev, dt_o = orc.step(b, ux, uy, prev, t)
        t += dt_o
        state, diag = step(state, const, tnext)
        scale = max(np.abs(b).max(), 1e-30)
        relb = np.abs(np.asarray(state.b) - b).max() / scale
        assert relb < 1e-12, f"step {i}: relb={relb:.3e}"
        uscale = max(np.abs(ux).max(), np.abs(uy).max(), 1e-30)
        relu = max(np.abs(np.asarray(state.ux) - ux).max(),
                   np.abs(np.asarray(state.uy) - uy).max()) / uscale
        assert relu < 1e-11, f"step {i}: relu={relu:.3e}"
        np.testing.assert_allclose(float(diag.dt), dt_o, rtol=1e-12)
    assert t > 0 and np.abs(b).max() > 0


def test_lockstep_pg_with_qg_forcing():
    """40 steps with a QG eddy buoyancy forcing field (qg_forcing,
    pg.h:598-606)."""
    cfg = pg_cfg(nl=4)
    rng = np.random.default_rng(8)
    bf = 1e-3 * rng.standard_normal((4, 32, 32))
    const = mspg.build_constants(cfg, b_forc=bf)
    state = mspg.init_state(cfg, const)
    step = jax.jit(mspg.make_step(cfg))
    orc = PGOracle(cfg, const)
    b = np.zeros((cfg.nl, cfg.N, cfg.N))
    ux = np.zeros((cfg.nl, cfg.N, cfg.N + 1))
    uy = np.zeros((cfg.nl, cfg.N + 1, cfg.N))
    prev, t = 0.0, 0.0
    tnext = jnp.asarray(1e18, state.t.dtype)
    for i in range(1, 41):
        b, ux, uy, prev, dt_o = orc.step(b, ux, uy, prev, t)
        t += dt_o
        state, diag = step(state, const, tnext)
        relb = np.abs(np.asarray(state.b) - b).max() / max(np.abs(b).max(),
                                                           1e-30)
        assert relb < 1e-12, f"step {i}: relb={relb:.3e}"
