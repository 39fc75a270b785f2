"""Transcription-independent lockstep: qg-node model vs tests/oracle_node.

The node model's other tests (conservation, sharded-vs-unsharded,
spectral-vs-vmg) all share the model's own formula transcriptions; this
harness steps the model against an independent NumPy/scipy re-transcription
of the reference (explicit slice stencils + sparse-LU inversion) from
identical ICs and requires machine-precision agreement (GOLDEN.md)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msom_tpu.models import qg_node as qn
from msom_tpu.ops import vertex
from tests.oracle_node import NodeOracle


def run_lockstep(cfg, steps, seed, oracle_kw=None, const_kw=None):
    const = qn.build_constants(cfg, **(const_kw or {}))
    state = qn.init_state(cfg, const, seed=seed)
    orc = NodeOracle(cfg, **(oracle_kw or {}))
    psi0 = np.asarray(state.psi, np.float64)
    q = orc.comp_q(psi0.copy())
    np.testing.assert_allclose(np.asarray(state.q), q, rtol=0,
                               atol=1e-13 * max(np.abs(q).max(), 1e-300))
    step = jax.jit(qn.make_step(cfg))
    psi, prev, t = psi0.copy(), 0.0, 0.0
    tnext = jnp.asarray(1e18, state.t.dtype)
    for i in range(1, steps + 1):
        q, psi, prev, dt_o = orc.step(q, psi, prev, t)
        t += dt_o
        state, diag = step(state, const, tnext)
        yield i, (q, psi, dt_o, t), state, diag


def node_cfg(**kw):
    base = dict(N=64, nl=3, L0=100.0, f0=46.5, beta=0.5, hEkb=1e-3,
                tau0=1e-3, tau1=5e-4, tf1=2.0, tf2=3.0, dy_ws=0.3, nu=5.0,
                dh=(0.2, 0.3, 0.5), N2=(1.0, 2.0), noise_init=1e-3,
                bc_fac=0.0, DT=5e-2, tend=10.0, dtout=10.0, CFL=0.2,
                TOLERANCE=1e-8, solver="spectral", dtype="float64")
    base.update(kw)
    return qn.NodeQGConfig(**base)


def test_lockstep_node_baroclinic_100():
    """100 steps of the 3-layer baroclinic wall config at machine precision
    (the model runs its exact spectral inversion; the oracle an independent
    sparse-LU of the same interior system)."""
    for i, (q, psi, dt_o, t), state, diag in run_lockstep(
            node_cfg(), 100, 11):
        relq = np.abs(np.asarray(state.q) - q).max() / np.abs(q).max()
        assert relq < 1e-8, f"step {i}: relq={relq:.3e}"
        np.testing.assert_allclose(float(state.t), t, rtol=1e-12)
    relpsi = np.abs(np.asarray(state.psi) - psi).max() / np.abs(psi).max()
    assert relpsi < 1e-8


def test_lockstep_node_coupled_noslip():
    """40 steps with PG coupling + topography + 3-D forcing + no-slip walls
    (bc_fac = 1) + biharmonic nu4 — every rhs_pv_baroclinic term exercised
    (qg_baroclinic_ms.h:103-196)."""
    N = 64
    rng = np.random.default_rng(2)
    yv = np.arange(N + 1)[:, None] * (100.0 / N) * np.ones((N + 1, N + 1))
    pp = 1e-3 * np.sin(np.pi * yv / 100.0)[None] * np.ones((3, N + 1, N + 1))
    topo = 0.02 * np.sin(2 * np.pi * yv / 100.0) \
        * np.sin(np.pi * yv.T / 100.0)
    qf3 = 1e-5 * rng.standard_normal((3, N + 1, N + 1))
    # nu4 well inside the biharmonic stability limit: at the margin
    # (nu4*(pi/Delta)^4*dt ~ 1) roundoff differences amplify chaotically
    # and the lockstep comparison measures stability, not transcription
    cfg = node_cfg(bc_fac=1.0, nu4=50.0)
    kw = dict(psi_pg=pp, topo=topo, q_forcing_3d=qf3)
    for i, (q, psi, dt_o, t), state, diag in run_lockstep(
            cfg, 40, 5, oracle_kw=kw, const_kw=kw):
        relq = np.abs(np.asarray(state.q) - q).max() / np.abs(q).max()
        assert relq < 1e-8, f"step {i}: relq={relq:.3e}"


def test_lockstep_node_barotropic():
    """60 steps of the nl = 1 barotropic module incl. the iRd2_low
    Helmholtz shift (qg_barotropic.h)."""
    cfg = node_cfg(nl=1, dh=(1.0,), N2=(1.0,), gp_low=4.0, nu=5.0)
    for i, (q, psi, dt_o, t), state, diag in run_lockstep(cfg, 60, 3):
        relq = np.abs(np.asarray(state.q) - q).max() / np.abs(q).max()
        assert relq < 1e-8, f"step {i}: relq={relq:.3e}"
