"""Fused nodal Pallas RHS kernel vs models.qg_node.rhs_pv (interpret)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msom_tpu.models import pallas_node_rhs as pnk
from msom_tpu.models import qg_node as qn
from msom_tpu.ops import vertex


def _cfg(**kw):
    base = dict(N=64, nl=3, L0=100.0, f0=46.5, beta=0.5, hEkb=1e-3,
                tau0=1e-3, tau1=5e-4, tf1=2.0, tf2=3.0, dy_ws=0.3, nu=5.0,
                dh=(0.2, 0.3, 0.5), N2=(1.0, 2.0), noise_init=1e-3,
                bc_fac=0.0, DT=5e-2, tend=1.0, dtout=1.0, CFL=0.2,
                TOLERANCE=1e-8, dtype="float64")
    base.update(kw)
    return qn.NodeQGConfig(**base)


def _compare(cfg, const, t=0.37, seed=4, atol=1e-12):
    assert const.nrhsk is not None
    state = qn.init_state(cfg, const, seed=seed)
    psi = state.psi + 0.01 * jax.random.normal(
        jax.random.PRNGKey(seed + 1), state.psi.shape, state.psi.dtype)
    if not cfg.periodic:
        psi = vertex.bc_psi(psi)
    q = qn.comp_q(cfg, const, psi)
    tt = jnp.asarray(t, psi.dtype)
    dq_ref = qn.rhs_pv(cfg, const, q, psi, tt)
    qf_prof = qn.q_forcing_profile(cfg, const.yv[:, 0], tt)
    dq_k = pnk.rhs_fused_node(cfg, const, q, psi, qf_prof, interpret=True)
    scale = np.abs(np.asarray(dq_ref)).max()
    np.testing.assert_allclose(np.asarray(dq_k), np.asarray(dq_ref),
                               rtol=0, atol=atol * max(scale, 1.0))


def test_node_kernel_baroclinic_freeslip():
    cfg = _cfg()
    _compare(cfg, qn.build_constants(cfg))


def test_node_kernel_noslip_biharmonic():
    """bc_fac = 1 with nu4: the two ring rules (bc_deriv on zeta,
    bc_deriv_rel on the biharmonic intermediate) in-kernel."""
    cfg = _cfg(bc_fac=1.0, nu4=50.0)
    _compare(cfg, qn.build_constants(cfg))


def test_node_kernel_coupled():
    """PG coupling + topography + 3-D forcing + flag_ms (y-varying S2
    profile) + a custom mask (an island), no-slip."""
    N = 64
    rng = np.random.default_rng(3)
    yv = np.arange(N + 1)[:, None] * (100.0 / N) * np.ones((N + 1, N + 1))
    pp = 1e-3 * np.sin(np.pi * yv / 100.0)[None] * np.ones((3, N + 1, N + 1))
    topo = 0.02 * np.sin(2 * np.pi * yv / 100.0) * np.sin(np.pi * yv.T / 100.0)
    qf3 = 1e-5 * rng.standard_normal((3, N + 1, N + 1))
    m = np.array(vertex.default_mask(N))
    m[20:26, 30:36] = 0.0
    cfg = _cfg(bc_fac=1.0, nu4=50.0, flag_ms=1)
    const = qn.build_constants(cfg, psi_pg=pp, topo=topo,
                               q_forcing_3d=qf3, mask=m)
    _compare(cfg, const)


def test_node_kernel_barotropic():
    cfg = _cfg(nl=1, dh=(1.0,), N2=(1.0,), gp_low=4.0)
    _compare(cfg, qn.build_constants(cfg))


def test_node_kernel_ragged_sizes():
    """Non-power-of-2-plus-one row counts exercise the ragged last block
    (N+1 = 97, 129)."""
    for N in (96, 128):
        cfg = _cfg(N=N)
        _compare(cfg, qn.build_constants(cfg))


def test_node_step_with_kernel_matches_xla(monkeypatch):
    """Full steps routed through the fused nodal kernel
    (MSOM_PALLAS=interpret) vs the pure-XLA step."""
    cfg = _cfg(bc_fac=1.0)
    const = qn.build_constants(cfg)
    state0 = qn.init_state(cfg, const, seed=0)
    step = qn.make_step(cfg)
    tnext = jnp.asarray(1e18, state0.t.dtype)

    monkeypatch.setenv("MSOM_PALLAS", "0")
    s_x = state0
    for _ in range(3):
        s_x, _ = step(s_x, const, tnext)
    monkeypatch.setenv("MSOM_PALLAS", "interpret")
    s_p = state0
    for _ in range(3):
        s_p, _ = step(s_p, const, tnext)
    np.testing.assert_allclose(
        np.asarray(s_p.q), np.asarray(s_x.q),
        atol=1e-11 * np.abs(np.asarray(s_x.q)).max())
    np.testing.assert_allclose(float(s_p.t), float(s_x.t), rtol=1e-12)
