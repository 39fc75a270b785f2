"""Full-step lockstep tests: the model vs the independent NumPy/scipy oracle
(tests/oracle_full_step.py) on the Verron double-gyre deck — the BASELINE.md
correctness north star ("psi/q allclose vs reference after N steps"), with
the compiled-reference comparison deferred (qcc/Basilisk unavailable; see
GOLDEN.md). Tolerances sit 100-1000x above the measured machine-precision
agreement recorded in GOLDEN.md and far below any physical signal."""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msom_tpu.models import qg as m
from msom_tpu.params import QGConfig
from tests import reference_numpy as ref
from tests.oracle_full_step import Oracle, jacobian, pad_dirichlet


def verron(N, solver="spectral", **kw):
    base = dict(N=N, nl=3, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4, Re4=1563,
                beta=0.5, Fr=(0.0023669, 0.0076173), dh=(0.06, 0.14, 0.8),
                DT=5e-2, tend=500., dtout=1., CFL=0.6, dtype="float64",
                solver=solver)
    base.update(kw)
    return QGConfig(**base).validate()


def run_lockstep(cfg, steps, seed):
    """Yields (i, oracle_state, model_state, diag) stepping both in lockstep
    from identical noise ICs."""
    rng = np.random.default_rng(seed)
    psi0 = 1e-3 * rng.uniform(-1, 1, (cfg.nl, cfg.N, cfg.N))
    psi0 -= psi0.mean(axis=(-2, -1), keepdims=True)
    const = m.build_constants(cfg)
    state = m.init_state(cfg, const, psi0=psi0)
    step = jax.jit(m.make_step(cfg))
    orc = Oracle(cfg)
    q, psi, prev, t = orc.comp_q(psi0.copy()), psi0.copy(), 0.0, 0.0
    # q0: model comp_q vs oracle comp_q must already agree at roundoff
    np.testing.assert_allclose(np.asarray(state.q), q, rtol=0,
                               atol=1e-13 * np.abs(q).max())
    for i in range(1, steps + 1):
        q, psi, prev, dt_o, ke_o = orc.step(q, psi, prev, t, 1e9)
        t += dt_o
        state, diag = step(state, const, jnp.asarray(1e9, state.t.dtype))
        yield i, (q, psi, dt_o, ke_o, t), state, diag


def test_oracle_matches_loop_level():
    """The oracle's vectorized 12-point Jacobian and its RHS building blocks
    agree index-for-index with the per-cell loop transcriptions of the
    reference macros (tests/reference_numpy.py)."""
    rng = np.random.default_rng(3)
    N = 12
    p = rng.standard_normal((N, N))
    z = rng.standard_normal((N, N))
    pp = pad_dirichlet(p)
    zp = pad_dirichlet(z)
    np.testing.assert_allclose(jacobian(pp, zp, 0.37),
                               ref.arakawa_ref(pp, zp, 0.37), atol=1e-14)
    np.testing.assert_allclose(pp, ref.pad_ref(p, "dirichlet"), atol=0)
    # oracle stretch (einsum against the coupling matrix) vs loop-level
    cfg = verron(N)
    orc = Oracle(cfg)
    a = rng.standard_normal((3, N, N))
    s3 = orc.strl[:, None, None] * np.ones((2, N, N))
    np.testing.assert_allclose(
        orc.stretch(a), ref.stretch_ref(a, s3, orc.idh0, orc.idh1),
        atol=1e-14)


def test_lockstep_verron_64():
    """120 steps at 64^2 x 3: per-step psi/q/dt/ke agreement at machine
    precision (measured ~4e-15, GOLDEN.md)."""
    kes = {}
    for i, (q, psi, dt_o, ke_o, t), state, diag in run_lockstep(
            verron(64), 120, 42):
        relq = np.abs(np.asarray(state.q) - q).max() / np.abs(q).max()
        relpsi = np.abs(np.asarray(state.psi) - psi).max() / np.abs(psi).max()
        assert relq < 1e-11, f"step {i}: relq={relq:.3e}"
        assert relpsi < 1e-11, f"step {i}: relpsi={relpsi:.3e}"
        assert abs(float(diag.dt) - dt_o) <= 1e-12 * dt_o, f"step {i}: dt"
        assert abs(float(diag.ke) - ke_o) <= 1e-10 * abs(ke_o), f"step {i}: ke"
        kes[i] = ke_o
    # regression against the committed GOLDEN.md KE trajectory
    with open("GOLDEN.md") as f:
        text = f.read()
    sec = text.split('solver="spectral" (exact)')[1].split("##")[0]
    golden = {}
    for line in sec.splitlines():
        mm = re.match(r"\| (\d+) \| [\d.]+ \| [\d.e+-]+ \| ([\d.e+-]+) \|",
                      line)
        if mm:
            golden[int(mm.group(1))] = float(mm.group(2))
    assert golden, "could not parse GOLDEN.md KE table"
    checked = 0
    for i, ke in golden.items():
        if i in kes:
            assert abs(kes[i] - ke) <= 1e-9 * abs(ke), \
                f"GOLDEN.md KE mismatch at step {i}"
            checked += 1
    assert checked >= 5


def test_lockstep_verron_128():
    """30 steps at 128^2 x 3 (same agreement at doubled resolution)."""
    for i, (q, psi, dt_o, ke_o, t), state, diag in run_lockstep(
            verron(128), 30, 42):
        relq = np.abs(np.asarray(state.q) - q).max() / np.abs(q).max()
        assert relq < 1e-11, f"step {i}: relq={relq:.3e}"


def test_lockstep_partial_slip():
    """40 steps with partial-slip walls (sbc = 1): validates the slip ghost
    law zeta_ghost = c*(psi_in - psi_ghost) end-to-end
    (/root/reference/msqg/qg.h:185-198)."""
    for i, (q, psi, dt_o, ke_o, t), state, diag in run_lockstep(
            verron(64, sbc=1.0), 40, 7):
        relq = np.abs(np.asarray(state.q) - q).max() / np.abs(q).max()
        relpsi = np.abs(np.asarray(state.psi) - psi).max() / np.abs(psi).max()
        assert relq < 1e-11 and relpsi < 1e-11, f"step {i}"


def test_mg_path_tracks_exact_within_tolerance():
    """The reference-parity multigrid path (tol = 1e-3 max-norm,
    msqg/qg.h:159) must track the exact trajectory at the solver-tolerance
    level without secular growth (GOLDEN.md records ~1e-3 bounded drift over
    250 steps; assert a 10x bound over 60 steps)."""
    worst = 0.0
    for i, (q, psi, dt_o, ke_o, t), state, diag in run_lockstep(
            verron(64, solver="mg"), 60, 42):
        relpsi = np.abs(np.asarray(state.psi) - psi).max() / np.abs(psi).max()
        worst = max(worst, relpsi)
    assert worst < 3e-2, f"mg drift {worst:.3e} exceeds tolerance bound"


def test_energy_conserv_advection():
    """ENERGY_CONSERV (/root/reference/msqg/qg.h:310-340): advecting the
    full PV q in the self-advection (and dropping J(psi_l, psi_l+1) from
    the stretching cascade) makes the inviscid advection operator conserve
    BOTH discrete quadratic invariants — energy sum(dh_l psi_l dq_l) and
    potential enstrophy sum(dh_l q_l dq_l) — to roundoff even when strl
    varies in space, where the standard split does not (the Jacobian no
    longer commutes with the spatially-varying stretching coefficient).
    With uniform strl the two forms are algebraically identical."""
    from msom_tpu.ops.bc import BC
    from msom_tpu.ops.ghost import ghosted, laplacian_g

    N, nl = 32, 3
    y = (np.arange(N) + 0.5) / N
    frpg = 0.3 + 0.2 * np.sin(2 * np.pi * y)[None, :, None] \
        * np.ones((nl - 1, N, N))
    base = dict(N=N, nl=nl, L0=1.0, Rom=0.025, Fr=(0.3, 0.4),
                dh=(0.2, 0.3, 0.5), dtype="float64", tau0=0.0, Re=0,
                Re4=0, Ekb=0, Eks=0, beta=0.0)

    def invariant_residuals(ec):
        cfg = QGConfig(**base, energy_conserv=ec).validate()
        const = m.build_constants(cfg, frpg=frpg)
        psi = jax.random.normal(jax.random.PRNGKey(1),
                                (nl, N, N), jnp.float64)
        psi = psi - psi.mean(axis=(-2, -1), keepdims=True)
        q = m.comp_q(cfg, const, psi)
        psi_g = ghosted(psi, BC.DIRICHLET)
        zeta = laplacian_g(psi_g, cfg.delta)
        zeta_g = m._ghost_deriv(cfg, zeta, psi_g)
        dq, _ = m.rhs(cfg, const, q, psi, psi_g, zeta, zeta_g, None)
        dh = jnp.asarray(np.asarray(cfg.dh[:nl]))
        relE = abs(float(jnp.einsum("l,lyx->", dh, psi * dq))) \
            / float(jnp.einsum("l,lyx->", dh, jnp.abs(psi * dq)))
        relZ = abs(float(jnp.einsum("l,lyx->", dh, q * dq))) \
            / float(jnp.einsum("l,lyx->", dh, jnp.abs(q * dq)))
        return dq, relE, relZ

    dq_std, relE_std, relZ_std = invariant_residuals(False)
    dq_ec, relE_ec, relZ_ec = invariant_residuals(True)
    assert relE_ec < 1e-13 and relZ_ec < 1e-13, (relE_ec, relZ_ec)
    # the standard split genuinely violates both with varying strl
    assert relE_std > 1e-5 and relZ_std > 1e-5, (relE_std, relZ_std)
    # and the two tendencies genuinely differ
    d = float(jnp.max(jnp.abs(dq_ec - dq_std))
              / jnp.max(jnp.abs(dq_std)))
    assert d > 1e-3


def test_energy_conserv_uniform_strl_identical():
    """With spatially-uniform strl the EC and standard advection splits are
    the same algebra (bilinearity of the Arakawa bracket): dq must agree to
    roundoff — EC changes nothing on the canonical Verron config."""
    from msom_tpu.ops.bc import BC
    from msom_tpu.ops.ghost import ghosted, laplacian_g

    dqs = {}
    for ec in (False, True):
        cfg = verron(32, energy_conserv=ec)
        const = m.build_constants(cfg)
        psi = jax.random.normal(jax.random.PRNGKey(3),
                                (cfg.nl, cfg.N, cfg.N), jnp.float64)
        psi = psi - psi.mean(axis=(-2, -1), keepdims=True)
        q = m.comp_q(cfg, const, psi)
        psi_g = ghosted(psi, BC.DIRICHLET)
        zeta = laplacian_g(psi_g, cfg.delta)
        zeta_g = m._ghost_deriv(cfg, zeta, psi_g)
        dq, _ = m.rhs(cfg, const, q, psi, psi_g, zeta, zeta_g, None)
        dqs[ec] = np.asarray(dq)
    np.testing.assert_allclose(dqs[True], dqs[False], rtol=0, atol=1e-12
                               * np.abs(dqs[False]).max())
