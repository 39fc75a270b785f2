"""Pallas multigrid kernels vs the XLA lowering (interpret mode on CPU).

The kernels must be bit-compatible (up to f.p. associativity) with the
reference-semantics XLA path of mg._relax_layered / mg._residual_layered for
every boundary condition they claim to support, across layer counts and tile
boundaries (the redundant-halo update is the risky part)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msom_tpu.ops import tridiag
from msom_tpu.ops.bc import BC
from msom_tpu.ops.ghost import ghosted, neighbor_sum
from msom_tpu.solvers import mg, pallas_mg


def _setup(nl, n, seed=0, lam_mode=False):
    rng = np.random.default_rng(seed)
    L0 = 80.0
    depth = int(np.log2(n))
    if lam_mode:
        sprof = None
        s = None
        lamp = -rng.uniform(0.0, 5.0, (nl, n))
        lam = jnp.asarray(np.broadcast_to(lamp[:, :, None], (nl, n, n)))
        idh0 = np.zeros(nl)
        idh1 = np.zeros(nl)
    else:
        sprof = rng.uniform(0.5, 2.0, (nl - 1, n)) if nl > 1 else None
        s = None if nl == 1 else jnp.asarray(
            np.broadcast_to(sprof[:, :, None], (nl - 1, n, n)))
        lamp, lam = None, None
        idh0 = np.r_[0.0, rng.uniform(1, 3, nl - 1)]
        idh1 = np.r_[rng.uniform(1, 3, nl - 1), 0.0]
    levels = mg._make_levels(nl, depth, L0, s, idh0, idh1, lam, jnp.float64)
    lvl = levels[0]
    da = jnp.asarray(rng.standard_normal((nl, n, n)))
    res = jnp.asarray(rng.standard_normal((nl, n, n)))
    return lvl, da, res, idh0, idh1, sprof, lamp, L0 / n


@pytest.mark.parametrize("nl,n", [(1, 64), (3, 64), (4, 128), (2, 256)])
@pytest.mark.parametrize("bc,sign", [(BC.DIRICHLET, -1.0), (BC.NEUMANN, 1.0)])
def test_rb_sweep_matches_xla(nl, n, bc, sign):
    lvl, da, res, idh0, idh1, sprof, lamp, delta = _setup(nl, n)
    d2 = delta * delta

    def one_color(a, mask):
        rhs = -d2 * res + neighbor_sum(ghosted(a, bc))
        x = tridiag.solve_factored(lvl.cp, lvl.im, lvl.t0, rhs)
        return jnp.where(mask, x, a)

    ref = one_color(one_color(da, lvl.red), ~lvl.red)
    assert lvl.sw is not None  # y-profile coefficients detected
    out = pallas_mg.rb_line_sweep(da, res, lvl.sw, d2=d2, sign_x=sign,
                                  sign_y=sign, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


@pytest.mark.parametrize("nl,n", [(1, 64), (4, 128)])
@pytest.mark.parametrize("bc,sign", [(BC.DIRICHLET, -1.0), (BC.NEUMANN, 1.0)])
def test_residual_matches_xla(nl, n, bc, sign):
    lvl, da, res, idh0, idh1, sprof, lamp, delta = _setup(nl, n)
    r_ref, m_ref = (res - mg.laplacian_g(mg.ghosted(da, bc), delta)
                    if False else mg._residual_layered(da, res, lvl, bc,
                                                       idh0, idh1))
    assert lvl.rp is not None
    r_out, m_out = pallas_mg.residual_norm(
        da, res, lvl.rp, delta=delta, idh0=idh0, idh1=idh1,
        sign_x=sign, sign_y=sign, interpret=True)
    np.testing.assert_allclose(np.asarray(r_out), np.asarray(r_ref),
                               atol=1e-12)
    np.testing.assert_allclose(float(m_out), float(m_ref), rtol=1e-12)


def test_helmholtz_lam_path():
    """Modal-inversion shape: no vertical coupling, per-mode lam (iBu)."""
    lvl, da, res, idh0, idh1, _, lamp, delta = _setup(4, 128, lam_mode=True)
    bc = BC.DIRICHLET
    d2 = delta * delta

    def one_color(a, mask):
        rhs = -d2 * res + neighbor_sum(ghosted(a, bc))
        x = tridiag.solve_factored(lvl.cp, lvl.im, lvl.t0, rhs)
        return jnp.where(mask, x, a)

    ref = one_color(one_color(da, lvl.red), ~lvl.red)
    out = pallas_mg.rb_line_sweep(da, res, lvl.sw, d2=d2, sign_x=-1.0,
                                  sign_y=-1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)
    r_ref, m_ref = mg._residual_layered(da, res, lvl, bc, idh0, idh1)
    r_out, m_out = pallas_mg.residual_norm(
        da, res, lvl.rp, delta=delta, idh0=idh0, idh1=idh1,
        sign_x=-1.0, sign_y=-1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(r_out), np.asarray(r_ref),
                               atol=1e-12)


def test_full_field_coefficients_fall_back():
    """x-varying stretching must NOT produce Pallas profiles."""
    rng = np.random.default_rng(3)
    nl, n = 3, 64
    s = jnp.asarray(rng.uniform(0.5, 2.0, (nl - 1, n, n)))
    levels = mg._make_levels(nl, 6, 80.0, s, np.r_[0.0, 1.0, 1.0],
                             np.r_[1.0, 1.0, 0.0], None, jnp.float64)
    assert levels[0].sw is None and levels[0].rp is None


def test_solve_layered_end_to_end_interpret(monkeypatch):
    """Whole multigrid solve routed through the Pallas kernels (interpret)
    converges to the same solution as the XLA path."""
    monkeypatch.setenv("MSOM_PALLAS", "interpret")
    rng = np.random.default_rng(1)
    nl, n = 3, 64
    sprof = rng.uniform(0.5, 2.0, (nl - 1, n))
    s = jnp.asarray(np.broadcast_to(sprof[:, :, None], (nl - 1, n, n)))
    idh0 = np.r_[0.0, 2.0, 2.0]
    idh1 = np.r_[1.5, 1.5, 0.0]
    b = jnp.asarray(rng.standard_normal((nl, n, n)))
    a0 = jnp.zeros_like(b)
    a_p, st_p = mg.solve_layered(a0, b, L0=80.0, s=s, idh0=idh0, idh1=idh1,
                                 tolerance=1e-8)
    monkeypatch.setenv("MSOM_PALLAS", "0")
    a_x, st_x = mg.solve_layered(a0, b, L0=80.0, s=s, idh0=idh0, idh1=idh1,
                                 tolerance=1e-8)
    assert float(st_p.resa) < 1e-8
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_x), atol=1e-7)


def test_restrict_prolong_regressions():
    """The pooling restrict and repeat-roll prolong must equal the reference
    strided/stack formulations exactly."""
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((3, 64, 64)))
    ref = 0.25 * (a[..., ::2, ::2] + a[..., 1::2, ::2]
                  + a[..., ::2, 1::2] + a[..., 1::2, 1::2])
    np.testing.assert_allclose(np.asarray(mg.restrict_cell(a)),
                               np.asarray(ref), atol=1e-14)
    c = jnp.asarray(rng.standard_normal((3, 32, 32)))
    for bc in (BC.DIRICHLET, BC.NEUMANN, BC.PERIODIC):
        P = mg.pad(c, bc)
        cc = P[..., 1:-1, 1:-1]
        w, e = P[..., 1:-1, :-2], P[..., 1:-1, 2:]
        s_, n_ = P[..., :-2, 1:-1], P[..., 2:, 1:-1]
        sw, se = P[..., :-2, :-2], P[..., :-2, 2:]
        nw, ne = P[..., 2:, :-2], P[..., 2:, 2:]
        f00 = 9 * cc + 3 * w + 3 * s_ + sw
        f01 = 9 * cc + 3 * e + 3 * s_ + se
        f10 = 9 * cc + 3 * w + 3 * n_ + nw
        f11 = 9 * cc + 3 * e + 3 * n_ + ne
        ref = jnp.stack([jnp.stack([f00, f01], -1),
                         jnp.stack([f10, f11], -1)], -3)
        ref = (ref / 16.0).reshape(3, 64, 64)
        np.testing.assert_allclose(np.asarray(mg.prolong_bilinear(c, bc)),
                                   np.asarray(ref), atol=1e-14,
                                   err_msg=str(bc))
