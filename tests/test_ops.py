"""Unit tests: core ops vs independent NumPy references + discrete
conservation properties of the Arakawa Jacobian (the reference's correctness
oracle — it conserves energy and enstrophy by construction)."""

import numpy as np
import pytest

import jax.numpy as jnp

from msom_tpu.ops import bc as bcmod
from msom_tpu.ops import stencil, stretch, tridiag
from tests import reference_numpy as ref

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("bc", ["dirichlet", "neumann", "periodic"])
def test_pad_matches_reference(bc):
    a = RNG.standard_normal((3, 8, 8))
    got = np.asarray(bcmod.pad(jnp.asarray(a), bcmod.BC(bc)))
    want = ref.pad_ref(a, bc)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_pad_dirichlet_corner_sign():
    # corner ghost = +interior corner (two sign flips, x-then-y application)
    a = np.arange(16.0).reshape(4, 4)
    p = np.asarray(bcmod.pad(jnp.asarray(a), bcmod.BC.DIRICHLET))
    assert p[0, 0] == a[0, 0]
    assert p[-1, -1] == a[-1, -1]
    assert p[0, 1] == -a[0, 0]


@pytest.mark.parametrize("bc", ["dirichlet", "periodic"])
def test_laplacian(bc):
    a = RNG.standard_normal((2, 16, 16))
    ap = bcmod.pad(jnp.asarray(a), bcmod.BC(bc))
    got = np.asarray(stencil.laplacian(ap, 0.5))
    want = ref.laplacian_ref(np.asarray(ap), 0.5)
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-12)


def test_arakawa_matches_reference():
    p = RNG.standard_normal((16, 16))
    q = RNG.standard_normal((16, 16))
    pp = ref.pad_ref(p, "dirichlet")
    qp = ref.pad_ref(q, "dirichlet")
    got = np.asarray(stencil.arakawa_mjac(jnp.asarray(pp), jnp.asarray(qp), 0.3))
    want = ref.arakawa_ref(pp, qp, 0.3)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_arakawa_conservation_periodic():
    """Discrete integral constraints on a periodic domain:
    sum J = 0, sum p*J(p,q) = 0 (energy), sum q*J(p,q) = 0 (enstrophy)."""
    n = 32
    p = RNG.standard_normal((n, n))
    q = RNG.standard_normal((n, n))
    pp = bcmod.pad(jnp.asarray(p), bcmod.BC.PERIODIC)
    qp = bcmod.pad(jnp.asarray(q), bcmod.BC.PERIODIC)
    j = np.asarray(stencil.arakawa_mjac(pp, qp, 1.0))
    scale = np.abs(j).sum()
    assert abs(j.sum()) < 1e-10 * scale
    assert abs((p * j).sum()) < 1e-10 * scale
    assert abs((q * j).sum()) < 1e-10 * scale


def test_arakawa_antisymmetry():
    n = 16
    p = RNG.standard_normal((n, n))
    q = RNG.standard_normal((n, n))
    pp = bcmod.pad(jnp.asarray(p), bcmod.BC.PERIODIC)
    qp = bcmod.pad(jnp.asarray(q), bcmod.BC.PERIODIC)
    j1 = np.asarray(stencil.arakawa_mjac(pp, qp, 1.0))
    j2 = np.asarray(stencil.arakawa_mjac(qp, pp, 1.0))
    np.testing.assert_allclose(j1, -j2, atol=1e-12)


def test_stretch_matches_reference():
    nl, n = 4, 8
    a = RNG.standard_normal((nl, n, n))
    s = RNG.standard_normal((nl - 1, n, n)) ** 2
    dh = [0.06, 0.14, 0.3, 0.5]
    dhc, idh0, idh1 = stretch.layer_metrics(dh)
    dhc_r, idh0_r, idh1_r = ref.layer_metrics_ref(dh)
    np.testing.assert_allclose(idh0, idh0_r)
    np.testing.assert_allclose(idh1, idh1_r)
    got = np.asarray(stretch.stretch(jnp.asarray(a), jnp.asarray(s), idh0, idh1))
    want = ref.stretch_ref(a, s, idh0_r, idh1_r)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_stretch_single_layer_zero():
    a = RNG.standard_normal((1, 8, 8))
    got = stretch.stretch(jnp.asarray(a), jnp.zeros((0, 8, 8)),
                          np.zeros(1), np.zeros(1))
    assert np.all(np.asarray(got) == 0)


@pytest.mark.parametrize("nl", [1, 2, 3, 5])
def test_thomas(nl):
    shp = (nl, 6, 7)
    t0 = RNG.standard_normal(shp) * 0.3
    t2 = RNG.standard_normal(shp) * 0.3
    t1 = 2.0 + np.abs(RNG.standard_normal(shp))  # diagonally dominant
    t0[0] = 0.0
    t2[-1] = 0.0
    rhs = RNG.standard_normal(shp)
    got = np.asarray(tridiag.thomas(*map(jnp.asarray, (t0, t1, t2, rhs))))
    want = ref.thomas_ref(t0, t1, t2, rhs)
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)
    # verify it actually solves the system
    lhs = t1 * got
    lhs[1:] += t0[1:] * got[:-1]
    lhs[:-1] += t2[:-1] * got[1:]
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10, atol=1e-10)


def test_face_velocities_uniform_flow():
    """psi = -U*y + V*x gives u = U, v = V everywhere (interior faces)."""
    n = 8
    delta = 1.0 / n
    x = (np.arange(n) + 0.5) * delta
    X, Y = np.meshgrid(x, x, indexing="xy")
    U, V = 1.7, -0.6
    psi = -U * Y + V * X
    pp = bcmod.pad(jnp.asarray(psi), bcmod.BC.NEUMANN)
    ufx, ufy = stencil.face_velocities(pp, delta)
    # interior faces only (boundary faces see ghost values)
    np.testing.assert_allclose(np.asarray(ufx)[1:-1, 1:-1], U, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ufy)[1:-1, 1:-1], V, atol=1e-12)


def test_slip_pad_free_slip_is_dirichlet():
    z = RNG.standard_normal((8, 8))
    p = RNG.standard_normal((10, 10))
    got = bcmod.pad_zeta_slip(jnp.asarray(z), jnp.asarray(p), 0.0, 0.1)
    want = ref.pad_ref(z, "dirichlet")
    np.testing.assert_allclose(np.asarray(got), want)


def test_slip_pad_partial():
    delta, sbc = 0.25, 3.0
    z = RNG.standard_normal((8, 8))
    psi = RNG.standard_normal((8, 8))
    pp = np.asarray(bcmod.pad(jnp.asarray(psi), bcmod.BC.DIRICHLET))
    got = np.asarray(bcmod.pad_zeta_slip(jnp.asarray(z), jnp.asarray(pp), sbc, delta))
    c = sbc / ((0.5 * sbc + 1) * delta**2)
    # left edge, row j: ghost = c*(psi_interior - psi_ghost)
    for j in range(8):
        want = c * (pp[j + 1, 1] - pp[j + 1, 0])
        np.testing.assert_allclose(got[j + 1, 0], want)
    # corners keep the dirichlet fill
    assert got[0, 0] == ref.pad_ref(z, "dirichlet")[0, 0]
