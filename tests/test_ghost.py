"""The roll-based Ghosted stencil layer must agree exactly with the
pad-based reference implementation in ops.bc/ops.stencil."""

import numpy as np
import pytest

import jax.numpy as jnp

from msom_tpu.ops import bc as bcmod
from msom_tpu.ops import ghost, stencil

RNG = np.random.default_rng(41)
BCS = [bcmod.BC.DIRICHLET, bcmod.BC.NEUMANN, bcmod.BC.PERIODIC]


@pytest.mark.parametrize("bc", BCS)
def test_padded_reconstruction(bc):
    a = jnp.asarray(RNG.standard_normal((2, 8, 8)))
    g = ghost.ghosted(a, bc)
    np.testing.assert_array_equal(np.asarray(g.padded()),
                                  np.asarray(bcmod.pad(a, bc)))


@pytest.mark.parametrize("bc", BCS)
@pytest.mark.parametrize("dj,di", [(0, 1), (0, -1), (1, 0), (-1, 0),
                                   (1, 1), (1, -1), (-1, 1), (-1, -1)])
def test_shift_matches_pad(bc, dj, di):
    a = jnp.asarray(RNG.standard_normal((3, 8, 8)))
    g = ghost.ghosted(a, bc)
    want = stencil.shift(bcmod.pad(a, bc), dj, di)
    np.testing.assert_array_equal(np.asarray(g.shift(dj, di)),
                                  np.asarray(want))


@pytest.mark.parametrize("bc", BCS)
def test_laplacian_and_jacobian(bc):
    p = jnp.asarray(RNG.standard_normal((2, 16, 16)))
    q = jnp.asarray(RNG.standard_normal((2, 16, 16)))
    gp, gq = ghost.ghosted(p, bc), ghost.ghosted(q, bc)
    pp, qp = bcmod.pad(p, bc), bcmod.pad(q, bc)
    np.testing.assert_allclose(np.asarray(ghost.laplacian_g(gp, 0.3)),
                               np.asarray(stencil.laplacian(pp, 0.3)),
                               atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(ghost.arakawa_mjac_g(gp, gq, 0.3)),
        np.asarray(stencil.arakawa_mjac(pp, qp, 0.3)), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(ghost.beta_effect_g(gp, 0.5, 0.3)),
        np.asarray(stencil.beta_effect(pp, 0.5, 0.3)), atol=1e-13)


def test_slip_ghosts_match():
    delta, sbc = 0.25, 3.0
    z = jnp.asarray(RNG.standard_normal((2, 8, 8)))
    psi = jnp.asarray(RNG.standard_normal((2, 8, 8)))
    pg = ghost.ghosted(psi, bcmod.BC.DIRICHLET)
    zg = ghost.ghosted_slip(z, pg, sbc, delta)
    want = bcmod.pad_zeta_slip(z, bcmod.pad(psi, bcmod.BC.DIRICHLET), sbc,
                               delta)
    np.testing.assert_allclose(np.asarray(zg.padded()), np.asarray(want),
                               atol=1e-13)


@pytest.mark.parametrize("bc", BCS)
def test_max_face_speed(bc):
    p = jnp.asarray(RNG.standard_normal((3, 16, 16)))
    g = ghost.ghosted(p, bc)
    ufx, ufy = stencil.face_velocities(bcmod.pad(p, bc), 0.2)
    want = max(float(jnp.max(jnp.abs(ufx))), float(jnp.max(jnp.abs(ufy))))
    got = float(ghost.max_face_speed(g, 0.2))
    assert got == pytest.approx(want, rel=1e-12)
