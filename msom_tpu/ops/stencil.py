"""Core horizontal stencil operators.

All operators take *padded* arrays (..., ny+2, nx+2) produced by
msom_tpu.ops.bc.pad and return interior arrays (..., ny, nx). They are pure
jnp slicing/arithmetic: XLA fuses the whole RHS into a handful of loops, and
under sharding the pads become halo exchanges.

Index convention: Basilisk `f[a, b]` (a = x-offset, b = y-offset) is
`shift(fp, b, a)` here.
"""

from __future__ import annotations

import jax.numpy as jnp


def shift(ap: jnp.ndarray, dj: int, di: int) -> jnp.ndarray:
    """Interior view of a 1-ghost padded array, offset by (dj, di) in (y, x)."""
    ny = ap.shape[-2] - 2
    nx = ap.shape[-1] - 2
    return ap[..., 1 + dj:1 + dj + ny, 1 + di:1 + di + nx]


def laplacian(ap: jnp.ndarray, delta: float) -> jnp.ndarray:
    """5-point Laplacian (laplacian macro, /root/reference/msqg/qg.h:169)."""
    return (shift(ap, 0, 1) + shift(ap, 0, -1) + shift(ap, 1, 0) + shift(ap, -1, 0)
            - 4.0 * shift(ap, 0, 0)) / (delta * delta)


def arakawa_mjac(pp: jnp.ndarray, qp: jnp.ndarray, delta: float) -> jnp.ndarray:
    """12-point Arakawa Jacobian returning -J(p, q) (energy- and enstrophy-
    conserving discretisation; jacobian macro /root/reference/msqg/qg.h:252-262).

    Both inputs are padded arrays. The sign matches the reference macro, which
    is applied directly as the advection tendency (dq/dt += -J(psi, q))."""
    def q(a, b):
        return shift(qp, b, a)

    def p(a, b):
        return shift(pp, b, a)

    j = ((q(1, 0) - q(-1, 0)) * (p(0, 1) - p(0, -1))
         + (q(0, -1) - q(0, 1)) * (p(1, 0) - p(-1, 0))
         + q(1, 0) * (p(1, 1) - p(1, -1))
         - q(-1, 0) * (p(-1, 1) - p(-1, -1))
         - q(0, 1) * (p(1, 1) - p(-1, 1))
         + q(0, -1) * (p(1, -1) - p(-1, -1))
         + p(0, 1) * (q(1, 1) - q(-1, 1))
         - p(0, -1) * (q(1, -1) - q(-1, -1))
         - p(1, 0) * (q(1, 1) - q(1, -1))
         + p(-1, 0) * (q(-1, 1) - q(-1, -1)))
    return j / (12.0 * delta * delta)


def beta_effect(pp: jnp.ndarray, beta: float, delta: float) -> jnp.ndarray:
    """-beta * v = beta*(p[-1] - p[1])/(2 Delta) applied on the RHS
    (/root/reference/msqg/qg.h:269)."""
    return beta * (shift(pp, 0, -1) - shift(pp, 0, 1)) / (2.0 * delta)


def face_velocities(pp: jnp.ndarray, delta: float):
    """Face-centered geostrophic velocities from a padded streamfunction.

    Mirrors comp_vel (/root/reference/msqg/qg.h:275-283): on x-faces
    u = -d(psi)/dy averaged over the two adjacent cells, on y-faces
    v = +d(psi)/dx. Returns (ufx, ufy) with shapes (..., ny, nx+1) and
    (..., ny+1, nx) — all faces including the domain-boundary ones, which use
    ghost values (as Basilisk foreach_face does).
    """
    # x-faces: face i sits between padded columns i and i+1 (i = 0..nx)
    ufx = -0.25 * ((pp[..., 2:, 1:] - pp[..., :-2, 1:])
                   + (pp[..., 2:, :-1] - pp[..., :-2, :-1])) / delta
    # y-faces: face j sits between padded rows j and j+1 (j = 0..ny)
    ufy = 0.25 * ((pp[..., 1:, 2:] - pp[..., 1:, :-2])
                  + (pp[..., :-1, 2:] - pp[..., :-1, :-2])) / delta
    return ufx, ufy
