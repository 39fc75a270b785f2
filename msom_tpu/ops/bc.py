"""Functional boundary conditions (ghost-cell padding).

The reference mutates ghost cells via Basilisk `boundary()` with registered
per-field BCs. Three conventions are used by the QG family:

* Dirichlet-0 at a boundary located half a cell outside the domain:
  ghost = -interior (streamfunction/vorticity walls,
  /root/reference/msqg/layer.h:17-27).
* Default symmetry (homogeneous Neumann): ghost = interior (coefficient
  fields such as the stretching matrix, created with bc_type+1,
  /root/reference/msqg/qg.h:858-859).
* Periodic wrap (sbc == -1 doubly-periodic mode,
  /root/reference/msqg/qg.h:842-846).

Plus the partial-slip vorticity relation applied on top of Dirichlet for
sbc > 0: zeta_ghost = sbc/((0.5*sbc+1)*Delta^2) * (psi_in - psi_ghost)
(/root/reference/msqg/qg.h:185-198).

Here a BC is applied by *returning a padded copy* of the field: interior
(..., ny, nx) -> padded (..., ny+2, nx+2). Corners are filled by sequential
application (x first, then y on the x-padded array), which reproduces
Basilisk's dimension-by-dimension boundary traversal: e.g. for Dirichlet the
corner ghost equals +interior corner value (two sign flips).

Everything is pure jnp — under jit the pads fuse with downstream stencil
slices, and under GSPMD sharding they lower to halo exchanges.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class BC(str, enum.Enum):
    DIRICHLET = "dirichlet"  # value 0 half-a-cell outside: ghost = -interior
    NEUMANN = "neumann"      # zero normal gradient: ghost = interior
    PERIODIC = "periodic"    # wrap


def _pad_axis(a: jnp.ndarray, bc: BC, axis: int) -> jnp.ndarray:
    lo = jnp.take(a, jnp.array([0]), axis=axis)
    hi = jnp.take(a, jnp.array([a.shape[axis] - 1]), axis=axis)
    if bc is BC.PERIODIC:
        left, right = hi, lo
    elif bc is BC.DIRICHLET:
        left, right = -lo, -hi
    elif bc is BC.NEUMANN:
        left, right = lo, hi
    else:
        raise ValueError(bc)
    return jnp.concatenate([left, a, right], axis=axis)


def pad(a: jnp.ndarray, bc: BC) -> jnp.ndarray:
    """Pad the last two axes by one ghost cell each side under boundary
    condition `bc`. x (axis -1) first, then y (axis -2), matching Basilisk's
    per-dimension boundary application order for corner ghosts."""
    return _pad_axis(_pad_axis(a, bc, -1), bc, -2)


def pad_zeta_slip(zeta: jnp.ndarray, psi_pad: jnp.ndarray, sbc: float,
                  delta: float) -> jnp.ndarray:
    """Ghost pad for a Laplacian-derived field with the partial-slip wall law.

    Mirrors the sbc > 0 branch of comp_del2 (/root/reference/msqg/qg.h:185-198):
    after the default Dirichlet fill, NON-corner edge ghosts are overwritten
    with ghost = c * (psi_interior - psi_ghost), c = sbc/((0.5*sbc+1)*Delta^2).
    `psi_pad` is the already-padded field the Laplacian was taken of.

    sbc is a static Python float: sbc <= 0 returns the plain Dirichlet pad
    (free-slip, zeta = 0 on the wall). sbc == -1 (periodic) must be handled by
    the caller with BC.PERIODIC instead.
    """
    zp = pad(zeta, BC.DIRICHLET)
    if sbc <= 0:
        return zp
    c = sbc / ((0.5 * sbc + 1.0) * delta * delta)
    # left edge (x ghost column 0), interior rows only
    zp = zp.at[..., 1:-1, 0].set(c * (psi_pad[..., 1:-1, 1] - psi_pad[..., 1:-1, 0]))
    # right edge
    zp = zp.at[..., 1:-1, -1].set(c * (psi_pad[..., 1:-1, -2] - psi_pad[..., 1:-1, -1]))
    # bottom edge (y ghost row 0)
    zp = zp.at[..., 0, 1:-1].set(c * (psi_pad[..., 1, 1:-1] - psi_pad[..., 0, 1:-1]))
    # top edge
    zp = zp.at[..., -1, 1:-1].set(c * (psi_pad[..., -2, 1:-1] - psi_pad[..., -1, 1:-1]))
    return zp
