"""Explicit shard_map halo exchange — the TPU-native `boundary()`.

The reference's MPI layer exchanges 1-cell halos after every stencil update
(Basilisk boundary(), SURVEY.md §2.5). Under GSPMD the same happens
implicitly; this module is the EXPLICIT path: inside a `shard_map`, a local
(nl, ny_loc, nx_loc) tile is wrapped into the standard ops.ghost.Ghosted
structure whose ghost vectors come from `lax.ppermute` neighbor transfers
over the ('y', 'x') device mesh (ICI), with the physical boundary rules
(Dirichlet/Neumann/periodic, ops.bc semantics) applied on the devices that
own a domain wall. Every existing operator (laplacian_g, arakawa_mjac_g,
neighbor_sum, max_face_speed, ...) then works unchanged on the local shard.

Corner ghosts are exact: the ghost ROWS are exchanged after the ghost
columns and include them, so a corner value travels via the x-neighbor —
the same x-then-y composition as ops.bc.pad (diagonal neighbors never need
a dedicated diagonal transfer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from msom_tpu.ops.bc import BC
from msom_tpu.ops.ghost import Ghosted


def _shift_from_prev(x, axis_name: str, wrap: bool):
    """Each device receives from its LOWER neighbor (index-1); device 0
    receives from the last device if wrap (periodic)."""
    n = lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)] if wrap else \
        [(i, i + 1) for i in range(n - 1)]
    return lax.ppermute(x, axis_name, perm)


def _shift_from_next(x, axis_name: str, wrap: bool):
    n = lax.axis_size(axis_name)
    perm = [(i, (i - 1) % n) for i in range(n)] if wrap else \
        [(i + 1, i) for i in range(n - 1)]
    return lax.ppermute(x, axis_name, perm)


def ghosted_sharded(a: jnp.ndarray, bc: BC, ym: str = "y",
                    xm: str = "x") -> Ghosted:
    """Ghosted view of a local shard with neighbor-device halos.

    Matches ops.ghost.ghosted of the corresponding global array exactly:
    interior tile edges get the adjacent device's edge data, physical walls
    get the BC rule. axis -2 index grows with mesh axis `ym`, axis -1 with
    `xm`."""
    wrap = bc is BC.PERIODIC
    sign = 1.0 if bc is BC.NEUMANN else -1.0
    yi = lax.axis_index(ym)
    xi = lax.axis_index(xm)
    ny = lax.axis_size(ym)
    nx = lax.axis_size(xm)

    # ghost columns: receive the neighbor's edge column
    left_recv = _shift_from_prev(a[..., :, -1], xm, wrap)   # from x-1
    right_recv = _shift_from_next(a[..., :, 0], xm, wrap)   # from x+1
    if wrap:
        gl, gr = left_recv, right_recv
    else:
        gl = jnp.where(xi == 0, sign * a[..., :, 0], left_recv)
        gr = jnp.where(xi == nx - 1, sign * a[..., :, -1], right_recv)

    # ghost rows INCLUDING corners: exchange the x-extended edge rows
    def ext_row(row, gl_e, gr_e):
        return jnp.concatenate([gl_e[..., None], row, gr_e[..., None]],
                               axis=-1)

    top_ext = ext_row(a[..., -1, :], gl[..., -1], gr[..., -1])
    bot_ext = ext_row(a[..., 0, :], gl[..., 0], gr[..., 0])
    gb_recv = _shift_from_prev(top_ext, ym, wrap)   # from y-1: its top row
    gt_recv = _shift_from_next(bot_ext, ym, wrap)   # from y+1: its bottom row
    if wrap:
        gb, gt = gb_recv, gt_recv
    else:
        gb = jnp.where(yi == 0, sign * bot_ext, gb_recv)
        gt = jnp.where(yi == ny - 1, sign * top_ext, gt_recv)
    return Ghosted(a, gl, gr, gb, gt)


def ghosted_slip_sharded(zeta: jnp.ndarray, psi: Ghosted, sbc: float,
                         delta: float, ym: str = "y",
                         xm: str = "x") -> Ghosted:
    """Sharded partial-slip ghosts for a Laplacian-derived field
    (ops.ghost.ghosted_slip): interior tile edges exchange data; physical
    walls take ghost = c*(psi_in - psi_ghost) on edges, Dirichlet corners."""
    if sbc <= 0:
        return ghosted_sharded(zeta, BC.DIRICHLET, ym, xm)
    base = ghosted_sharded(zeta, BC.DIRICHLET, ym, xm)
    yi, xi = lax.axis_index(ym), lax.axis_index(xm)
    ny, nx = lax.axis_size(ym), lax.axis_size(xm)
    c = sbc / ((0.5 * sbc + 1.0) * delta * delta)
    p = psi.a
    gl = jnp.where(xi == 0, c * (p[..., :, 0] - psi.gl), base.gl)
    gr = jnp.where(xi == nx - 1, c * (p[..., :, -1] - psi.gr), base.gr)
    row_b = c * (p[..., 0, :] - psi.gb[..., 1:-1])
    row_t = c * (p[..., -1, :] - psi.gt[..., 1:-1])
    gb_mid = jnp.where(yi == 0, row_b, base.gb[..., 1:-1])
    gt_mid = jnp.where(yi == ny - 1, row_t, base.gt[..., 1:-1])
    gb = jnp.concatenate([base.gb[..., :1], gb_mid, base.gb[..., -1:]], -1)
    gt = jnp.concatenate([base.gt[..., :1], gt_mid, base.gt[..., -1:]], -1)
    return Ghosted(zeta, gl, gr, gb, gt)


def ext_rows8(a: jnp.ndarray, ym: str = "y",
              wrap: bool = False) -> jnp.ndarray:
    """concat([up8, a, dn8], axis=-2): the local shard extended with 8-row
    ppermute halo slabs from its y-neighbors — the input layout of the
    rows-sharded Pallas RHS kernels (models.pallas_rhs rows mode). At
    non-wrap walls the slab content is ppermute zeros (never consumed: the
    kernels' wall ghost rules key on the global row index). Requires the
    local shard to have >= 8 rows."""
    up = _shift_from_prev(a[..., -8:, :], ym, wrap)
    dn = _shift_from_next(a[..., :8, :], ym, wrap)
    return jnp.concatenate([up, a, dn], axis=-2)


def overlap_enabled() -> bool:
    """Halo/compute overlap toggle (MSOM_HALO_OVERLAP, default on).

    Read at trace time: the sharded solvers pick the overlapped stencil
    forms below when enabled."""
    import os
    return os.environ.get("MSOM_HALO_OVERLAP", "1") != "0"


def _rim_sum(bulk, a, g: Ghosted):
    """Replace the 1-cell rim of a rolled (halo-free) E+W+N+S sum with the
    ghost-corrected values, preserving the E+W+N+S association order so
    every cell is bitwise-identical to neighbor_sum(ghosted)."""
    bot = (jnp.concatenate([a[..., 0, 1:], g.gr[..., :1]], -1)
           + jnp.concatenate([g.gl[..., :1], a[..., 0, :-1]], -1)
           + a[..., 1, :] + g.gb[..., 1:-1])
    top = (jnp.concatenate([a[..., -1, 1:], g.gr[..., -1:]], -1)
           + jnp.concatenate([g.gl[..., -1:], a[..., -1, :-1]], -1)
           + g.gt[..., 1:-1] + a[..., -2, :])
    left = (a[..., 1:-1, 1] + g.gl[..., 1:-1]
            + a[..., 2:, 0] + a[..., :-2, 0])
    right = (g.gr[..., 1:-1] + a[..., 1:-1, -2]
             + a[..., 2:, -1] + a[..., :-2, -1])
    mid = jnp.concatenate([left[..., :, None], bulk[..., 1:-1, 1:-1],
                           right[..., :, None]], -1)
    return jnp.concatenate([bot[..., None, :], mid, top[..., None, :]], -2)


def neighbor_sum_overlap_g(g: Ghosted) -> jnp.ndarray:
    """E + W + N + S from an ALREADY-ISSUED halo exchange, with the
    interior computed from pure-local rolls (no data dependence on the
    transfers) and only the 1-cell rim consuming the ghost vectors — the
    reference's bulk-synchronous `boundary()` becomes independent work
    XLA's latency-hiding scheduler can run while the ICI transfers are in
    flight (SURVEY §2.5 overlap note). Bitwise-identical to
    neighbor_sum(g)."""
    a = g.a
    bulk = (jnp.roll(a, -1, -1) + jnp.roll(a, 1, -1)
            + jnp.roll(a, -1, -2) + jnp.roll(a, 1, -2))
    return _rim_sum(bulk, a, g)


def neighbor_sum_overlap(a: jnp.ndarray, bc: BC, ym: str = "y",
                         xm: str = "x") -> jnp.ndarray:
    """neighbor_sum_overlap_g of a fresh ghosted_sharded exchange."""
    return neighbor_sum_overlap_g(ghosted_sharded(a, bc, ym, xm))


def laplacian_overlap_g(g: Ghosted, delta: float) -> jnp.ndarray:
    """(E + W + N + S - 4C)/delta^2, overlapped (bitwise-identical to
    laplacian_g(g, delta))."""
    return (neighbor_sum_overlap_g(g) - 4.0 * g.a) / (delta * delta)


def laplacian_overlap(a: jnp.ndarray, bc: BC, delta: float, ym: str = "y",
                      xm: str = "x") -> jnp.ndarray:
    return laplacian_overlap_g(ghosted_sharded(a, bc, ym, xm), delta)


def pmax2(x, ym: str = "y", xm: str = "x"):
    return lax.pmax(lax.pmax(x, ym), xm)


def psum2(x, ym: str = "y", xm: str = "x"):
    return lax.psum(lax.psum(x, ym), xm)


def gather_global(a: jnp.ndarray, ym: str = "y", xm: str = "x"):
    """all_gather a (..., ny_l, nx_l) shard into the replicated global
    (..., ny, nx) array (coarse-grid strategy: levels smaller than the mesh
    are solved redundantly on every device)."""
    a = lax.all_gather(a, ym, axis=a.ndim - 2, tiled=True)
    return lax.all_gather(a, xm, axis=a.ndim - 1, tiled=True)


def local_tile(a_global: jnp.ndarray, my: int, mx: int, ym: str = "y",
               xm: str = "x"):
    """Slice this device's (..., ny/my, nx/mx) tile out of a replicated
    global array."""
    ny_l = a_global.shape[-2] // my
    nx_l = a_global.shape[-1] // mx
    yi = lax.axis_index(ym)
    xi = lax.axis_index(xm)
    zero = jnp.zeros((), yi.dtype)
    start = [zero] * (a_global.ndim - 2) + [yi * ny_l, xi * nx_l]
    size = list(a_global.shape[:-2]) + [ny_l, nx_l]
    return lax.dynamic_slice(a_global, start, size)
