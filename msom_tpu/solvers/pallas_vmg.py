"""Fused Pallas TPU kernel for the MASKED nodal (vertex) multigrid sweeps.

One red-black masked vertical-line relaxation sweep (both colors) of
solvers.vmg.relax_v in a single HBM pass — the vertex counterpart of
pallas_mg.rb_line_sweep for the masked qg-node inversion
(/root/reference/qg-node/qg_baroclinic_ms.h:228-293 relax_baroclinic with
the mask machinery). Differences from the cell-centered sweep kernel:

* arrays are (nl, N+1, N+1) vertex grids — the ragged odd row count rides
  Pallas grid padding (invalid rows guarded by the global-row mask), as in
  models/pallas_node_rhs.py;
* the Thomas factors and the mask are FULL 2-D FIELDS (mask-dependent, not
  y-profiles): they stream as PRE-TILED (ntiles, ., T+2, nx) blocks built
  once per level at setup (rows [iT-1, iT+T+1) edge-clamped), so the
  kernel reads them like profiles;
* no wall ghost substitution: boundary nodes live IN the array and the
  mask zeroes them (x-neighbors beyond the array edge enter as zeros,
  matching relax_v's zero-padded neighbor sum).

Redundant-rim scheme as in pallas_mg._sweep_kernel: each tile updates
rows [iT-1, iT+T+1) per color so the second color sees correctly-updated
neighbors without cross-tile communication.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msom_tpu.solvers.pallas_mg import _thomas_profile, default_interpret


@dataclasses.dataclass(frozen=True)
class VSweepData:
    """Pre-tiled per-level kernel data: factors + mask with a 1-row halo,
    stored TILE-CONCATENATED along the row axis — (C, ntiles*(T+2), nx) —
    so the kernel reads plain 3-D (C, T+2, nx) blocks (4-D full-width
    blocks abort the Mosaic compiler)."""
    t0: jnp.ndarray    # (nl, ntiles*(T+2), nx)
    cp: jnp.ndarray
    im: jnp.ndarray
    mask: jnp.ndarray  # (1, ntiles*(T+2), nx)
    T: int


jax.tree_util.register_dataclass(
    VSweepData, data_fields=["t0", "cp", "im", "mask"], meta_fields=["T"])


def _tile_field(f: np.ndarray, T: int) -> np.ndarray:
    """(C, n, nx) -> (C, ntiles*(T+8), nx): rows [iT-1, iT+T+7) clamped,
    concatenated per tile. The tile height is T+8 (multiple of 8 — a
    Mosaic block-shape requirement), of which the kernel consumes the
    first T+2 rows."""
    C, n, nx = f.shape
    ntiles = -(-n // T)
    rows = np.arange(-1, T + 7)
    out = np.empty((C, ntiles * (T + 8), nx), f.dtype)
    for i in range(ntiles):
        out[:, i * (T + 8):(i + 1) * (T + 8), :] = \
            f[:, np.clip(i * T + rows, 0, n - 1), :]
    return out


def pick_tile(n: int, nl: int, itemsize: int) -> int | None:
    """y-tile: VMEM budget ~12 field-slabs of (nl, T+4, nx)."""
    if n < 65:
        return None
    for t in (64, 32, 16, 8):
        if 12.0 * max(nl, 2) * (t + 4) * n * itemsize <= 14 * 1024 * 1024:
            return t
    return None


def build_vsweep(t0, cp, im, mask, dtype) -> VSweepData | None:
    """Pre-tile one level's factors; None when no feasible tile."""
    t0 = np.asarray(t0)
    nl, n, nx = t0.shape
    T = pick_tile(n, nl, jnp.dtype(dtype).itemsize)
    if T is None:
        return None
    return VSweepData(
        t0=jnp.asarray(_tile_field(t0, T), dtype),
        cp=jnp.asarray(_tile_field(np.asarray(cp), T), dtype),
        im=jnp.asarray(_tile_field(np.asarray(im), T), dtype),
        mask=jnp.asarray(_tile_field(np.asarray(mask)[None], T), dtype),
        T=T)


def _shift_x0(a, di: int):
    """x-neighbor with ZERO ghosts (vertex arrays carry walls in-array)."""
    nx = a.shape[-1]
    out = jnp.roll(a, -di, axis=2)
    col = jax.lax.broadcasted_iota(jnp.int32, a.shape[-2:], 1)
    edge = nx - 1 if di > 0 else 0
    return jnp.where(col[None] == edge, 0.0, out)


def _vsweep_kernel(da_c, da_u, da_d, res_c, res_u, res_d, t0_r, cp_r, im_r,
                   mask_r, out_ref, *, d2, T, nglob):
    i = pl.program_id(0)
    ext = jnp.concatenate([da_u[:, 6:8, :], da_c[:], da_d[:, 0:2, :]],
                          axis=1)                       # rows [iT-2, iT+T+2)
    rext = jnp.concatenate([res_u[:, 7:8, :], res_c[:], res_d[:, 0:1, :]],
                           axis=1)                      # rows [iT-1, iT+T+1)
    nx0 = ext.shape[-1]
    # zero the grid-padding garbage rows (interpret mode pads with NaN;
    # NaN * mask-0 would otherwise poison valid ring columns via nsum).
    # 3-D iotas, NOT 2-D [None]-broadcast conditions: a boolean where with
    # a broadcast condition at this (rows, 257)-unaligned shape SIGABRTs
    # the Mosaic compiler (bisected on hardware, r5).
    erow3 = jax.lax.broadcasted_iota(jnp.int32, ext.shape, 1) + i * T - 2
    ext = jnp.where((erow3 >= 0) & (erow3 < nglob), ext, 0.0)
    rrow3 = jax.lax.broadcasted_iota(jnp.int32, rext.shape, 1) + i * T - 1
    rext = jnp.where((rrow3 >= 0) & (rrow3 < nglob), rext, 0.0)
    t0 = t0_r[:, :T + 2, :]
    cp = cp_r[:, :T + 2, :]
    im = im_r[:, :T + 2, :]
    mask = mask_r[0, :T + 2, :]                         # (T+2, nx)
    csh = (t0.shape[0],) + rext.shape[-2:]              # (nl, T+2, nx)
    rowu3 = jax.lax.broadcasted_iota(jnp.int32, csh, 1) + i * T - 1
    colu3 = jax.lax.broadcasted_iota(jnp.int32, csh, 2)
    valid3 = (rowu3 >= 0) & (rowu3 < nglob)

    for color in (0, 1):                                # red, then black
        cur = ext[:, 1:-1, :]
        # E + W + N + S in relax_v's association order (bitwise parity)
        nsum = (_shift_x0(cur, 1) + _shift_x0(cur, -1)
                + ext[:, 2:, :] + ext[:, :-2, :])
        rhs = (-d2 * rext + nsum) * mask[None]
        x = _thomas_profile(t0, cp, im, rhs) * mask[None]
        upd3 = (((rowu3 + colu3) & 1) == color) & valid3
        newcur = jnp.where(upd3, x, cur)
        ext = jnp.concatenate([ext[:, 0:1, :], newcur, ext[:, -1:, :]],
                              axis=1)
    out_ref[:] = ext[:, 2:T + 2, :]


def vrb_sweep(da: jnp.ndarray, res: jnp.ndarray, sw: VSweepData, *,
              d2: float, interpret: bool | None = None) -> jnp.ndarray:
    """One full red-black masked sweep — identical math to one
    vmg.relax_v body iteration (red then black one_color), one HBM pass."""
    if interpret is None:
        interpret = default_interpret()
    nl, n, nx = da.shape
    T = sw.T
    ntiles = -(-n // T)
    nbc = -(-n // 8)          # ceil: 8-row halo blocks incl. ragged tail
    tb = T // 8

    def specs3(c):
        center = pl.BlockSpec((c, T, nx), lambda i: (0, i, 0))
        up = pl.BlockSpec((c, 8, nx),
                          lambda i: (0, jnp.maximum(i * tb - 1, 0), 0))
        down = pl.BlockSpec((c, 8, nx),
                            lambda i: (0, jnp.minimum((i + 1) * tb,
                                                      nbc - 1), 0))
        return [center, up, down]

    def tspec(carr):
        return pl.BlockSpec((carr.shape[0], T + 8, nx),
                            lambda i: (0, i, 0))

    kern = functools.partial(_vsweep_kernel, d2=float(d2), T=T, nglob=n)
    return pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=specs3(nl) + specs3(nl)
        + [tspec(sw.t0), tspec(sw.cp), tspec(sw.im), tspec(sw.mask)],
        out_specs=pl.BlockSpec((nl, T, nx), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct(da.shape, da.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(da, da, da, res, res, res, sw.t0, sw.cp, sw.im, sw.mask)
