"""Fused Pallas TPU kernels for the multigrid hot loops.

The XLA lowering of the red-black line relaxation and of the layered residual
emits ~20 unfused roll/dynamic-update-slice kernels per sweep and re-reads the
(nl, N, N) Thomas-factor fields from HBM every time (~8x off the HBM roofline,
measured 106 GB/s effective at 2048^2x4 on TPU v5e). These kernels fuse each
sweep into ONE pass over HBM:

* `rb_line_sweep` — one full red-black relaxation sweep (both colors) of the
  vertical-line smoother for lap(da)*d2 + coupling = -d2*res systems
  (the TPU replacement for the in-place Gauss-Seidel + Thomas relaxation of
  /root/reference/msqg/poisson_layer.h:48-150). The Thomas factors enter as
  y-PROFILES (the stretching strl = (Fr/Ro)^2 varies only in y,
  /root/reference/msqg/qg.h:1032-1048), so coefficient traffic is ~zero.
* `residual_norm` — fused residual res = b - lap(a) - Gamma(a) - lam*a plus
  its per-tile max-norm (poisson_layer.h:157-258 semantics).

Tiling: the grid walks y-tiles of T rows; each program reads its (nl, T, N)
block plus 8-row neighbor slabs (halo) of the SAME input via extra BlockSpecs
with clamped index maps, applies the physical ghost rules (ghost = sign *
edge, Dirichlet -1 / Neumann +1) at the domain walls in-register, and updates
with redundant computation on the one-row rim so no cross-tile communication
is needed. Boundary-condition values are identical to ops.bc.pad /
ops.ghost.ghosted.

The kernels run compiled on TPU and in interpreter mode on CPU (tests).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def enabled(dtype) -> bool:
    """Whether the multigrid should route through the Pallas kernels.

    Compiled TPU path: single-device (the GSPMD-sharded multi-chip path keeps
    the XLA lowering until the shard_map integration), f32/bf16. The
    MSOM_PALLAS env var forces: "0" off, "interpret" on with the CPU
    interpreter (for integration testing), "1" on."""
    mode = os.environ.get("MSOM_PALLAS", "")
    if mode == "0":
        return False
    if mode in ("1", "interpret"):
        return True
    return (jax.default_backend() == "tpu" and jax.device_count() == 1
            and jnp.dtype(dtype).itemsize <= 4)


def pick_tile(n: int, nl: int = 4, nx: int | None = None,
              itemsize: int = 4) -> int | None:
    """y-tile size: multiple of 8, small enough that the ~11 live
    (nl, T+4, nx)-shaped VMEM values (double-buffered ins/outs plus kernel
    temporaries, coefficient measured from Mosaic's scoped-vmem report) stay
    under the 16 MB budget."""
    if n < 64 or n % 8:
        return None
    nx = n if nx is None else nx
    budget = 14 * 1024 * 1024
    for t in (128, 64, 32, 16, 8):
        if n % t == 0 and t <= n // 2 \
                and 11 * nl * (t + 4) * nx * itemsize <= budget:
            return t
    return None


@dataclasses.dataclass(frozen=True)
class SweepProfiles:
    """Per-level y-profile Thomas factors, pre-tiled to (ntiles, nl, T+4, 1)
    so each grid program loads exactly its rows (plus the 2-row halo)."""
    t0: jnp.ndarray
    cp: jnp.ndarray
    im: jnp.ndarray
    T: int


jax.tree_util.register_dataclass(
    SweepProfiles, data_fields=["t0", "cp", "im"], meta_fields=["T"])


def _tile_profile(prof: np.ndarray, T: int, halo: int) -> np.ndarray:
    """(nl, n) y-profile -> (ntiles, nl, T + 2*halo, 1) with edge clamping
    (clamped rows sit in the invalid rim and are never used)."""
    nl, n = prof.shape
    ntiles = n // T
    rows = np.arange(-halo, T + halo)
    out = np.empty((ntiles, nl, T + 2 * halo, 1), prof.dtype)
    for i in range(ntiles):
        out[i, :, :, 0] = prof[:, np.clip(i * T + rows, 0, n - 1)]
    return out


def build_sweep_profiles(t0p: np.ndarray, cpp: np.ndarray, imp: np.ndarray,
                         n: int, dtype) -> SweepProfiles | None:
    """t0p/cpp/imp: (nl, n) y-profiles of the Thomas factors at one level."""
    T = pick_tile(n, nl=t0p.shape[0], itemsize=jnp.dtype(dtype).itemsize)
    if T is None:
        return None
    return SweepProfiles(
        t0=jnp.asarray(_tile_profile(t0p, T, 2), dtype),
        cp=jnp.asarray(_tile_profile(cpp, T, 2), dtype),
        im=jnp.asarray(_tile_profile(imp, T, 2), dtype),
        T=T)


@dataclasses.dataclass(frozen=True)
class ResidualProfiles:
    """Per-level y-profiles for the fused residual: stretching s (nl-1, n)
    and optional Helmholtz lam (nl, n), tiled with a 1-row halo."""
    s: jnp.ndarray | None
    lam: jnp.ndarray | None
    T: int


jax.tree_util.register_dataclass(
    ResidualProfiles, data_fields=["s", "lam"], meta_fields=["T"])


def build_residual_profiles(sp: np.ndarray | None, lamp: np.ndarray | None,
                            n: int, dtype, nl: int = 4) -> ResidualProfiles | None:
    T = pick_tile(n, nl=nl, itemsize=jnp.dtype(dtype).itemsize)
    if T is None:
        return None
    s = None if sp is None else jnp.asarray(_tile_profile(sp, T, 1), dtype)
    lam = None if lamp is None else jnp.asarray(_tile_profile(lamp, T, 1),
                                                dtype)
    return ResidualProfiles(s=s, lam=lam, T=T)


def _halo_specs(nl: int, T: int, n: int, nx: int):
    """center + 8-row up/down halo BlockSpecs for an (nl, n, nx) input."""
    nb = n // 8          # number of 8-row blocks
    tb = T // 8          # 8-row blocks per tile
    center = pl.BlockSpec((nl, T, nx), lambda i: (0, i, 0))
    up = pl.BlockSpec((nl, 8, nx),
                      lambda i: (0, jnp.maximum(i * tb - 1, 0), 0))
    down = pl.BlockSpec((nl, 8, nx),
                        lambda i: (0, jnp.minimum((i + 1) * tb, nb - 1), 0))
    return center, up, down


def _shift_x(a, di: int, sign_x: float, periodic_x: bool):
    """Neighbor view along the lane axis with ghost = sign_x * edge (or
    periodic wrap), matching ops.ghost.Ghosted.shift(0, di)."""
    nx = a.shape[-1]
    out = jnp.roll(a, -di, axis=2)
    if periodic_x:
        return out
    col = jax.lax.broadcasted_iota(jnp.int32, a.shape[-2:], 1)
    edge = nx - 1 if di > 0 else 0
    return jnp.where(col[None] == edge, sign_x * a, out)


def _thomas_profile(t0, cp, im, rhs):
    """Unrolled Thomas solve, (nl, R, 1) factors vs (nl, R, nx) rhs."""
    nl = rhs.shape[0]
    dp = [rhs[0] * im[0]]
    for l in range(1, nl):
        dp.append((rhs[l] - t0[l] * dp[-1]) * im[l])
    x = [dp[-1]]
    for l in range(nl - 2, -1, -1):
        x.append(dp[l] - cp[l] * x[-1])
    x.reverse()
    return jnp.stack(x, axis=0)


def _sweep_kernel(da_c, da_u, da_d, res_c, res_u, res_d, t0_r, cp_r, im_r,
                  out_ref, *, d2, sign_x, sign_y, T, nglob, periodic_x):
    i = pl.program_id(0)
    ntiles = pl.num_programs(0)
    nl = da_c.shape[0]
    # extended tile: global rows [i*T - 2, i*T + T + 2)
    ext = jnp.concatenate([da_u[:, 6:8, :], da_c[:], da_d[:, 0:2, :]], axis=1)
    rext = jnp.concatenate([res_u[:, 6:8, :], res_c[:], res_d[:, 0:2, :]],
                           axis=1)
    t0 = t0_r[0, :, 1:-1, :]
    cp = cp_r[0, :, 1:-1, :]
    im = im_r[0, :, 1:-1, :]

    is_first = i == 0
    is_last = i == ntiles - 1
    # global row index of each updated row (ext rows 1 .. T+2)
    rowu = jax.lax.broadcasted_iota(jnp.int32, (T + 2, ext.shape[-1]), 0) \
        + i * T - 1
    colu = jax.lax.broadcasted_iota(jnp.int32, (T + 2, ext.shape[-1]), 1)
    valid = (rowu >= 0) & (rowu < nglob)

    for color in (0, 1):
        if not periodic_x:  # wall ghosts in y: ghost = sign_y * edge row
            row1 = jnp.where(is_first, sign_y * ext[:, 2, :], ext[:, 1, :])
            rowm = jnp.where(is_last, sign_y * ext[:, T + 1, :],
                             ext[:, T + 2, :])
            ext = jnp.concatenate(
                [ext[:, 0:1, :], row1[:, None, :], ext[:, 2:T + 2, :],
                 rowm[:, None, :], ext[:, T + 3:, :]], axis=1)
        cur = ext[:, 1:-1, :]
        nsum = (ext[:, 2:, :] + ext[:, :-2, :]
                + _shift_x(cur, 1, sign_x, periodic_x)
                + _shift_x(cur, -1, sign_x, periodic_x))
        rhs = -d2 * rext[:, 1:-1, :] + nsum
        x = _thomas_profile(t0, cp, im, rhs)
        upd = (((rowu + colu) & 1) == color) & valid
        newcur = jnp.where(upd[None], x, cur)
        ext = jnp.concatenate([ext[:, 0:1, :], newcur, ext[:, T + 3:, :]],
                              axis=1)
    out_ref[:] = ext[:, 2:T + 2, :]


def rb_line_sweep(da: jnp.ndarray, res: jnp.ndarray, prof: SweepProfiles, *,
                  d2: float, sign_x: float, sign_y: float,
                  periodic_x: bool = False,
                  interpret: bool | None = None) -> jnp.ndarray:
    """One full red-black sweep (red then black) of the vertical-line
    relaxation: identical math to two `one_color` passes of
    mg._relax_layered, one HBM pass."""
    if interpret is None:
        interpret = default_interpret()
    nl, n, nx = da.shape
    T = prof.T
    c, u, d = _halo_specs(nl, T, n, nx)
    pspec = pl.BlockSpec((1, nl, T + 4, 1), lambda i: (i, 0, 0, 0))
    kern = functools.partial(_sweep_kernel, d2=float(d2),
                             sign_x=float(sign_x), sign_y=float(sign_y),
                             T=T, nglob=n, periodic_x=periodic_x)
    return pl.pallas_call(
        kern,
        grid=(n // T,),
        in_specs=[c, u, d, c, u, d, pspec, pspec, pspec],
        out_specs=pl.BlockSpec((nl, T, nx), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct(da.shape, da.dtype),
        interpret=interpret,
    )(da, da, da, res, res, res, prof.t0, prof.cp, prof.im)


def _residual_kernel(a_c, a_u, a_d, b_c, s_r, lam_r, out_ref, mx_ref, *,
                     idelta2, idh0, idh1, T, nglob, sign_x, sign_y,
                     periodic_x, has_s, has_lam):
    i = pl.program_id(0)
    ntiles = pl.num_programs(0)
    nl = a_c.shape[0]
    ext = jnp.concatenate([a_u[:, 7:8, :], a_c[:], a_d[:, 0:1, :]], axis=1)
    is_first = i == 0
    is_last = i == ntiles - 1
    if not periodic_x:
        row0 = jnp.where(is_first, sign_y * ext[:, 1, :], ext[:, 0, :])
        rowm = jnp.where(is_last, sign_y * ext[:, T, :], ext[:, T + 1, :])
        ext = jnp.concatenate(
            [row0[:, None, :], ext[:, 1:T + 1, :], rowm[:, None, :]], axis=1)
    cur = ext[:, 1:-1, :]
    nsum = (ext[:, 2:, :] + ext[:, :-2, :]
            + _shift_x(cur, 1, sign_x, periodic_x)
            + _shift_x(cur, -1, sign_x, periodic_x))
    r = b_c[:] - (nsum - 4.0 * cur) * idelta2
    if has_s:
        s = s_r[0, :, 1:-1, :]          # (nl-1, T, 1)
        dif = s * (cur[:-1] - cur[1:])  # s[l]*(a[l] - a[l+1])
        # Gamma[l] = idh0[l]*dif[l-1] - idh1[l]*dif[l]; idh0/idh1 are static
        # python floats so they inline as scalars (no captured constants).
        gam = []
        for l in range(nl):
            g = None
            if l > 0 and idh0[l] != 0.0:
                g = idh0[l] * dif[l - 1]
            if l < nl - 1 and idh1[l] != 0.0:
                t = -idh1[l] * dif[l]
                g = t if g is None else g + t
            gam.append(jnp.zeros_like(cur[0]) if g is None else g)
        r = r - jnp.stack(gam, axis=0)
    if has_lam:
        r = r - lam_r[0, :, 1:-1, :] * cur
    out_ref[:] = r
    # per-tile max-norm: the (ntiles, 1) output uses a whole-array block, so
    # each (sequential) grid step writes its own row
    mx_ref[pl.ds(i, 1), :] = jnp.max(jnp.abs(r)).reshape(1, 1)


def residual_norm(a: jnp.ndarray, b: jnp.ndarray, prof: ResidualProfiles, *,
                  delta: float, idh0, idh1, sign_x: float, sign_y: float,
                  periodic_x: bool = False, interpret: bool | None = None):
    """Fused res = b - lap(a) - Gamma(a) - lam*a and max|res|."""
    if interpret is None:
        interpret = default_interpret()
    nl, n, nx = a.shape
    T = prof.T
    c, u, d = _halo_specs(nl, T, n, nx)
    has_s = prof.s is not None
    has_lam = prof.lam is not None
    in_specs = [c, u, d, c]
    args = [a, a, a, b]
    sspec = pl.BlockSpec((1, nl - 1 if has_s else 1, T + 2, 1),
                         lambda i: (i, 0, 0, 0))
    lspec = pl.BlockSpec((1, nl, T + 2, 1), lambda i: (i, 0, 0, 0))
    # always pass both profile operands (dummies when unused) to keep the
    # kernel signature static
    dt = a.dtype
    s_arg = prof.s if has_s else jnp.zeros((n // T, 1, T + 2, 1), dt)
    lam_arg = prof.lam if has_lam else jnp.zeros((n // T, nl, T + 2, 1), dt)
    in_specs += [sspec, lspec]
    args += [s_arg, lam_arg]
    kern = functools.partial(
        _residual_kernel, idelta2=1.0 / float(delta) ** 2,
        idh0=tuple(float(v) for v in np.asarray(idh0).ravel()),
        idh1=tuple(float(v) for v in np.asarray(idh1).ravel()),
        T=T, nglob=n, sign_x=float(sign_x), sign_y=float(sign_y),
        periodic_x=periodic_x, has_s=has_s, has_lam=has_lam)
    res, mx = pl.pallas_call(
        kern,
        grid=(n // T,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((nl, T, nx), lambda i: (0, i, 0)),
                   pl.BlockSpec((n // T, 1), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct(a.shape, a.dtype),
                   jax.ShapeDtypeStruct((n // T, 1), a.dtype)),
        interpret=interpret,
    )(*args)
    return res, jnp.max(mx)
