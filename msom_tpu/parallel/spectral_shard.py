"""Sharded direct spectral PV inversion (explicit-collective path).

The matmul-basis spectral solve (solvers/spectral.py) on a ('y', 'x') device
mesh inside shard_map. Each 1-D transform along a sharded axis decomposes
exactly:

    out[k] = sum_j T[k, j] a[j]
           = sum_{devices d} ( T[:, rows(d)] @ a_local(d) )[k]

so a distributed transform is ONE local MXU matmul with the (N, n_loc)
column-slice of the basis matrix followed by ONE `lax.psum_scatter` over the
mesh axis (each device keeps its own k-block of the summed result). Per-device
flops are the serial transform's divided by the device count — perfect
parallel efficiency — and the only communication is the reduce-scatter riding
ICI. The modal (layer<->mode) nl x nl projections act on the unsharded layer
axis and stay local; the eigenvalue division acts on the inv_den tile sharded
identically to the field.

This is the multi-chip story for the production inversion path — the
comm-dominant phase of the reference (per-level boundary_level,
/root/reference/msqg/poisson_layer.h:263-306) replaced by four
matmul+reduce-scatter pairs with NO level hierarchy. Both BCs are covered:
Dirichlet uses the DST-II matrix, periodic the real cos/sin Fourier
eigenbasis (spectral.fourier_matrix).

All functions are LOCAL-VIEW: call inside shard_map
(parallel.step.make_qg_step_sharded wires the full model step).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from msom_tpu.ops.bc import BC
from msom_tpu.solvers import spectral
from msom_tpu.parallel import halo


def transform_sharded(a, T, *, inverse: bool, precision,
                      ym: str = "y", xm: str = "x"):
    """2-D orthogonal transform of a local (..., ny_l, nx_l) tile.

    Forward: out = T @ a @ T.T (per trailing 2-D slice, distributed);
    inverse: T.T @ a @ T. `T` is the replicated (N, N) basis matrix; the
    device's column/row slice is taken with a dynamic_slice on its mesh
    coordinates."""
    ny_l, nx_l = a.shape[-2], a.shape[-1]
    yi, xi = lax.axis_index(ym), lax.axis_index(xm)

    def axis_tf(a, n_loc, idx, axis_name, sub):
        # T column-block for forward (sum over the distributed j index),
        # T row-block for inverse (sum over the distributed k index);
        # both reduce to: partial over the full output axis, then
        # reduce-scatter so this device keeps its own block.
        if inverse:
            Tb = lax.dynamic_slice_in_dim(T, idx * n_loc, n_loc, axis=0)
            partial = jnp.einsum(sub, Tb.T, a, precision=precision)
        else:
            Tb = lax.dynamic_slice_in_dim(T, idx * n_loc, n_loc, axis=1)
            partial = jnp.einsum(sub, Tb, a, precision=precision)
        dim = a.ndim - (2 if "j" in sub.split(",")[1] else 1)
        return lax.psum_scatter(partial, axis_name, scatter_dimension=dim,
                                tiled=True)

    a = axis_tf(a, ny_l, yi, ym, "kj,...jx->...kx")
    return axis_tf(a, nx_l, xi, xm, "ki,...yi->...yk")


def solve_spectral_sharded(data: spectral.SpectralData, q: jnp.ndarray,
                           ym: str = "y", xm: str = "x") -> jnp.ndarray:
    """Local-view psi = L^-1 q. `q` is the device's (nl, ny_l, nx_l) tile;
    `data` must come from build_spectral(force_matmul=True) and be passed
    through shard_map with `specs(data)` (inv_den sharded like the fields,
    basis/mode matrices replicated)."""
    assert data.S is not None, "sharded spectral requires the matmul basis"
    mp = spectral._MODE_PRECISION
    qm = q if data.l2m is None else jnp.einsum("ml,lyx->myx", data.l2m, q,
                                               precision=mp)

    def one_solve(rhs, precision):
        Q = transform_sharded(rhs, data.S, inverse=False,
                              precision=precision, ym=ym, xm=xm)
        return transform_sharded(Q * data.inv_den, data.S, inverse=True,
                                 precision=precision, ym=ym, xm=xm)

    if data.refine:
        pm = one_solve(qm, jax.lax.Precision.DEFAULT)
        bc = BC.PERIODIC if data.periodic else BC.DIRICHLET
        r = spectral.modal_residual(
            data, qm, pm,
            ghost_fn=lambda f, b: halo.ghosted_sharded(f, b, ym, xm))
        pm = pm + one_solve(r, jax.lax.Precision.DEFAULT)
    else:
        pm = one_solve(qm, spectral._MM_PRECISION)
    return pm if data.m2l is None else jnp.einsum("lm,myx->lyx", data.m2l,
                                                  pm, precision=mp)


# ---------------------------------------------------------------------------
# Pencil (transpose) decomposition — the kernel-keeping rows-sharded path
# ---------------------------------------------------------------------------

def a2a_cols(a: jnp.ndarray, ym: str = "y") -> jnp.ndarray:
    """Rows-shard -> columns-shard transpose: local (..., ny_l, K) ->
    (..., NY, k_l) via ONE lax.all_to_all over the mesh axis. Device d ends
    holding the FULL y axis and its own contiguous K-block — the classic
    distributed-spectral pencil step, riding ICI as a single collective
    (vs the reference's per-level boundary_level chatter,
    /root/reference/msqg/poisson_layer.h:263-306)."""
    if lax.axis_size(ym) == 1:
        return a
    return lax.all_to_all(a, ym, split_axis=a.ndim - 1,
                          concat_axis=a.ndim - 2, tiled=True)


def a2a_rows(a: jnp.ndarray, ym: str = "y") -> jnp.ndarray:
    """Inverse of a2a_cols: (..., NY, k_l) -> (..., ny_l, K)."""
    if lax.axis_size(ym) == 1:
        return a
    return lax.all_to_all(a, ym, split_axis=a.ndim - 2,
                          concat_axis=a.ndim - 1, tiled=True)


def solve_spectral_pencil(data: spectral.SpectralData, q: jnp.ndarray,
                          ym: str = "y") -> jnp.ndarray:
    """Local-view psi = L^-1 q on a 1-D ROWS mesh — the distributed solve
    that keeps the production transform kernels: every matmul (folded
    Lee-DST stages or the dense basis) runs LOCALLY on full axes at exactly
    1/ndev of the serial flops, and the only communication is two
    all_to_all transposes per transform pair.

        x-transform (local, full lane axis)
        -> all_to_all transpose (y becomes local)
        -> y-transform (local) -> * inv_den (sharded over the x-mode block)
        -> inverse y-transform -> all_to_all back -> inverse x-transform

    `q` is the device's (nl, ny_l, N) tile. `data` must carry a matmul
    basis (S and/or the folded fac) — build via build_spectral with a
    non-fft transform; inv_den passes through shard_map sharded over its
    LAST axis (pencil_specs). On a 1-device mesh the all_to_alls are
    identity and the math is the unsharded solver's, so single-chip cost
    is preserved (the r4 decision-rule regression this path removes)."""
    assert not data.refine, "pencil path: refine unsupported"
    assert data.S is not None or data.fac is not None, \
        "pencil spectral requires a matmul/folded basis (not fft)"
    mp = spectral._MODE_PRECISION
    qm = q if data.l2m is None else jnp.einsum("ml,lyx->myx", data.l2m, q,
                                               precision=mp)
    if data.fac is not None:
        from msom_tpu.solvers import ctdst
        if isinstance(data.fac, ctdst.FoldedDST1):
            fx, fy = ctdst.fdst1_x, ctdst.fdst1_y
            ix, iy = ctdst.ifdst1_x, ctdst.ifdst1_y
        else:
            fx, fy = ctdst.fdst_x, ctdst.fdst_y
            ix, iy = ctdst.ifdst_x, ctdst.ifdst_y
        Q = a2a_cols(fx(data.fac, qm), ym)
        Q = fy(data.fac, Q)
        P = Q * data.inv_den
        pm = ix(data.fac, a2a_rows(iy(data.fac, P), ym))
    else:
        S = data.S
        pr = spectral._MM_PRECISION
        Q = jnp.einsum("ki,myi->myk", S, qm, precision=pr)
        Q = a2a_cols(Q, ym)
        Q = jnp.einsum("kj,mjx->mkx", S, Q, precision=pr)
        P = Q * data.inv_den
        pm = jnp.einsum("jk,mkx->mjx", S.T, P, precision=pr)
        pm = jnp.einsum("ik,myk->myi", S.T, a2a_rows(pm, ym), precision=pr)
    return pm if data.m2l is None else jnp.einsum("lm,myx->lyx", data.m2l,
                                                  pm, precision=mp)


def pencil_specs(data: spectral.SpectralData, ndev: int, ym: str = "y"):
    """PartitionSpecs for the pencil path: inv_den sharded over its LAST
    (x-mode) axis — the block each device owns after the transpose —
    everything else replicated."""
    sp = jax.tree.map(lambda _: P(), data)
    if data.inv_den.shape[-1] % ndev == 0:
        sp = dataclasses.replace(sp, inv_den=P(None, None, ym))
    return sp


def specs(data: spectral.SpectralData, my: int, mx: int):
    """PartitionSpecs for passing SpectralData through shard_map: inv_den
    tiled like the model fields, everything else (basis matrix, nl x nl mode
    matrices, iBu vector) replicated."""
    sp = jax.tree.map(lambda _: P(), data)
    N = data.inv_den.shape[-2]
    if N % my == 0 and data.inv_den.shape[-1] % mx == 0:
        sp = dataclasses.replace(sp, inv_den=P(None, "y", "x"))
    return sp
