"""Fused Pallas spectral-inversion kernel — the whole modal solve in VMEM.

The XLA lowering of the matmul-DST inversion (solvers/spectral._mm_solve)
is four separate einsums + an elementwise scale: every intermediate makes a
round trip through HBM (~0.6 GB/solve at 2048^2 x 4) and the middle-axis
contractions pay relayout copies. Here the chain

    psi_m[l] = S^T ( ( S (q_m[l] S^T) ) * D[l] ) S

runs per modal layer inside ONE Pallas invocation: the basis S and every
intermediate stay resident in VMEM, the four 2048^2 matmuls hit the MXU
back-to-back at HIGH precision (3-pass bf16 — the production accuracy pick,
PERF.md round-3 table), and HBM sees only the layer read + write.

Grid: one step per modal layer (per-layer working set N^2 f32 x ~4 buffers
+ S; fits VMEM for N <= 2048 on v5e). Reference anchor: this solves the
same discrete system as /root/reference/msqg/poisson_layer.h at its
call-site tolerance (qg.h:159), exactly.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def enabled(dtype, N: int) -> bool:
    """Route the spectral matmul solve through the fused kernel?

    OPT-IN (MSOM_PALLAS="1" or "interpret"), not the default — MEASURED on
    TPU v5e and rejected as a default on both ends of the size range
    (PERF.md round-3):
      * N = 2048 (flagship): the per-layer working set (double-buffered
        in/out windows + the f32 intermediate + the bf16 operand splits)
        needs 160 MB of VMEM vs the 128 MB available — compile fails;
      * N = 1024 (where it fits): 1.47 ms/solve vs the XLA einsum path's
        1.36 ms — XLA's dot pipelining + epilogue fusion already covers
        the intermediate HBM traffic this kernel set out to save, and the
        in-kernel hi/lo operand splits add VPU work XLA's native
        HIGH-precision dots get for free.
    Error class matches the HIGH path (6.4e-5 max rel diff at 1024).
    Kept as infrastructure: the measurement, the 3-pass bf16 decomposition
    and the chain structure are the starting point for a future blocked
    two-stage variant if transform sizes outgrow XLA's scheduler."""
    mode = os.environ.get("MSOM_PALLAS", "")
    shape_ok = 128 <= N <= 1024 and N % 128 == 0 \
        and jnp.dtype(dtype) == jnp.float32
    if mode in ("1", "interpret"):
        return shape_ok
    return False


def _split(x):
    """f32 -> (hi, lo) bf16 pair with x ~= hi + lo (the HIGH-precision
    operand decomposition; Mosaic's dot lowering only accepts
    DEFAULT/HIGHEST, so the 3-pass bf16 scheme is spelled out)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(xs, ws, dn):
    """3-pass bf16 dot with f32 accumulation ~ Precision.HIGH:
    x@w ~= xh@wh + xh@wl + xl@wh (the xl@wl term is O(eps^2))."""
    xh, xl = xs
    wh, wl = ws
    d = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                         preferred_element_type=jnp.float32)
    return d(xh, wh) + d(xh, wl) + d(xl, wh)


def _kernel(S_ref, q_ref, D_ref, o_ref):
    S = _split(S_ref[...])
    # forward: contract x (last axis of q against last axis of S = S^T on
    # the right), then y — the same contraction order as _mm_solve's
    # einsums at Precision.HIGH
    t = _dot3(_split(q_ref[0]), S, (((1,), (1,)), ((), ())))  # q @ S^T
    t = _dot3(S, _split(t), (((1,), (0,)), ((), ())))         # S @ .
    t = t * D_ref[0]
    t = _dot3(S, _split(t), (((0,), (0,)), ((), ())))         # S^T @ .
    t = _dot3(_split(t), S, (((1,), (0,)), ((), ())))         # . @ S
    o_ref[0] = t


def fused_mm_solve(S: jnp.ndarray, inv_den: jnp.ndarray, qm: jnp.ndarray,
                   interpret: bool | None = None) -> jnp.ndarray:
    """psi_m = S^T((S qm S^T) * inv_den) S per layer, fused in VMEM.

    S: (N, N) transform basis; inv_den: (nl, N, N); qm: (nl, N, N) modal
    right-hand side. Matches spectral._mm_solve(..., Precision.HIGH) to MXU
    accumulation order."""
    if interpret is None:
        interpret = default_interpret()
    nl, N, _ = qm.shape
    return pl.pallas_call(
        _kernel,
        grid=(nl,),
        in_specs=[
            pl.BlockSpec((N, N), lambda l: (0, 0)),
            pl.BlockSpec((1, N, N), lambda l: (l, 0, 0)),
            pl.BlockSpec((1, N, N), lambda l: (l, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, N), lambda l: (l, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(qm.shape, qm.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(S, qm, inv_den)
