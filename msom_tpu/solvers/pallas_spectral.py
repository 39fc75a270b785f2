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

    MSOM_PALLAS forces: "0" off, "1"/"interpret" on. Default: compiled TPU,
    f32, 128 <= N <= 2048 (per-layer VMEM working set), N % 128 == 0."""
    mode = os.environ.get("MSOM_PALLAS", "")
    if mode == "0":
        return False
    shape_ok = 128 <= N <= 2048 and N % 128 == 0 \
        and jnp.dtype(dtype) == jnp.float32
    if mode in ("1", "interpret"):
        return shape_ok
    # single device only: the GSPMD multi-chip path keeps the XLA einsums
    # (the explicit-collective path uses parallel/spectral_shard.py)
    return (shape_ok and jax.default_backend() == "tpu"
            and jax.device_count() == 1)


def _kernel(S_ref, q_ref, D_ref, o_ref, *, precision):
    S = S_ref[...]
    q = q_ref[0]
    dot = functools.partial(jax.lax.dot_general, precision=precision,
                            preferred_element_type=jnp.float32)
    # forward: contract x (last axis of q against last axis of S = S^T on
    # the right), then y — the same contraction order as _mm_solve's
    # einsums, so the modal coefficients match that path's up to MXU
    # accumulation order
    t = dot(q, S, (((1,), (1,)), ((), ())))          # q @ S^T   -> (y, kx)
    t = dot(S, t, (((1,), (0,)), ((), ())))          # S @ .     -> (ky, kx)
    t = t * D_ref[0]
    t = dot(S, t, (((0,), (0,)), ((), ())))          # S^T @ .   -> (y, kx)
    t = dot(t, S, (((1,), (0,)), ((), ())))          # . @ S     -> (y, x)
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
    kern = functools.partial(_kernel, precision=jax.lax.Precision.HIGH)
    return pl.pallas_call(
        kern,
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
