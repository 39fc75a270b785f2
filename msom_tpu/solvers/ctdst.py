"""Factored matmul DST-II — breaking the O(N^3) transform wall (r4).

The production spectral inversion (solvers/spectral.py) computes the DST-II
along each axis as ONE (N, N) MXU matmul: O(N^2) flops per transformed
vector. Two factorizations were built and MEASURED at 2048^2 x 4 on v5e
(tools/ctdst_experiment.py, PERF.md r4):

1. Cooley-Tukey two-stage (N = N1*N2 batched small matmuls, 8x fewer
   flops): LOSES (6.5 ms vs 5.2 direct) — the stage matrices (e.g. 32x64)
   run the 128x128 MXU at ~1/8 utilization, exactly cancelling the flop
   saving, and the inter-stage intermediates add HBM passes.

2. THIS MODULE — Lee-style recursive even/odd folding. The orthonormal
   DST-II matrix S obeys S[k, N-1-i] = (-1)^k S[k, i], so with
   e = (x + flip x)[:N/2], o = (x - flip x)[:N/2]:
       y[even k] = S[0::2, :N/2] @ e      (a DST-IV_{N/2}, dense leaf)
       y[odd  k] = S[1::2, :N/2] @ o      (a scaled DST-II_{N/2} — recurse)
   Each level halves the odd block; all matmuls stay >= (N/2^L)^2 — large
   enough for full MXU utilization (leaf >= 256). Flops vs direct:
   0.5 (L=1), 0.375 (L=2), 0.344 (L=3), asymptote 1/3. The fold itself is
   one cheap elementwise pass (a lane-flip + add).

   Outputs are produced in a PERMUTED modal order (even ks, then odd-even,
   ...). No runtime shuffle is ever paid: the solve's modal denominator
   inv_den is permuted once at build time on both axes (build_fold returns
   the permutation), and the inverse transform is the exact adjoint chain
   consuming the permuted layout natively. The matrices are SLICES of the
   true orthonormal dst_matrix, so orthogonality (inverse = transpose) is
   inherited exactly; per-dot summation depth drops, so rounding error is
   no worse than the direct matmul's.

Validated against solvers.spectral.dst_matrix in tests/test_spectral.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

_PREC = jax.lax.Precision.HIGH


@dataclasses.dataclass(frozen=True)
class FoldedDST:
    """Per-level even-block matrices + the leaf block for one length N.

    Mes[l]: (N/2^(l+1), N/2^(l+1)) dense even-k block of level l;
    Mleaf: (N/2^L, N/2^L) remaining odd-chain block."""
    Mes: tuple
    Mleaf: jnp.ndarray
    N: int
    L: int


jax.tree_util.register_dataclass(
    FoldedDST, data_fields=["Mes", "Mleaf"], meta_fields=["N", "L"])


def default_levels(N: int, min_leaf: int = 256) -> int:
    """Fold while the leaf stays >= min_leaf (MXU stays fully utilized);
    at least one fold for any usable N (correct, if not profitable, at
    small N — keeps the path testable at CPU-test sizes)."""
    L = 0
    n = N
    while n // 2 >= min_leaf and L < 8:
        n //= 2
        L += 1
    return max(L, 1) if N >= 32 else 0


def build_fold(N: int, dtype, L: int | None = None):
    """(FoldedDST, perm): perm[j] = the natural modal index k of output
    slot j — apply to inv_den once at build time (both axes)."""
    from msom_tpu.solvers.spectral import dst_matrix
    if N < 16 or N & (N - 1):
        return None, None
    if L is None:
        L = default_levels(N)
    if L == 0:
        return None, None
    M = dst_matrix(N)
    Mes = []
    perm_parts = []
    rows = np.arange(N)
    for _ in range(L):
        n = M.shape[1]
        Mes.append(jnp.asarray(M[0::2, :n // 2], dtype))
        perm_parts.append(rows[0::2])
        M = np.ascontiguousarray(M[1::2, :n // 2])
        rows = rows[1::2]
    perm = np.concatenate(perm_parts + [rows])
    return FoldedDST(Mes=tuple(Mes), Mleaf=jnp.asarray(M, dtype),
                     N=N, L=L), perm


def _sizes(f: FoldedDST):
    return [f.N >> (l + 1) for l in range(f.L)] + [f.N >> f.L]


def fdst_x(f: FoldedDST, x: jnp.ndarray) -> jnp.ndarray:
    """Forward DST-II along the LAST axis, permuted modal output order."""
    parts = []
    cur = x
    for Me in f.Mes:
        n = cur.shape[-1]
        xf = jnp.flip(cur, -1)
        e = (cur + xf)[..., :n // 2]
        o = (cur - xf)[..., :n // 2]
        parts.append(jnp.einsum("ki,...i->...k", Me, e, precision=_PREC))
        cur = o
    parts.append(jnp.einsum("ki,...i->...k", f.Mleaf, cur,
                            precision=_PREC))
    return jnp.concatenate(parts, axis=-1)


def ifdst_x(f: FoldedDST, y: jnp.ndarray) -> jnp.ndarray:
    """Inverse (= adjoint) along the LAST axis from the permuted order."""
    sizes = _sizes(f)
    offs = np.cumsum([0] + sizes)
    parts = [y[..., offs[i]:offs[i + 1]] for i in range(len(sizes))]
    cur = jnp.einsum("ki,...k->...i", f.Mleaf, parts[-1], precision=_PREC)
    for l in reversed(range(f.L)):
        ec = jnp.einsum("ki,...k->...i", f.Mes[l], parts[l],
                        precision=_PREC)
        cur = jnp.concatenate([ec + cur, jnp.flip(ec - cur, -1)], axis=-1)
    return cur


def fdst_y(f: FoldedDST, x: jnp.ndarray) -> jnp.ndarray:
    """Forward DST-II along axis -2 (no explicit transpose)."""
    parts = []
    cur = x
    for Me in f.Mes:
        n = cur.shape[-2]
        xf = jnp.flip(cur, -2)
        e = (cur + xf)[..., :n // 2, :]
        o = (cur - xf)[..., :n // 2, :]
        parts.append(jnp.einsum("ki,...ix->...kx", Me, e, precision=_PREC))
        cur = o
    parts.append(jnp.einsum("ki,...ix->...kx", f.Mleaf, cur,
                            precision=_PREC))
    return jnp.concatenate(parts, axis=-2)


def ifdst_y(f: FoldedDST, y: jnp.ndarray) -> jnp.ndarray:
    sizes = _sizes(f)
    offs = np.cumsum([0] + sizes)
    parts = [y[..., offs[i]:offs[i + 1], :] for i in range(len(sizes))]
    cur = jnp.einsum("ki,...kx->...ix", f.Mleaf, parts[-1],
                     precision=_PREC)
    for l in reversed(range(f.L)):
        ec = jnp.einsum("ki,...kx->...ix", f.Mes[l], parts[l],
                        precision=_PREC)
        cur = jnp.concatenate([ec + cur, jnp.flip(ec - cur, -2)], axis=-2)
    return cur


# ---------------------------------------------------------------------------
# Folded DST-I (odd lengths M = N-1): the nodal (vertex) transform
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FoldedDST1:
    """Folded DST-I (spectral.dst1_matrix) — the same Lee even/odd recursion
    as FoldedDST but over ODD lengths M = N-1: each fold has a middle
    column that belongs to the even part alone (the odd rows' middle
    coefficients are exactly zero: sin(pi(k+1)/2) at even k+1), so the even
    blocks are (ceil(m/2), m//2+1) and the odd chain keeps folding odd
    lengths. Output order permuted (build_fold1 returns the permutation —
    apply to inv_den on both axes at build time)."""
    Mes: tuple
    Mleaf: jnp.ndarray
    N: int
    L: int


jax.tree_util.register_dataclass(
    FoldedDST1, data_fields=["Mes", "Mleaf"], meta_fields=["N", "L"])


def build_fold1(N: int, dtype, L: int | None = None):
    """(FoldedDST1, perm) for the (N-1)-point DST-I."""
    from msom_tpu.solvers.spectral import dst1_matrix
    if N < 32 or N & (N - 1):
        # power-of-2 N only (mirrors build_fold): an even non-power-of-2 N
        # would walk the odd chain into even sub-lengths — the untested
        # even-m fold branch the middle-column assert does not protect
        return None, None
    if L is None:
        L = default_levels(N)
    if L == 0:
        return None, None
    M = dst1_matrix(N)
    Mes = []
    perm_parts = []
    rows = np.arange(N - 1)
    for _ in range(L):
        m = M.shape[1]
        h = m // 2
        if m % 2 == 1:
            # middle-column coefficients of the odd rows are identically 0
            assert np.abs(M[1::2, h]).max() < 1e-10
            Mes.append(jnp.asarray(M[0::2, :h + 1], dtype))
        else:
            Mes.append(jnp.asarray(M[0::2, :h], dtype))
        perm_parts.append(rows[0::2])
        M = np.ascontiguousarray(M[1::2, :h])
        rows = rows[1::2]
    perm = np.concatenate(perm_parts + [rows])
    return FoldedDST1(Mes=tuple(Mes), Mleaf=jnp.asarray(M, dtype),
                      N=N, L=L), perm


def _widths1(f: FoldedDST1):
    """Per-level (input width m, half h, odd) walking the odd chain."""
    m = f.N - 1
    out = []
    for _ in range(f.L):
        h = m // 2
        out.append((m, h, m % 2 == 1))
        m = h
    return out


def fdst1_x(f: FoldedDST1, x: jnp.ndarray) -> jnp.ndarray:
    parts = []
    cur = x
    for Me, (m, h, odd) in zip(f.Mes, _widths1(f)):
        xf = jnp.flip(cur[..., h + (1 if odd else 0):], -1)
        e = cur[..., :h] + xf
        if odd:
            e = jnp.concatenate([e, cur[..., h:h + 1]], -1)
        o = cur[..., :h] - xf
        parts.append(jnp.einsum("ki,...i->...k", Me, e, precision=_PREC))
        cur = o
    parts.append(jnp.einsum("ki,...i->...k", f.Mleaf, cur,
                            precision=_PREC))
    return jnp.concatenate(parts, axis=-1)


def ifdst1_x(f: FoldedDST1, y: jnp.ndarray) -> jnp.ndarray:
    widths = _widths1(f)
    sizes = [Me.shape[0] for Me in f.Mes] + [f.Mleaf.shape[0]]
    offs = np.cumsum([0] + sizes)
    parts = [y[..., offs[i]:offs[i + 1]] for i in range(len(sizes))]
    cur = jnp.einsum("ki,...k->...i", f.Mleaf, parts[-1], precision=_PREC)
    for l in reversed(range(f.L)):
        ec = jnp.einsum("ki,...k->...i", f.Mes[l], parts[l],
                        precision=_PREC)
        m, h, odd = widths[l]
        if odd:
            mid = ec[..., h:h + 1]
            ec = ec[..., :h]
            cur = jnp.concatenate([ec + cur, mid,
                                   jnp.flip(ec - cur, -1)], axis=-1)
        else:
            cur = jnp.concatenate([ec + cur, jnp.flip(ec - cur, -1)],
                                  axis=-1)
    return cur


def fdst1_y(f: FoldedDST1, x: jnp.ndarray) -> jnp.ndarray:
    parts = []
    cur = x
    for Me, (m, h, odd) in zip(f.Mes, _widths1(f)):
        xf = jnp.flip(cur[..., h + (1 if odd else 0):, :], -2)
        e = cur[..., :h, :] + xf
        if odd:
            e = jnp.concatenate([e, cur[..., h:h + 1, :]], -2)
        o = cur[..., :h, :] - xf
        parts.append(jnp.einsum("ki,...ix->...kx", Me, e,
                                precision=_PREC))
        cur = o
    parts.append(jnp.einsum("ki,...ix->...kx", f.Mleaf, cur,
                            precision=_PREC))
    return jnp.concatenate(parts, axis=-2)


def ifdst1_y(f: FoldedDST1, y: jnp.ndarray) -> jnp.ndarray:
    widths = _widths1(f)
    sizes = [Me.shape[0] for Me in f.Mes] + [f.Mleaf.shape[0]]
    offs = np.cumsum([0] + sizes)
    parts = [y[..., offs[i]:offs[i + 1], :] for i in range(len(sizes))]
    cur = jnp.einsum("ki,...kx->...ix", f.Mleaf, parts[-1],
                     precision=_PREC)
    for l in reversed(range(f.L)):
        ec = jnp.einsum("ki,...kx->...ix", f.Mes[l], parts[l],
                        precision=_PREC)
        m, h, odd = widths[l]
        if odd:
            mid = ec[..., h:h + 1, :]
            ec = ec[..., :h, :]
            cur = jnp.concatenate([ec + cur, mid,
                                   jnp.flip(ec - cur, -2)], axis=-2)
        else:
            cur = jnp.concatenate([ec + cur, jnp.flip(ec - cur, -2)],
                                  axis=-2)
    return cur
