"""Exact direct PV inversion for y-VARYING stratification (varRo / frpg).

The msqg inversion  lap(psi) + Gamma(psi) = q  loses its constant vertical
modes when strl = (Fr/Ro)^2 varies in space, which is why the spectral path
previously required uniform columns and varRo configs were chained to the
iterated multigrid. But the reference only ever varies strl in y — the
variable Rossby number Ro(y) = Rom/(1 + Rom*beta*(y - L0/2))
(/root/reference/msqg/qg.h:1032-1048) — so the operator is still separable
in x:

    DST-II in x  ->  for each x-mode kx (eigenvalue lam_kx):
        a*psi_{j-1} + B_j(kx)*psi_j + a*psi_{j+1} = q_hat_j,
        a = 1/h^2,   B_j(kx) = Gamma_j + (lam_kx - 2/h^2) I
        (wall rows j = 0, N-1 get an extra -1/h^2 on the diagonal:
         the Dirichlet half-cell ghost = -interior),

a BLOCK-TRIDIAGONAL system in y with nl x nl blocks Gamma_j (the
stretching tridiagonal at row y_j, ops.stretch conventions, sub/super
diagonals idh0[l]*s[l-1] / idh1[l]*s[l]) and SCALAR off-diagonal blocks
a*I — the FACR-style direct solve VERDICT r5 #4 prescribes.

TPU mapping: the x transform is the production folded/matmul DST (MXU);
the y solve is block-Thomas with ALL division work hoisted to build time —
the forward-elimination inverses W_j(kx) = (B_j - a^2 W_{j-1})^-1 are
precomputed on the host (f64, stored model dtype). The production sweeps
are a sequential lax.scan over y with unroll=16 (cuts the while-loop trip
count 16x; the sweep is launch-latency-bound, not bandwidth-bound).
Measured at 2048^2 x 4 f32 on v5e and REJECTED (PERF.md r5): the
associative-scan form (34.5 ms/step — pays log2 N full-factor HBM passes)
and a two-level blocked form (72-251 ms — XLA re-tiles the per-iteration
4 x 4 block views); the unrolled scan wins at 12.1 ms/step vs the
17.7-29.5 ms mg path this module unchains varRo from. Layout note:
everything is stored with the (y, kx) PLANES LAST — (nl, nl, N, Kx) — so
the 4 x 4 block algebra is elementwise over perfectly tiled (N, Kx)
planes; a blocks-last (N, Kx, nl, nl) layout pads 32x on TPU (T(4,128)
tiling of the trailing 4 x 4) and OOMs at 2048^2. Exact to roundoff (vs
the multigrid's tol=1e-3 iteration, msqg/qg.h:159).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from msom_tpu.solvers import ctdst
from msom_tpu.solvers.spectral import dst_matrix, _MM_PRECISION


@dataclasses.dataclass(frozen=True)
class VarySpectralData:
    """Precomputed x-basis + block-Thomas factors for the y-varying solve."""
    W: jnp.ndarray               # (nl, nl, N, Kx) forward-elim inverses
    S: jnp.ndarray | None        # (N, N) DST-II basis (None -> folded only)
    fac: object | None           # ctdst.FoldedDST (x transform)
    a: float                     # off-diagonal scalar 1/h^2


jax.tree_util.register_dataclass(
    VarySpectralData, data_fields=["W", "S", "fac"], meta_fields=["a"])


def applicable(strl) -> bool:
    """True when strl varies in y only (x-uniform), nl > 1."""
    if strl is None:
        return False
    s = np.asarray(strl)
    return bool(np.array_equal(s, np.broadcast_to(s[..., :1], s.shape))) \
        and not np.all(s == s[:, :1, :1])


def _gamma_blocks(s_prof: np.ndarray, idh0, idh1) -> np.ndarray:
    """(N, nl, nl) stretching blocks Gamma_j from the (nl-1, N) y-profile
    (ops.stretch conventions: Neumann vertical ends via idh0[0] =
    idh1[-1] = 0)."""
    nlm1, N = s_prof.shape
    nl = nlm1 + 1
    idh0 = np.asarray(idh0, np.float64)
    idh1 = np.asarray(idh1, np.float64)
    G = np.zeros((N, nl, nl))
    for l in range(nl):
        if l > 0:
            G[:, l, l - 1] += idh0[l] * s_prof[l - 1]
            G[:, l, l] -= idh0[l] * s_prof[l - 1]
        if l < nl - 1:
            G[:, l, l + 1] += idh1[l] * s_prof[l]
            G[:, l, l] -= idh1[l] * s_prof[l]
    return G


def build_spectral_vary(*, nl: int, N: int, L0: float, s_prof: np.ndarray,
                        idh0, idh1, dtype,
                        transform: str = "auto") -> VarySpectralData:
    """Precompute the factors. s_prof: (nl-1, N) y-profile of strl."""
    h = L0 / N
    a = 1.0 / (h * h)
    k = np.arange(1, N + 1, dtype=np.float64)
    lam = -(4.0 / h ** 2) * np.sin(np.pi * k / (2 * N)) ** 2   # DST-II order

    fac = None
    S = jnp.asarray(dst_matrix(N), dtype)
    if (transform in ("auto", "factored")
            and jnp.dtype(dtype).itemsize == 4 and 512 <= N <= 4096
            and N & (N - 1) == 0):
        fac, perm = ctdst.build_fold(N, dtype)
        if fac is not None:
            lam = lam[perm]        # factors follow the folded mode order

    G = _gamma_blocks(np.asarray(s_prof, np.float64), idh0, idh1)
    I = np.eye(nl)
    # diagonal blocks: B_j(kx) = G_j + (lam_kx - 2a) I, wall rows -a extra
    diag_shift = np.full(N, -2.0 * a)
    diag_shift[0] -= a
    diag_shift[-1] -= a
    W = np.empty((N, len(lam), nl, nl))
    prev = None
    for j in range(N):
        B = (G[j][None] + (lam[:, None, None] + diag_shift[j])
             * I[None])                                  # (Kx, nl, nl)
        if prev is not None:
            B = B - (a * a) * prev
        prev = np.linalg.inv(B)
        W[j] = prev
    # planes-last storage (see module docstring)
    return VarySpectralData(W=jnp.asarray(W.transpose(2, 3, 0, 1), dtype),
                            S=S, fac=fac, a=a)


def _affine_chain(P, c, nl, reverse=False):
    """y_j = c_j + P_j y_{j +/- 1} via associative prefix composition of
    the affine maps (f2 o f1)(y) = (c2 + P2 c1) + P2 P1 y — log2(N)
    batched levels of elementwise-over-(y, kx) block algebra instead of N
    sequential steps. P: (nl*nl, N, K) flattened blocks, c: (nl, N, K);
    the scan axis is the shared axis 1 (y)."""
    def combine(u, v):
        Pu, cu = u
        Pv, cv = v
        sh = Pu.shape[1:]
        Pu4 = Pu.reshape(nl, nl, *sh)
        Pv4 = Pv.reshape(nl, nl, *sh)
        P_ = jnp.einsum("ab...,bc...->ac...", Pv4, Pu4,
                        precision=_MM_PRECISION).reshape(nl * nl, *sh)
        c_ = cv + jnp.einsum("ab...,b...->a...", Pv4, cu,
                             precision=_MM_PRECISION)
        return P_, c_

    _, Y = jax.lax.associative_scan(combine, (P, c), axis=1,
                                    reverse=reverse)
    return Y


_BLOCK = 128   # blocked-sweep in-block length (scan depth C + N/C)


def _blocked_sweep(P, c, nl, C):
    """Affine sweep y_j = c_j + P_j y_{j-1} in TWO-LEVEL form: an in-block
    scan of length C batched over all N/C blocks (pass A: local prefixes
    yhat + prefix products Q), an N/C block-level scan (pass B: carries
    across blocks), and an elementwise reconstruction (pass C). Scan depth
    drops from N to C + N/C at ~2 extra factor-sized HBM passes — the
    latency/bandwidth sweet spot on TPU (the naive scan is launch-latency-
    bound at N=2048, the pure associative form pays log N full-array
    passes; both measured slower, PERF.md r5). P: (nl, nl, N, K),
    c: (nl, N, K)."""
    N, K = c.shape[1], c.shape[2]
    nb = N // C

    def blockify(x):   # (..., N, K) -> (C, ..., nb, K), in-block leading
        y = x.reshape(*x.shape[:-2], nb, C, K)
        return jnp.moveaxis(y, -2, 0)

    # blocks FLATTENED to nl*nl leading: if the (nl, nl) pair survives as
    # array dims, XLA's layout assignment may tile IT (T(4,128) on a 4x4
    # -> 32x padding -> OOM at 2048^2, the same trap as the blocks-last
    # storage; see module docstring)
    Pb = blockify(P).reshape(C, nl * nl, nb, K)
    cb = blockify(c)
    eye = jnp.broadcast_to(
        jnp.eye(nl, dtype=c.dtype).reshape(nl * nl, 1, 1),
        (nl * nl, nb, K))

    def mm(A, B):
        """(nl*nl, ...) x (nl*nl, ...) block matmul, UNROLLED into plane
        arithmetic: no reshape/einsum inside the scan body (a reshape
        through an (nl, nl) view re-tiles the 4x4 pair per iteration —
        measured 10x slower)."""
        return jnp.stack(
            [sum(A[a * nl + b] * B[b * nl + c] for b in range(nl))
             for a in range(nl) for c in range(nl)])

    def mv(A, x):      # (nl*nl, ...) x (nl, ...) block matvec
        return jnp.stack(
            [sum(A[a * nl + b] * x[b] for b in range(nl))
             for a in range(nl)])

    def passA(carry, inp):
        Qp, yp = carry
        Pc, cc = inp
        Qc = mm(Pc, Qp)
        yc = cc + mv(Pc, yp)
        return (Qc, yc), (Qc, yc)

    (Qlast, ylast), (Qs, yhat) = jax.lax.scan(
        passA, (eye, jnp.zeros((nl, nb, K), c.dtype)), (Pb, cb))

    def passB(carry, inp):
        Qb, Sb = inp
        Yb = Sb + mv(Qb, carry)
        return Yb, Yb

    _, Yblk = jax.lax.scan(
        passB, jnp.zeros((nl, K), c.dtype),
        (jnp.moveaxis(Qlast, 1, 0), jnp.moveaxis(ylast, 1, 0)))
    # carry INTO block b is Y_{b-1} (zero for b = 0)
    Yprev = jnp.moveaxis(
        jnp.concatenate([jnp.zeros((1, nl, K), c.dtype), Yblk[:-1]], 0),
        0, 1)                                            # (nl, nb, K)

    y = yhat + jnp.stack(
        [sum(Qs[:, a * nl + b] * Yprev[None, b] for b in range(nl))
         for a in range(nl)], axis=1)
    # (C, nl, nb, K) -> (nl, N, K)
    y = jnp.moveaxis(y, 0, 2)                            # (nl, nb, C, K)
    return y.reshape(nl, N, K)


def solve_spectral_vary(data: VarySpectralData, q: jnp.ndarray,
                        method: str = "auto") -> jnp.ndarray:
    """psi = L^-1 q for the y-varying system; q: (nl, N, N).

    method: "auto" (blocked two-level sweeps when N allows, else the
    sequential scan), "blocked", "assoc" (associative-scan form — measured
    slower at 2048: log N full-array passes), or "scan" (sequential
    reference form used to pin the others in tests)."""
    a = data.a
    nl = q.shape[0]
    if data.fac is not None:
        X = ctdst.fdst_x(data.fac, q)
    else:
        X = jnp.einsum("ki,lyi->lyk", data.S, q, precision=_MM_PRECISION)
    # X: (nl, N_y, Kx) — already planes-last
    N = X.shape[1]

    if method == "auto":
        method = "scan"   # blocked/assoc measured slower on
        #                     TPU at 2048^2 (PERF.md r5): the sequential
        #                     unrolled scan wins

    if method == "blocked":
        C = _BLOCK if (N % _BLOCK == 0 and N // _BLOCK >= 2) else N // 4
        if C < 1 or N % C:
            method = "scan"   # no valid block size for this N
    if method == "blocked":
        P = -a * data.W
        c = jnp.einsum("abyk,byk->ayk", data.W, X, precision=_MM_PRECISION)
        Y = _blocked_sweep(P, c, nl, C)
        # backward sweep psi_j = y_j + P_j psi_{j+1}: flip y -> forward
        Psi = _blocked_sweep(jnp.flip(P, axis=2), jnp.flip(Y, axis=1),
                             nl, C)
        Psi = jnp.flip(Psi, axis=1)
    elif method == "assoc":
        # forward: y_j = W_j r_j + (-a W_j) y_{j-1}
        c = jnp.einsum("abyk,byk->ayk", data.W, X, precision=_MM_PRECISION)
        P = (-a * data.W).reshape(nl * nl, *data.W.shape[2:])
        Y = _affine_chain(P, c, nl)
        # backward: psi_j = y_j + (-a W_j) psi_{j+1}
        Psi = _affine_chain(P, Y, nl, reverse=True)
    else:
        # sequential reference form: scan over y with y leading
        Ws = jnp.moveaxis(data.W, 2, 0)            # (N, nl, nl, K)
        r = jnp.moveaxis(X, 1, 0)                  # (N, nl, K)

        def fwd(carry, inp):
            Wj, rj = inp
            yj = jnp.einsum("abk,bk->ak", Wj, rj - a * carry,
                            precision=_MM_PRECISION)
            return yj, yj

        zero = jnp.zeros_like(r[0])
        _, Yl = jax.lax.scan(fwd, zero, (Ws, r), unroll=16)

        def bwd(carry, inp):
            Wj, yj = inp
            pj = yj - a * jnp.einsum("abk,bk->ak", Wj, carry,
                                     precision=_MM_PRECISION)
            return pj, pj

        _, Psil = jax.lax.scan(bwd, zero, (Ws, Yl), reverse=True,
                               unroll=16)
        Psi = jnp.moveaxis(Psil, 0, 1)             # (nl, N, K)
    if data.fac is not None:
        return ctdst.ifdst_x(data.fac, Psi)
    return jnp.einsum("ik,lyk->lyi", data.S.T, Psi, precision=_MM_PRECISION)