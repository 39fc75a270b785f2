"""Direct spectral PV inversion — the TPU fast path for uniform columns.

The msqg PV inversion solves  lap(psi) + Gamma(psi) = q  where Gamma is the
vertical stretching operator (/root/reference/msqg/poisson_layer.h:4-17).
When the stretching coefficients strl = (Fr/Ro)^2 are spatially uniform —
every reference configuration with varRo = 0, including the canonical Verron
double gyre (/root/reference/msqg/test/params.double_gyre.in) — the vertical
modes diagonalize Gamma with CONSTANT nl x nl matrices (the MODE_PV_INVERT
idea, /root/reference/msqg/qg.h:109-157), and each modal Helmholtz problem
  lap(p_m) + iBu_m p_m = q_m,   iBu_m <= 0,
is itself diagonalized by the sine/Fourier basis of the discrete 5-point
Laplacian under the model's boundary conditions:

* Dirichlet (sbc >= 0): psi ghost = -interior (value 0 half a cell outside,
  msqg/layer.h:17-27). The cell-centered eigenvectors are
  sin(pi k (i+1/2)/N), k = 1..N — the DST-II basis — with eigenvalues
  -(4/h^2) sin^2(pi k / (2N)).
* Periodic (sbc == -1): the DFT basis, eigenvalues -(4/h^2) sin^2(pi k / N);
  the (k=0, barotropic) null mode is projected out, matching the zero-mean
  gauge the reference imposes on periodic runs (/root/reference/msqg/qg.c:76).

So the inversion becomes: batched nl x nl matmul (MXU) -> 2-D fast transform
-> elementwise multiply by precomputed 1/(lam_x + lam_y + iBu) -> inverse
transform -> matmul back. One shot, residual at machine precision (vs the
reference's iterated multigrid at tolerance 1e-3, msqg/qg.h:159), O(N^2 log N),
and entirely MXU/fft work that XLA schedules well — this is the production
inversion path selected by QGConfig(solver="spectral"); the multigrid in
msom_tpu.solvers.mg remains the general path for spatially-varying
stratification (varRo) and as the semantics-parity reference.

DST-II is computed via the DCT-II identity
  DST2(x)[k] = flip_k( DCT2((-1)^i x)[k] ),
exact for any N (validated against the explicit sine matrix in
tests/test_spectral.py). With norm="ortho" forward/inverse are exact adjoints,
and the per-mode normalization cancels because the eigenvalue division is
diagonal in k.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy import fft as jfft


@dataclasses.dataclass(frozen=True)
class SpectralData:
    """Precomputed inverse modal denominators + mode matrices.

    When S is present the matmul path is used: S is an orthonormal (N, N)
    real eigenbasis of the 1-D discrete Laplacian under the model BC — the
    DST-II matrix (Dirichlet) or the cos/sin Fourier eigenbasis (periodic,
    fourier_matrix) — and inv_den is laid out in that basis's row ordering.
    With S None the transform falls back to the fast lowering (DCT-based DST
    or rfft2) with inv_den in the corresponding ordering."""
    inv_den: jnp.ndarray         # (nl, N, Kx): 1/(lam_y + lam_x + iBu_m)
    l2m: jnp.ndarray | None      # (nl, nl) layer->mode (None when nl == 1)
    m2l: jnp.ndarray | None      # (nl, nl) mode->layer
    S: jnp.ndarray | None        # (N, N) basis matrix (matmul transform)
    iBu: jnp.ndarray | None      # (nl,) modal Helmholtz coefficients
    periodic: bool               # static: selects DFT vs DST basis
    delta: float                 # static: grid spacing (refinement stencil)
    refine: bool                 # static: bf16 transforms + one f32
    #                              iterative-refinement pass (TPU MXU lever)
    fac: object | None = None    # ctdst.FactoredDST: two-stage factored
    #                              matmul DST (transform="factored") —
    #                              8x fewer MXU flops than the single
    #                              (N, N) matmul at N = 2048


jax.tree_util.register_dataclass(
    SpectralData, data_fields=["inv_den", "l2m", "m2l", "S", "iBu", "fac"],
    meta_fields=["periodic", "delta", "refine"])


def dst_matrix(N: int, dtype=np.float64) -> np.ndarray:
    """Orthonormal DST-II matrix: S[k, i] = c_k sin(pi (k+1)(i+1/2)/N),
    row k <-> sine wavenumber k+1 (the natural ordering of build_spectral's
    eigenvalues). S is orthogonal, so the inverse transform is S.T."""
    k = np.arange(N)[:, None]
    i = np.arange(N)[None, :]
    S = np.sin(np.pi * (k + 1) * (i + 0.5) / N)
    c = np.full(N, np.sqrt(2.0 / N))
    c[-1] = np.sqrt(1.0 / N)
    return (c[:, None] * S).astype(dtype)


# MXU precision for the f32 matmul transforms: HIGH (3-pass bf16) measures
# 4.6e-5 max relative error on a full transform roundtrip at N = 2048 —
# ~20x tighter than the reference's multigrid tolerance 1e-3
# (/root/reference/msqg/qg.h:159) — at 3x the speed of HIGHEST and ~3x the
# speed of the FFT lowering (tools/dst_experiment.py, PERF.md).
_MM_PRECISION = jax.lax.Precision.HIGH


def _sign(N: int, dtype) -> np.ndarray:
    return ((-1.0) ** np.arange(N)).astype(dtype)


def fourier_matrix(N: int, dtype=np.float64):
    """Orthonormal REAL eigenbasis of the periodic 1-D discrete Laplacian
    (N even): row 0 = 1/sqrt(N); rows (2m-1, 2m) = sqrt(2/N) cos/sin of
    frequency m for m = 1..N/2-1; row N-1 = (-1)^i/sqrt(N) (Nyquist).
    Returns (R, freq): R orthogonal with R L R^T = diag over the returned
    per-row frequencies — the periodic-basis counterpart of dst_matrix, so
    the sharded matmul transform covers both BCs with one algorithm."""
    assert N % 2 == 0, "fourier_matrix requires even N"
    i = np.arange(N)
    R = np.empty((N, N))
    freq = np.empty(N)
    R[0] = 1.0 / np.sqrt(N)
    freq[0] = 0
    for m in range(1, N // 2):
        ph = 2.0 * np.pi * m * i / N
        R[2 * m - 1] = np.sqrt(2.0 / N) * np.cos(ph)
        R[2 * m] = np.sqrt(2.0 / N) * np.sin(ph)
        freq[2 * m - 1] = freq[2 * m] = m
    R[N - 1] = ((-1.0) ** i) / np.sqrt(N)
    freq[N - 1] = N // 2
    return R.astype(dtype), freq


def dst2(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Orthonormalized DST-II along `axis` (output index j <-> sine k=j+1)."""
    N = x.shape[axis]
    shape = [1] * x.ndim
    shape[axis] = N
    s = jnp.asarray(_sign(N, x.dtype)).reshape(shape)
    c = jfft.dct(x * s, type=2, axis=axis, norm="ortho")
    return jnp.flip(c, axis)


def idst2(X: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inverse of dst2 (exact adjoint under norm='ortho')."""
    N = X.shape[axis]
    shape = [1] * X.ndim
    shape[axis] = N
    s = jnp.asarray(_sign(N, X.dtype)).reshape(shape)
    z = jfft.idct(jnp.flip(X, axis), type=2, axis=axis, norm="ortho")
    return z * s


def build_spectral(*, nl: int, N: int, L0: float, dh=None, s_profile=None,
                   lam=None, periodic: bool, dtype,
                   transform: str = "auto",
                   force_matmul: bool = False,
                   refine: str | bool = "auto") -> SpectralData:
    """Precompute the modal inverse denominators.

    Either s_profile — (nl-1,) uniform stretching values (Fr/Ro)^2, vertical
    coupling diagonalized via eigmod — or lam: (nl,) explicit per-layer
    Helmholtz coefficients for already-decoupled layers (e.g. newqg's
    -iRd2_low, /root/reference/newqg/qg.h:148-157). nl=1 with neither is the
    plain Poisson case.
    """
    h = L0 / N
    if lam is not None:
        iBu = np.asarray(lam, np.float64).reshape(nl)
        l2m = m2l = None
    elif nl > 1:
        from msom_tpu.ops import modes as modes_mod
        vm = modes_mod.eigmod(np.asarray(dh, np.float64)[:nl],
                              np.asarray(s_profile, np.float64))
        iBu = np.asarray(vm.iBu, np.float64)                # (nl,)
        l2m = jnp.asarray(vm.l2m, dtype)
        m2l = jnp.asarray(vm.m2l, dtype)
    else:
        iBu = np.zeros(1)
        l2m = m2l = None

    # Transform selection (measured in tools/dst_experiment.py / PERF.md):
    # the DST as one MXU matmul per axis beats the FFT lowering ~3x in f32
    # on TPU (O(N^3) flops are cheap, the FFT's shuffles are not); keep the
    # FFT for f64 (matmul precision flags only help f32) and for huge N
    # where O(N^3) finally loses. `force_matmul` (the sharded path — the
    # matmul basis is the only transform with an explicit-collective
    # decomposition, parallel/spectral_shard.py) builds the basis matrix
    # for EITHER BC: periodic gets the real cos/sin eigenbasis.
    # Folded (Lee even/odd) matmul DST — measured 1.5-1.8x faster than the
    # direct matmul at N = 1024-2048 with slightly SMALLER error
    # (tools/ctdst_experiment.py, PERF.md r4). "auto" picks it for the f32
    # Dirichlet power-of-2 cases; force_matmul (the sharded path) and
    # refine need the single-matrix basis with NATURALLY-ordered inv_den,
    # so they keep the direct form.
    if transform == "factored" and force_matmul:
        raise ValueError("transform='factored' is incompatible with "
                         "force_matmul (the sharded path needs the "
                         "naturally-ordered single-matrix basis)")
    # auto-fold upper bound mirrors use_mm's N <= 4096: the folded matmul is
    # benchmarked at 1024-2048 (PERF.md r4); beyond 4096 the O(N^2 log N)
    # FFT lowering should win and the cubic-flop path is unmeasured.
    use_fac = (not force_matmul) and (
        transform == "factored"
        or (transform == "auto" and jnp.dtype(dtype).itemsize == 4
            and not periodic and 512 <= N <= 4096 and N & (N - 1) == 0))
    if use_fac and periodic:
        raise ValueError("transform='factored' covers the Dirichlet (DST) "
                         "basis only; periodic keeps the rfft/matmul paths")
    if transform == "factored" and refine is True:
        raise ValueError("transform='factored' and refine are mutually "
                         "exclusive (refinement needs the naturally-ordered "
                         "single-matrix basis)")
    use_mm = force_matmul or transform == "matmul" or (
        transform == "auto" and jnp.dtype(dtype).itemsize == 4
        and N <= 4096 and not periodic)

    S = None
    if periodic and use_mm:
        R, freq = fourier_matrix(N)
        S = jnp.asarray(R, dtype)
        lam_y = lam_x = -(4.0 / h ** 2) * np.sin(np.pi * freq / N) ** 2
    elif periodic:
        ky = np.arange(N, dtype=np.float64)
        kx = np.arange(N // 2 + 1, dtype=np.float64)
        lam_y = -(4.0 / h ** 2) * np.sin(np.pi * ky / N) ** 2
        lam_x = -(4.0 / h ** 2) * np.sin(np.pi * kx / N) ** 2
    else:
        k = np.arange(1, N + 1, dtype=np.float64)
        lam_d = -(4.0 / h ** 2) * np.sin(np.pi * k / (2 * N)) ** 2
        lam_y = lam_x = lam_d
        if use_mm:
            S = jnp.asarray(dst_matrix(N), dtype)

    den = (lam_y[None, :, None] + lam_x[None, None, :]
           + iBu[:, None, None])                            # (nl, N, Kx)
    with np.errstate(divide="ignore"):
        inv = np.where(den != 0.0, 1.0 / np.where(den != 0.0, den, 1.0), 0.0)

    # bf16 transforms + one f32 iterative-refinement pass: DEFAULT-precision
    # MXU matmuls for all transform passes (1 bf16 pass each vs HIGH's 3),
    # then r = q - L psi in modal space and one more DEFAULT-precision
    # solve of the correction.
    #
    # MEASURED on real TPU v5e at 2048^2 x 4 (PERF.md, r3) and REJECTED as
    # a default, on both axes:
    #  * speed: HIGH solve 6.31 ms, refine 7.35 ms, single DEFAULT 3.13 ms
    #    (scan-chained) — the end-to-end DEFAULT solve costs ~half of HIGH
    #    (fixed non-MXU overhead), so any two-solve refinement scheme
    #    loses to one HIGH solve;
    #  * accuracy: at N = 2048 the bf16 input rounding is amplified by the
    #    Poisson conditioning (~(N/pi)^2) — DEFAULT sol_err 0.69 relative,
    #    and ONE refinement pass does not contract it (0.63; the correction
    #    solve has the same DEFAULT-grade error on a same-norm system), vs
    #    HIGH 2.1e-3 with residual 3.5e-5 << the reference tol 1e-3
    #    (tools/refine_error.py).
    # Default is therefore the single HIGH-precision solve. refine=True
    # remains for small N where the conditioning is mild (on CPU f32 the
    # algebra is validated by tests/test_spectral.py).
    if refine == "auto":
        refine = False
    fac = None
    if use_fac and not refine:
        from msom_tpu.solvers import ctdst
        fac, perm = ctdst.build_fold(N, dtype)
        if fac is None:
            raise ValueError(f"transform='factored' needs a power-of-2 "
                             f"N >= 32, got {N}")
        # the folded transform emits modes in a permuted order (ctdst
        # docstring); permute the diagonal denominator once here instead
        # of shuffling data at runtime
        inv = inv[:, perm][:, :, perm]
        if S is None:
            # keep the basis for the refinement stencil/sharded consumers
            S = jnp.asarray(dst_matrix(N), dtype)
    return SpectralData(inv_den=jnp.asarray(inv, dtype), l2m=l2m, m2l=m2l,
                        S=S, iBu=jnp.asarray(iBu, dtype), periodic=periodic,
                        delta=h, refine=bool(refine), fac=fac)


def _mm_solve(data: SpectralData, qm: jnp.ndarray, precision) -> jnp.ndarray:
    """One basis-matmul solve pass in modal space. S rows are in the natural
    eigen ordering (DST: k <-> sin k+1, the ordering dst2 produces after its
    flip; periodic: fourier_matrix rows) — the same ordering inv_den is
    built in, so the matmul and fast-transform paths share inv_den verbatim
    (asserted by tests/test_spectral.py)."""
    S = data.S
    Q = jnp.einsum("ki,myi->myk", S, qm, precision=precision)
    Q = jnp.einsum("kj,mjx->mkx", S, Q, precision=precision)
    P = Q * data.inv_den
    pm = jnp.einsum("jk,mkx->mjx", S.T, P, precision=precision)
    return jnp.einsum("ik,myk->myi", S.T, pm, precision=precision)


def modal_residual(data: SpectralData, qm, pm, *, ghost_fn=None):
    """r_m = q_m - lap(p_m) - iBu_m p_m with the exact f32/f64 5-point
    stencil under the model BC (the refinement residual)."""
    from msom_tpu.ops.bc import BC
    from msom_tpu.ops.ghost import ghosted, laplacian_g
    bc = BC.PERIODIC if data.periodic else BC.DIRICHLET
    gf = ghost_fn if ghost_fn is not None else ghosted
    lap = laplacian_g(gf(pm, bc), data.delta)
    return qm - lap - data.iBu[:, None, None] * pm


# Modal (layer<->mode) projections are nl x nl matmuls — negligible flops,
# so run them at full f32 precision always (DEFAULT would silently round
# them to bf16 on TPU).
_MODE_PRECISION = jax.lax.Precision.HIGHEST


def solve_spectral(data: SpectralData, q: jnp.ndarray) -> jnp.ndarray:
    """psi = L^-1 q, q: (nl, N, N). Exact to roundoff on the fft/dct paths;
    on the f32 matmul path, ~5e-5 (HIGH) or ~1e-4 with 2.5x less MXU work
    (refine: DEFAULT bf16 passes + one f32 refinement) — both far below the
    reference's mg tolerance 1e-3 (/root/reference/msqg/qg.h:159)."""
    qm = q if data.l2m is None else jnp.einsum("ml,lyx->myx", data.l2m, q,
                                               precision=_MODE_PRECISION)
    if data.fac is not None and not data.refine:
        from msom_tpu.solvers import ctdst
        if isinstance(data.fac, ctdst.FoldedDST1):
            Q = ctdst.fdst1_x(data.fac, ctdst.fdst1_y(data.fac, qm))
            P = Q * data.inv_den
            pm = ctdst.ifdst1_y(data.fac, ctdst.ifdst1_x(data.fac, P))
        else:
            Q = ctdst.fdst_x(data.fac, ctdst.fdst_y(data.fac, qm))
            P = Q * data.inv_den
            pm = ctdst.ifdst_y(data.fac, ctdst.ifdst_x(data.fac, P))
    elif data.S is not None:
        if data.refine:
            pm = _mm_solve(data, qm, jax.lax.Precision.DEFAULT)
            r = modal_residual(data, qm, pm)
            pm = pm + _mm_solve(data, r, jax.lax.Precision.DEFAULT)
        else:
            from msom_tpu.solvers import pallas_spectral
            if pallas_spectral.enabled(qm.dtype, qm.shape[-1]):
                # fused kernel: all four transform matmuls + the modal
                # scale in VMEM, HBM sees one read + one write per layer
                pm = pallas_spectral.fused_mm_solve(data.S, data.inv_den,
                                                    qm)
            else:
                pm = _mm_solve(data, qm, _MM_PRECISION)
    elif data.periodic:
        Q = jnp.fft.rfft2(qm)
        P = Q * data.inv_den.astype(Q.real.dtype)
        pm = jnp.fft.irfft2(P, s=qm.shape[-2:]).astype(q.dtype)
    else:
        Q = dst2(dst2(qm, -1), -2)
        P = Q * data.inv_den
        pm = idst2(idst2(P, -2), -1)
    return pm if data.m2l is None else jnp.einsum("lm,myx->lyx", data.m2l, pm,
                                                  precision=_MODE_PRECISION)


def dst1_matrix(N: int, dtype=np.float64) -> np.ndarray:
    """Orthonormal DST-I matrix for the (N-1) INTERIOR VERTICES of an
    N-interval wall-to-wall grid: S1[k, i] = sqrt(2/N) sin(pi(k+1)(i+1)/N),
    k, i = 0..N-2. Symmetric and orthogonal; diagonalizes the 5-point
    vertex Laplacian with a ZERO boundary ring (the qg-node inversion
    system, /root/reference/qg-node/nodal-poisson.h) with eigenvalues
    -(4/h^2) sin^2(pi(k+1)/(2N))."""
    k = np.arange(N - 1)[:, None]
    i = np.arange(N - 1)[None, :]
    return (np.sqrt(2.0 / N)
            * np.sin(np.pi * (k + 1) * (i + 1) / N)).astype(dtype)


def build_spectral_node(*, nl: int, N: int, L0: float, dh=None,
                        s_profile=None, iRd2_low: float = 0.0,
                        dtype=jnp.float32) -> SpectralData:
    """Direct spectral inversion for the NODAL (vertex) PV system — the
    TPU-first replacement for the iterated vertex multigrid
    (/root/reference/qg-node/nodal-poisson.h:19-143) when the mask is the
    default wall rectangle and the stratification is horizontally uniform:
    the interior vertices with a zero ring are exactly diagonalized by the
    DST-I basis x vertical modes. One shot, residual at roundoff (vs the
    reference's TOLERANCE=1e-5 iteration), all MXU matmuls.

    s_profile: (nl-1,) uniform S2 = f^2/N^2 values; iRd2_low: the
    barotropic Helmholtz shift (qg_barotropic.h:114-118, nl == 1)."""
    h = L0 / N
    if nl > 1:
        from msom_tpu.ops import modes as modes_mod
        vm = modes_mod.eigmod(np.asarray(dh, np.float64)[:nl],
                              np.asarray(s_profile, np.float64))
        iBu = np.asarray(vm.iBu, np.float64)
        l2m = jnp.asarray(vm.l2m, dtype)
        m2l = jnp.asarray(vm.m2l, dtype)
    else:
        iBu = np.array([-float(iRd2_low)])
        l2m = m2l = None
    k = np.arange(1, N, dtype=np.float64)
    lam = -(4.0 / h ** 2) * np.sin(np.pi * k / (2 * N)) ** 2
    den = (lam[None, :, None] + lam[None, None, :] + iBu[:, None, None])
    with np.errstate(divide="ignore"):
        inv = np.where(den != 0.0, 1.0 / np.where(den != 0.0, den, 1.0), 0.0)
    # folded DST-I (ctdst.FoldedDST1) for the f32 production sizes — same
    # Lee even/odd win as the cell-centered transform (PERF.md r4)
    fac = None
    if (jnp.dtype(dtype).itemsize == 4 and N >= 512
            and N & (N - 1) == 0):
        from msom_tpu.solvers import ctdst
        fac, perm = ctdst.build_fold1(N, dtype)
        if fac is not None:
            inv = inv[:, perm][:, :, perm]
    return SpectralData(inv_den=jnp.asarray(inv, dtype), l2m=l2m, m2l=m2l,
                        S=jnp.asarray(dst1_matrix(N), dtype),
                        iBu=jnp.asarray(iBu, dtype), periodic=False,
                        delta=h, refine=False, fac=fac)


def applicable(nl: int, strl) -> bool:
    """True when strl is spatially uniform per interface (or nl == 1)."""
    if nl == 1 or strl is None:
        return True
    s = np.asarray(strl)
    return bool(np.all(s == s[:, :1, :1]))
