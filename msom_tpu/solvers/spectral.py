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
    """Precomputed inverse modal denominators + mode matrices."""
    inv_den: jnp.ndarray         # (nl, N, Kx): 1/(lam_y + lam_x + iBu_m)
    l2m: jnp.ndarray | None      # (nl, nl) layer->mode (None when nl == 1)
    m2l: jnp.ndarray | None      # (nl, nl) mode->layer
    S: jnp.ndarray | None        # (N, N) DST-II matrix (matmul transform)
    periodic: bool               # static: selects DFT vs DST basis


jax.tree_util.register_dataclass(
    SpectralData, data_fields=["inv_den", "l2m", "m2l", "S"],
    meta_fields=["periodic"])


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
                   transform: str = "auto") -> SpectralData:
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

    if periodic:
        ky = np.arange(N, dtype=np.float64)
        kx = np.arange(N // 2 + 1, dtype=np.float64)
        lam_y = -(4.0 / h ** 2) * np.sin(np.pi * ky / N) ** 2
        lam_x = -(4.0 / h ** 2) * np.sin(np.pi * kx / N) ** 2
    else:
        k = np.arange(1, N + 1, dtype=np.float64)
        lam = -(4.0 / h ** 2) * np.sin(np.pi * k / (2 * N)) ** 2
        lam_y = lam_x = lam

    den = (lam_y[None, :, None] + lam_x[None, None, :]
           + iBu[:, None, None])                            # (nl, N, Kx)
    with np.errstate(divide="ignore"):
        inv = np.where(den != 0.0, 1.0 / np.where(den != 0.0, den, 1.0), 0.0)

    # Transform selection (measured in tools/dst_experiment.py / PERF.md):
    # the DST as one MXU matmul per axis beats the FFT lowering ~3x in f32
    # on TPU (O(N^3) flops are cheap, the FFT's shuffles are not); keep the
    # FFT for f64 (matmul precision flags only help f32) and for huge N
    # where O(N^3) finally loses, and for the periodic/DFT basis.
    S = None
    if not periodic:
        use_mm = (transform == "matmul"
                  or (transform == "auto" and jnp.dtype(dtype).itemsize == 4
                      and N <= 4096))
        if use_mm:
            S = jnp.asarray(dst_matrix(N), dtype)
    return SpectralData(inv_den=jnp.asarray(inv, dtype), l2m=l2m, m2l=m2l,
                        S=S, periodic=periodic)


def solve_spectral(data: SpectralData, q: jnp.ndarray) -> jnp.ndarray:
    """psi = L^-1 q, exactly (to roundoff), q: (nl, N, N)."""
    qm = q if data.l2m is None else jnp.einsum("ml,lyx->myx", data.l2m, q)
    if data.periodic:
        Q = jnp.fft.rfft2(qm)
        P = Q * data.inv_den.astype(Q.real.dtype)
        pm = jnp.fft.irfft2(P, s=qm.shape[-2:]).astype(q.dtype)
    elif data.S is not None:
        # DST-II as MXU matmuls. S rows are in the natural sine ordering
        # (k <-> sin k+1) — the same ordering dst2 produces after its flip
        # and the ordering inv_den is built in, so the two paths share
        # inv_den verbatim (asserted by tests/test_spectral.py).
        p = _MM_PRECISION
        S = data.S
        Q = jnp.einsum("ki,myi->myk", S, qm, precision=p)
        Q = jnp.einsum("kj,mjx->mkx", S, Q, precision=p)
        P = Q * data.inv_den
        pm = jnp.einsum("jk,mkx->mjx", S.T, P, precision=p)
        pm = jnp.einsum("ik,myk->myi", S.T, pm, precision=p)
    else:
        Q = dst2(dst2(qm, -1), -2)
        P = Q * data.inv_den
        pm = idst2(idst2(P, -2), -1)
    return pm if data.m2l is None else jnp.einsum("lm,myx->lyx", data.m2l, pm)


def applicable(nl: int, strl) -> bool:
    """True when strl is spatially uniform per interface (or nl == 1)."""
    if nl == 1 or strl is None:
        return True
    s = np.asarray(strl)
    return bool(np.all(s == s[:, :1, :1]))
