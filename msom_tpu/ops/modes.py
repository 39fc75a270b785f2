"""Vertical-mode decomposition of the QG stretching matrix.

Re-implements eigmod (/root/reference/msqg/eigmode.h): the nl x nl matrix
A[l, l+1] = -(Fr_l/Ro)^2/(dhc_l dh_l), A[l, l-1] = -(Fr_{l-1}/Ro)^2/
(dhc_{l-1} dh_l), diag = -sum (i.e. A = -Gamma), eigendecomposed per water
column; eigenvalues sorted ascending (barotropic first), right eigenvectors
normalized per Flierl (1978) Eq. 2.5 (sum_k dh_k vr_k^2 = H, positive at the
surface), left vectors biorthogonal (VL^T VR = I); iBu = -lambda with the
barotropic mode forced to zero.

Key re-design (SURVEY.md §7): the reference calls LAPACK dgeev per grid cell
(N^2 identical solves for uniform Ro, eigmode.h:74). Here the eigensolve runs
once per DISTINCT column — one solve for uniform stratification, a 1-D
y-batch for varRo — in NumPy at setup; the runtime cost is only the batched
layer<->mode matmuls (MXU work).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class VerticalModes(NamedTuple):
    l2m: np.ndarray    # (..., nl, nl): q_m = sum_l l2m[m, l] q_l
    m2l: np.ndarray    # (..., nl, nl): p_l = sum_m m2l[l, m] p_m
    iBu: np.ndarray    # (..., nl): -eigenvalue, iBu[0] = 0 (BT mode)
    Rd: np.ndarray     # (..., nl): deformation radii sqrt(-1/iBu), Rd[0]=inf


def stretching_matrix(dh, Fr_over_Ro2):
    """A from layer thicknesses dh (nl,) and (Fr/Ro)^2 per interface
    (..., nl-1). Returns (..., nl, nl)."""
    dh = np.asarray(dh, np.float64)
    nl = dh.shape[0]
    s = np.asarray(Fr_over_Ro2, np.float64)
    batch = s.shape[:-1]
    A = np.zeros(batch + (nl, nl))
    if nl == 1:
        return A
    dhc = 0.5 * (dh[:-1] + dh[1:])
    for l in range(nl):
        if l < nl - 1:
            up = -s[..., l] / (dhc[l] * dh[l])
            A[..., l, l + 1] = up
            A[..., l, l] -= up
        if l > 0:
            lo = -s[..., l - 1] / (dhc[l - 1] * dh[l])
            A[..., l, l - 1] = lo
            A[..., l, l] -= lo
    return A


def eigmod(dh, Fr_over_Ro2, htotal: float = 1.0) -> VerticalModes:
    """Modes for one column or a batch of columns (leading batch dims on
    Fr_over_Ro2). Mirrors eigmod's sort/normalization
    (/root/reference/msqg/eigmode.h:161-266)."""
    A = stretching_matrix(dh, Fr_over_Ro2)
    nl = A.shape[-1]
    dh = np.asarray(dh, np.float64)
    w, vr = np.linalg.eig(A)
    w = np.real(w)
    vr = np.real(vr)
    # ascending sort (barotropic lambda ~ 0 first, eigmode.h:161-171)
    order = np.argsort(w, axis=-1)
    w = np.take_along_axis(w, order, axis=-1)
    vr = np.take_along_axis(vr, order[..., None, :], axis=-1)
    # Flierl normalization + surface-positive sign (eigmode.h:213-222)
    dotp = np.sum(dh[:, None] * vr * vr, axis=-2, keepdims=True)
    sgn = np.where(vr[..., :1, :] >= 0, 1.0, -1.0)
    vr = vr * sgn * np.sqrt(htotal / dotp)
    # biorthogonal left vectors: VL^T = VR^-1 (equivalent to the reference's
    # per-mode dot-product rescaling of the LAPACK left vectors)
    l2m = np.linalg.inv(vr)
    iBu = -w
    iBu[..., 0] = 0.0
    with np.errstate(divide="ignore"):
        Rd = np.where(iBu < 0, np.sqrt(-1.0 / np.where(iBu < 0, iBu, -1.0)),
                      np.inf)
    return VerticalModes(l2m=l2m, m2l=vr, iBu=iBu, Rd=Rd)


def to_modes(modes: VerticalModes, q):
    """Layer -> mode projection as a batched matmul (MXU path).
    q: (nl, ny, nx); modes may be uniform (nl,nl), y-varying (ny,nl,nl) or
    fully varying (ny,nx,nl,nl)."""
    import jax.numpy as jnp
    l2m = jnp.asarray(modes.l2m, q.dtype)
    if l2m.ndim == 2:
        return jnp.einsum("ml,lyx->myx", l2m, q)
    if l2m.ndim == 3:
        return jnp.einsum("yml,lyx->myx", l2m, q)
    return jnp.einsum("yxml,lyx->myx", l2m, q)


def to_layers(modes: VerticalModes, p):
    import jax.numpy as jnp
    m2l = jnp.asarray(modes.m2l, p.dtype)
    if m2l.ndim == 2:
        return jnp.einsum("lm,myx->lyx", m2l, p)
    if m2l.ndim == 3:
        return jnp.einsum("ylm,myx->lyx", m2l, p)
    return jnp.einsum("yxlm,myx->lyx", m2l, p)
