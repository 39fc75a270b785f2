"""Level-hierarchy wavelet transform and the scale-selective filter.

Re-implements Basilisk's wavelet/inverse_wavelet pair (the masked variant is
documented at /root/reference/qg-node/wavelet_vertex.h:10-46) and the msqg
wavelet_filter (/root/reference/msqg/qg.h:509-560): per-level detail
coefficients w_l = s_l - P(s_{l-1}) (P = bilinear prolongation with the
field's BC at each level, restriction = 4-cell average), damped per level by
the sig_lev low/high-pass weights computed from the local deformation-radius
filter scale (/root/reference/msqg/qg.h:1052-1090), then reconstructed.

Here the pyramid is an explicit tuple of (nl, 2^l, 2^l) arrays — a static
structure XLA unrolls into one fused program. The filter runs inside the time
loop every dtflt (it is a capability of the dynamical core, not just an
output diagnostic — SURVEY.md §5.7)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from msom_tpu.ops.bc import BC
from msom_tpu.solvers.mg import prolong_bilinear, restrict_cell


def wavelet(s: jnp.ndarray, bc: BC, mask_pyramid=None):
    """Forward transform: returns tuple (w_0, ..., w_depth), w_l of shape
    (..., 2^l, 2^l); w_0 is the root-cell average, w_l the detail at level l.
    With mask_pyramid (qg-node wavelet_mask), each level is multiplied by the
    mask."""
    N = s.shape[-1]
    depth = int(round(np.log2(N)))
    pyr = [s]
    for _ in range(depth):
        pyr.append(restrict_cell(pyr[-1]))
    pyr.reverse()  # pyr[l] = field at level l
    w = [pyr[0]]
    for l in range(1, depth + 1):
        w.append(pyr[l] - prolong_bilinear(pyr[l - 1], bc))
    if mask_pyramid is not None:
        w = [wl * ml for wl, ml in zip(w, mask_pyramid)]
    return tuple(w)


def inverse_wavelet(w, bc: BC, mask_pyramid=None):
    """Reconstruct the finest-level field from the detail pyramid."""
    if mask_pyramid is not None:
        s = w[0] * mask_pyramid[0]
        for l in range(1, len(w)):
            s = (prolong_bilinear(s, bc) + w[l]) * mask_pyramid[l]
        return s
    s = w[0]
    for l in range(1, len(w)):
        s = prolong_bilinear(s, bc) + w[l]
    return s


def sig_lev_pyramid(sig_filt: np.ndarray, L0: float, highpass: bool = True):
    """Per-level filter weights from the spatially-varying cutoff scale
    sig_filt (finest-level (N, N) array), /root/reference/msqg/qg.h:1063-1090.

    Low-pass value at level l (cell size Delta_l): 0 where sig_filt > 2*Delta,
    a linear ramp on (Delta, 2*Delta], else 1 — with the child-propagation
    rule: any cell whose children have nonzero weight gets 1. The returned
    pyramid is the high-pass complement (1 - lowpass) unless highpass=False.
    Returns a tuple of (2^l, 2^l) numpy arrays, l = 0..depth."""
    N = sig_filt.shape[-1]
    depth = int(round(np.log2(N)))
    # restriction of sig_filt to all levels
    sf = [np.asarray(sig_filt, np.float64)]
    for _ in range(depth):
        s = sf[-1]
        sf.append(0.25 * (s[::2, ::2] + s[1::2, ::2] + s[::2, 1::2]
                          + s[1::2, 1::2]))
    sf.reverse()  # sf[l] at level l
    sig = [None] * (depth + 1)
    for l in range(depth, -1, -1):
        delta = L0 / 2 ** l
        s = sf[l]
        base = np.where(s > 2 * delta, 0.0,
                        np.where(s > delta, 1.0 - (s - delta) / delta, 1.0))
        if l < depth:
            ch = sig[l + 1]
            ref_flag = (ch[::2, ::2] + ch[1::2, ::2] + ch[::2, 1::2]
                        + ch[1::2, 1::2])
            base = np.where(ref_flag > 0, 1.0, base)
        sig[l] = base
    if highpass:
        sig = [1.0 - s for s in sig]
    return tuple(sig)


def filter_field(s: jnp.ndarray, sig_pyramid, bc: BC, mask_pyramid=None):
    """Scale-selective filter of one (possibly layered) field: transform,
    damp each level by sig_pyramid[l], reconstruct
    (/root/reference/msqg/qg.h:524-540)."""
    w = wavelet(s, bc, mask_pyramid)
    w = tuple(wl * jnp.asarray(sl, s.dtype) for wl, sl in zip(w, sig_pyramid))
    return inverse_wavelet(w, bc, mask_pyramid)


def wavelet_filter_step(cfg, const, state):
    """The msqg filter event (wavelet_filter, /root/reference/msqg/qg.h:509-560):
    invert PV, filter psi keeping small scales, recompute q, and accumulate
    the filter-mean PV flux qof = mean over the window of (q_pre - q_post)/dtflt."""
    from msom_tpu.models import qg as m

    q_pre = state.q
    psi, _ = m.invert_q(cfg, const, state.psi, state.q)
    bc = BC.PERIODIC if cfg.sbc == -1 else BC.DIRICHLET
    psi_f = filter_field(psi, const.sig_lev, bc)
    q_post = m.comp_q(cfg, const, psi_f)
    nbar = state.nbar if state.nbar is not None else jnp.asarray(0, jnp.int32)
    qof = state.qof if state.qof is not None else jnp.zeros_like(q_pre)
    qof = (qof * nbar + (q_pre - q_post) / cfg.dtflt) / (nbar + 1)
    return dataclass_replace(state, q=q_post, psi=psi_f, qof=qof,
                             nbar=nbar + 1)


def dataclass_replace(obj, **kw):
    import dataclasses
    return dataclasses.replace(obj, **kw)
