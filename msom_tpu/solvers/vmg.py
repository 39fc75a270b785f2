"""Vertex (nodal) multigrid solver — the vpoisson equivalent.

Mirrors /root/reference/qg-node/nodal-poisson.h: per cycle, compute the
masked residual on the finest vertex grid, restrict it down the hierarchy
with the weighted vertex restriction, zero the correction at the coarsest
level, then sweep up relaxing and prolonging (refine_vert); add the
correction; iterate to the max-norm tolerance (NITERMAX=100, fixed
nrelax=5 by default — the nodal solver has no adaptive nrelax).

The smoother is the masked red-black version of relax_baroclinic
(/root/reference/qg-node/qg_baroclinic_ms.h:228-293): per-column vertical
tridiagonal (Thomas) with horizontal neighbours frozen, exact on each color,
and relax_barotropic (qg_barotropic.h:57-76) as the nl=1 special case with
the -iRd2_low Helmholtz shift.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from msom_tpu.ops import tridiag, vertex
from msom_tpu.solvers.mg import MGStats

NITERMAX = 100


@dataclasses.dataclass(frozen=True)
class VLevel:
    delta: float
    S2: jnp.ndarray | None    # (nl-1, n, n) f^2/N^2 at interfaces (vertex)
    lam: float                # -iRd2_low Helmholtz coefficient (barotropic)
    mask: jnp.ndarray         # (n, n)
    t0: jnp.ndarray
    cp: jnp.ndarray
    im: jnp.ndarray
    red: jnp.ndarray
    vsw: object | None = None  # pallas_vmg.VSweepData fused-sweep data


jax.tree_util.register_dataclass(
    VLevel, data_fields=["S2", "mask", "t0", "cp", "im", "red", "vsw"],
    meta_fields=["delta", "lam"])


def build_vlevels(*, nl, N, L0, S2=None, idh0=None, idh1=None,
                  iRd2_low=0.0, mask=None, dtype=jnp.float32, minlevel=1,
                  pallas=True):
    """Per-level data. S2 restricted by injection (S2.restriction =
    restriction_vert, qg_baroclinic_ms.h:424), mask by the 16-point weighted
    restriction (qg.h:419) with zero boundary ring at every level."""
    depth = int(round(np.log2(N)))
    if mask is None:
        mask = vertex.default_mask(N, dtype)
    idh0 = np.zeros(max(nl, 1)) if idh0 is None else np.asarray(idh0)
    idh1 = np.zeros(max(nl, 1)) if idh1 is None else np.asarray(idh1)
    levels = []
    S2_l, mask_l = S2, mask
    for lev in range(depth, minlevel - 1, -1):
        n = 2 ** lev + 1
        delta = L0 / 2 ** lev
        d2 = delta * delta
        if nl > 1 and S2_l is not None:
            t0 = jnp.concatenate(
                [jnp.zeros((1,) + S2_l.shape[-2:], dtype),
                 -d2 * S2_l * mask_l
                 * jnp.asarray(idh0[1:], dtype).reshape(-1, 1, 1)], 0)
            t2 = jnp.concatenate(
                [-d2 * S2_l * mask_l
                 * jnp.asarray(idh1[:-1], dtype).reshape(-1, 1, 1),
                 jnp.zeros((1,) + S2_l.shape[-2:], dtype)], 0)
            # NOTE: the reference drops the mask on t0 of the LOWER layer
            # (qg_baroclinic_ms.h:267) — a wrinkle we reproduce is not
            # meaningful since rhs is masked; keep the masked form.
        else:
            t0 = jnp.zeros((1, n, n), dtype)
            t2 = jnp.zeros((1, n, n), dtype)
        t1 = 4.0 - t0 - t2 + d2 * iRd2_low
        cp, im = tridiag.factor(t0, t1, t2)
        j = np.arange(n)
        red = jnp.asarray(((j[:, None] + j[None, :]) % 2) == 0)
        vsw = None
        if pallas:
            from msom_tpu.solvers import pallas_vmg
            t0b = jnp.broadcast_to(t0, (max(nl, 1),) + t0.shape[-2:])
            cpb = jnp.broadcast_to(cp, t0b.shape)
            imb = jnp.broadcast_to(im, t0b.shape)
            vsw = pallas_vmg.build_vsweep(t0b, cpb, imb, mask_l, dtype)
        levels.append(VLevel(delta=delta, S2=S2_l, lam=iRd2_low, mask=mask_l,
                             t0=t0, cp=cp, im=im, red=red, vsw=vsw))
        if S2_l is not None:
            S2_l = vertex.vrestrict_inject(S2_l)
        mask_l = vertex.set_ring(vertex.vrestrict_weighted16(mask_l),
                                 0., 0., 0., 0.)
    return levels


def _vlap(a, delta):
    """Masked 5-point vertex Laplacian on interior nodes; zero on the ring
    (jnp.pad, not .at[].set — see relax_v's XLA:TPU fault note)."""
    lap = (a[..., 1:-1, 2:] + a[..., 1:-1, :-2] + a[..., 2:, 1:-1]
           + a[..., :-2, 1:-1] - 4 * a[..., 1:-1, 1:-1]) / (delta * delta)
    return jnp.pad(lap, [(0, 0)] * (a.ndim - 2) + [(1, 1), (1, 1)])


def residual_v(a, b, lvl: VLevel, idh0, idh1):
    """Masked residual (residual_baroclinic, qg_baroclinic_ms.h:295-339 /
    residual_barotropic with the -iRd2_low term)."""
    res = b - _vlap(a, lvl.delta)
    if lvl.S2 is not None:
        from msom_tpu.ops.stretch import stretch
        res = res - stretch(a, lvl.S2, idh0, idh1)
    if lvl.lam != 0.0:
        res = res + lvl.lam * a    # lam = iRd2_low; operator includes -iRd2*a
    res = res * lvl.mask
    return res, jnp.max(jnp.abs(res))


def relax_v(da, res, lvl: VLevel, nrelax):
    """Red-black masked vertical-line relaxation.

    Implementation note: the neighbor sum pads with jnp.pad and the color
    update is an arithmetic blend, NOT .at[].set + boolean jnp.where — the
    scatter/select forms trip an XLA:TPU codegen fault ('TPU worker
    crashed', kernel fault class) when TWO vpoisson while-loops of this
    relaxation appear in one program at (4, 2049, 2049) — the actual root
    cause of the r4 '2048^2 vmg OOM/crash' together with the f32
    stagnation spin (see vpoisson)."""
    from msom_tpu.solvers import pallas_mg, pallas_vmg
    d2 = lvl.delta * lvl.delta
    if lvl.vsw is not None and pallas_mg.enabled(da.dtype):
        def kbody(_, da):
            return pallas_vmg.vrb_sweep(da, res, lvl.vsw, d2=d2)
        return jax.lax.fori_loop(0, nrelax, kbody, da)
    red = lvl.red.astype(da.dtype)

    def one_color(da, cmask):
        nbsum = (da[..., 1:-1, 2:] + da[..., 1:-1, :-2]
                 + da[..., 2:, 1:-1] + da[..., :-2, 1:-1])
        nb = jnp.pad(nbsum, [(0, 0)] * (da.ndim - 2) + [(1, 1), (1, 1)])
        rhs = (-d2 * res + nb) * lvl.mask
        x = tridiag.solve_factored(lvl.cp, lvl.im, lvl.t0, rhs)
        return cmask * (x * lvl.mask) + (1.0 - cmask) * da

    def body(_, da):
        da = one_color(da, red)
        da = one_color(da, 1.0 - red)
        return da

    return jax.lax.fori_loop(0, nrelax, body, da)


def vpoisson(a0, b, *, levels: Sequence[VLevel], idh0, idh1,
             tolerance=1e-5, nrelax=5, nitermax=NITERMAX,
             stall_ratio=None):
    """Solve the nodal PV inversion; returns (a, MGStats).

    In addition to the reference's absolute max-norm tolerance
    (nodal-poisson.h:119-134, TOLERANCE=1e-5 assumes f64), F32 solves stop
    when a cycle fails to reduce the residual by at least
    (1 - stall_ratio) (default 0.9): in f32 at large N the residual
    floors at the roundoff of the operator application (~3e-5 at 2048^2,
    ABOVE the reference tolerance), and without this cutoff every solve
    burned all NITERMAX=100 cycles at the floor — the actual cause of the
    r4 '2048^2 vmg OOM/crash' (a watchdog kill of the futile
    ~100 x 11-level program, not memory: the compiled step needs only
    3.7 GB). In f64 the roundoff-floor rationale does not apply, so the
    cutoff is OFF unless stall_ratio is passed explicitly (reference
    semantics: iterate to tolerance or NITERMAX)."""
    nlev = len(levels)
    if stall_ratio is None:
        stall_ratio = 0.9 if jnp.dtype(b.dtype).itemsize <= 4 \
            else float("inf")   # inf -> `progressing` is always True

    def cycle(a, res):
        pyr = [res]
        for _ in range(nlev - 1):
            pyr.append(vertex.vrestrict_weighted(pyr[-1]))
        da = jnp.zeros_like(pyr[-1])
        for k in range(nlev - 1, -1, -1):
            if k < nlev - 1:
                da = vertex.vprolong(da)
                da = vertex.set_ring(da, 0., 0., 0., 0.)
            da = relax_v(da, pyr[k], levels[k], nrelax)
        return a + da

    res0, maxres0 = residual_v(a0, b, levels[0], idh0, idh1)
    big = jnp.asarray(jnp.finfo(res0.dtype).max / 4, res0.dtype)

    def cond(state):
        a, res, resa, resp, i = state
        progressing = resa <= stall_ratio * resp
        return (i < nitermax) & ((i < 1)
                                 | ((resa > tolerance) & progressing))

    def body(state):
        a, res, resa, resp, i = state
        a = cycle(a, res)
        res, resa = residual_v(a, b, levels[0], idh0, idh1)
        return (a, res, resa, state[2], i + 1)

    a, res, resa, resp, iters = jax.lax.while_loop(
        cond, body, (a0, res0, maxres0, big, jnp.asarray(0, jnp.int32)))
    return a, MGStats(iters=iters, resb=maxres0, resa=resa,
                      nrelax=jnp.asarray(nrelax, jnp.int32))
