"""Sharded geometric multigrid under shard_map (explicit-collective path).

Mirrors solvers.mg.solve_layered on a ('y', 'x') device mesh:

* fine levels stay domain-decomposed — relaxation/residual use
  halo.ghosted_sharded (ppermute halos per red-black color, the sharded
  `boundary_level()`), restriction is local, prolongation exchanges one
  coarse halo cell;
* levels whose local tile would drop below 2x2 cells are REPLICATED: the
  residual is all-gathered once and the remaining V-cycle tail runs
  redundantly (and identically) on every device — the reference's
  'traversal to grids smaller than the rank count' (SURVEY.md §2.5
  multilevel communication) without per-level gather chatter;
* the convergence test is a pmax of the local residual max-norms, so every
  device runs the same while_loop trip count.

All functions here are LOCAL-VIEW: they must be called inside shard_map
(msom_tpu.parallel.step.make_qg_step_sharded wires the full model step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from msom_tpu.ops import tridiag
from msom_tpu.ops.bc import BC, pad
from msom_tpu.ops.ghost import laplacian_g, neighbor_sum
from msom_tpu.ops.stretch import stretch
from msom_tpu.parallel import halo
from msom_tpu.solvers import mg

NITERMAX = mg.NITERMAX


def level_is_sharded(n_global: int, my: int, mx: int) -> bool:
    """A level stays domain-decomposed while each device keeps >= 2x2 cells
    (so restriction stays local and the checkerboard parity of every tile
    origin stays even)."""
    return (n_global % (2 * my) == 0 and n_global % (2 * mx) == 0
            and n_global // my >= 2 and n_global // mx >= 2)


def level_specs(levels, my: int, mx: int):
    """PartitionSpec pytree for a solvers.mg levels list: fine (sharded)
    levels split their (.., n, n) coefficient fields, replicated-tail levels
    and sub-2D leaves stay replicated."""
    from jax.sharding import PartitionSpec as P

    def spec_of(lvl):
        n = lvl.red.shape[-1]
        sharded = level_is_sharded(n, my, mx)

        def leaf_spec(x):
            if (sharded and hasattr(x, "ndim") and x.ndim >= 2
                    and x.shape[-1] == n and x.shape[-2] == n):
                return P(*([None] * (x.ndim - 2) + ["y", "x"]))
            return P()

        return jax.tree.map(leaf_spec, lvl)

    return [spec_of(lvl) for lvl in levels]


def _relax_sharded(da, res, lvl, nrelax, bc: BC):
    """Red-black line relaxation with a ppermute halo refresh per color.
    With halo.overlap_enabled() the neighbor sum uses the overlapped form:
    ppermutes issue first, the interior is computed from local rolls, the
    rim consumes the ghosts (bitwise-identical either way)."""
    d2 = lvl.delta * lvl.delta
    overlap = halo.overlap_enabled()

    def one_color(da, mask):
        if overlap:
            nb = halo.neighbor_sum_overlap(da, bc)
        else:
            nb = neighbor_sum(halo.ghosted_sharded(da, bc))
        rhs = -d2 * res + nb
        x = tridiag.solve_factored(lvl.cp, lvl.im, lvl.t0, rhs)
        return jnp.where(mask, x, da)

    def body(_, da):
        da = one_color(da, lvl.red)
        da = one_color(da, ~lvl.red)
        return da

    return jax.lax.fori_loop(0, nrelax, body, da)


def _residual_sharded(a, b, lvl, bc: BC, idh0, idh1):
    if halo.overlap_enabled():
        lap = halo.laplacian_overlap(a, bc, lvl.delta)
    else:
        lap = laplacian_g(halo.ghosted_sharded(a, bc), lvl.delta)
    res = b - lap
    if lvl.s is not None:
        res = res - stretch(a, lvl.s, idh0, idh1)
    if lvl.lam is not None:
        res = res - lvl.lam * a
    return res, halo.pmax2(jnp.max(jnp.abs(res)))


def _prolong_sharded(c, bc: BC):
    """Bilinear prolongation of a sharded coarse tile: materialize the
    1-cell neighbor halo (ppermute) and prolong the padded tile."""
    P = halo.ghosted_sharded(c, bc).padded()
    cc = P[..., 1:-1, 1:-1]
    w, e = P[..., 1:-1, :-2], P[..., 1:-1, 2:]
    s_, n_ = P[..., :-2, 1:-1], P[..., 2:, 1:-1]
    sw, se = P[..., :-2, :-2], P[..., :-2, 2:]
    nw, ne = P[..., 2:, :-2], P[..., 2:, 2:]
    f00 = 9 * cc + 3 * w + 3 * s_ + sw
    f01 = 9 * cc + 3 * e + 3 * s_ + se
    f10 = 9 * cc + 3 * w + 3 * n_ + nw
    f11 = 9 * cc + 3 * e + 3 * n_ + ne
    ny, nx = cc.shape[-2], cc.shape[-1]
    out = jnp.stack([jnp.stack([f00, f01], -1), jnp.stack([f10, f11], -1)],
                    -3)
    return (out / 16.0).reshape(*c.shape[:-2], 2 * ny, 2 * nx)


def solve_layered_sharded(a0, b, *, levels, my: int, mx: int,
                          idh0, idh1, bc: BC = BC.DIRICHLET,
                          tolerance: float = 1e-3, nrelax0: int = 4,
                          nitermax: int = NITERMAX,
                          sharded_flags=None):
    """Local-view solve_layered. a0, b: the device's (nl, ny_l, nx_l) shard;
    `levels` the per-device view of the levels list (fine levels sharded,
    tail replicated, matching level_specs). `sharded_flags[k]` marks which
    levels are domain-decomposed — it must be computed from the GLOBAL level
    shapes (inside shard_map only local shapes are visible); defaults to
    level_is_sharded on the finest level's GLOBAL size reconstructed from
    the local shard (local * my)."""
    nlev = len(levels)
    if sharded_flags is None:
        n0 = levels[0].red.shape[-2] * my   # finest global size
        sharded_flags = [level_is_sharded(n0 >> k, my, mx)
                         for k in range(nlev)]
    sharded = list(sharded_flags)

    def relax_k(k, da, res, nrelax):
        if sharded[k]:
            return _relax_sharded(da, res, levels[k], nrelax, bc)
        return mg._relax_layered(da, res, levels[k], nrelax, bc)

    def cycle(a, res, nrelax):
        # restrict the residual down the hierarchy; gather to replicated at
        # the first non-sharded level
        pyr = [res]
        for k in range(1, nlev):
            r = mg.restrict_cell(pyr[-1])
            if sharded[k - 1] and not sharded[k]:
                r = halo.gather_global(r)
            pyr.append(r)
        da = jnp.zeros_like(pyr[-1])
        for k in range(nlev - 1, -1, -1):
            if k < nlev - 1:
                if sharded[k + 1]:
                    da = _prolong_sharded(da, bc)
                else:
                    da = mg.prolong_bilinear(da, bc)
                    if sharded[k]:   # replicated -> sharded boundary
                        da = halo.local_tile(da, my, mx)
            da = relax_k(k, da, pyr[k], nrelax)
        return a + da

    def residual0(a):
        if sharded[0]:
            return _residual_sharded(a, b, levels[0], bc, idh0, idh1)
        res, _ = mg._residual_layered(a, b, levels[0], bc, idh0, idh1)
        return res, halo.pmax2(jnp.max(jnp.abs(res)))

    res0, maxres0 = residual0(a0)

    def cond(state):
        a, res, resa, nrelax, i = state
        return (i < nitermax) & ((i < 1) | (resa > tolerance))

    def body(state):
        a, res, resa, nrelax, i = state
        a = cycle(a, res, nrelax)
        res, resa_new = residual0(a)
        ratio = resa / jnp.maximum(resa_new, 1e-300)
        nrelax = jnp.where((resa_new > tolerance) & (ratio < 1.2)
                           & (nrelax < 100), nrelax + 1, nrelax)
        nrelax = jnp.where((resa_new > tolerance) & (ratio > 10.0)
                           & (nrelax > 2), nrelax - 1, nrelax)
        return (a, res, resa_new, nrelax, i + 1)

    state = (a0, res0, maxres0, jnp.asarray(nrelax0, jnp.int32),
             jnp.asarray(0, jnp.int32))
    a, res, resa, nrelax, iters = jax.lax.while_loop(cond, body, state)
    return a, mg.MGStats(iters=iters, resb=maxres0, resa=resa, nrelax=nrelax)
