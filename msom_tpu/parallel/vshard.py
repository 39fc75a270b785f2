"""Vertex-grid sharding — the inner-vertex.h problem, TPU-native.

The reference solves shared-node ownership under MPI decomposition with
index-trimmed iterators (/root/reference/qg-node/inner-vertex.h:10-74) and
warns about double-counted boundary vertices in reductions
(/root/reference/qg-node/qg.h:377-380). Here the convention is explicit:

**Owned-node representation.** A global (nl, N+1, N+1) vertex field is
stored as its (nl, N, N) "owned" block — rows/cols 0..N-1 — which shards
evenly over a ('y', 'x') device mesh. A node shared by two tiles is OWNED
by the lower/left tile; the upper tile sees it as a ppermute halo. The
dropped global row/col N is the wall ring, whose values are either
identically zero (psi after bc_psi; every multigrid field, which is
masked/ring-zeroed) or a frozen partial-slip value set once by comp_q's
bc_deriv (the q ring) — carried as a small replicated `VertexRing` and
injected as halo ghosts where stencils read it. Reductions (KE, CFL,
residual max-norms) run over owned nodes only + pmax/psum — no vertex is
ever double-counted, by construction.

The sharded vertex multigrid (vpoisson_sharded) mirrors
parallel.shard_mg: fine levels stay domain-decomposed with halo exchanges
per red-black color and across restriction/prolongation; levels whose tile
would drop below 2x2 are all-gathered once and the V-cycle tail runs
replicated (and identically) on every device, using the unsharded
solvers.vmg kernels on full (2^k+1)^2 arrays.

Bitwise contract: every op reproduces the unsharded models.qg_node /
solvers.vmg arithmetic term-for-term (same association order), so a
sharded step equals the single-device step bit-for-bit —
tests/test_shard_vertex.py asserts exact equality on the 8-device CPU mesh.

Full-model scope (v2): topography (its dropped ring rides replicated like
the q ring), 3-D forcing (owned tiles), the stochastic kick (the
spatially-correlated noise field is generated REPLICATED from the shared
per-step key and each device slices its tile — bitwise-equal to the
unsharded draw; the wavelet pyramid it runs is O(N^2) redundant work, paid
only when cfg.stochastic), and the in-loop masked wavelet filter
(make_node_filter_sharded): fine pyramid levels stay domain-decomposed
with ppermute-halo prolongation, the tail below the shard_mg threshold
runs replicated — the filter also re-freezes the dropped q ring, which
comp_q rewrites from the filtered psi.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from msom_tpu.models import qg_node as node
from msom_tpu.ops import tridiag, vertex
from msom_tpu.ops.ghost import Ghosted, arakawa_mjac_g
from msom_tpu.ops.stretch import stretch
from msom_tpu.parallel import halo
from msom_tpu.solvers import vmg
from msom_tpu.solvers.mg import MGStats


# ---------------------------------------------------------------------------
# owned-node representation
# ---------------------------------------------------------------------------

def to_owned(a_full: jnp.ndarray) -> jnp.ndarray:
    """(..., N+1, N+1) -> (..., N, N): drop the wall ring row/col N."""
    return a_full[..., :-1, :-1]


def to_full(a_own: jnp.ndarray, ring_row=None, ring_col=None, corner=0.0):
    """Reattach the dropped ring (defaults to zeros: correct for psi and all
    solver fields). ring_row: (..., N) values of global row N over cols
    0..N-1; ring_col: (..., N) of col N over rows 0..N-1."""
    n = a_own.shape[-1]
    if ring_row is None:
        ring_row = jnp.zeros(a_own.shape[:-2] + (n,), a_own.dtype)
    if ring_col is None:
        ring_col = jnp.zeros(a_own.shape[:-2] + (n,), a_own.dtype)
    top = jnp.concatenate(
        [ring_row, jnp.full(a_own.shape[:-2] + (1,), corner, a_own.dtype)],
        axis=-1)
    mid = jnp.concatenate([a_own, ring_col[..., :, None]], axis=-1)
    return jnp.concatenate([mid, top[..., None, :]], axis=-2)


@dataclasses.dataclass(frozen=True)
class VertexRing:
    """The frozen dropped-ring values of q (set once by comp_q's bc_deriv,
    /root/reference/qg-node/qg.h:211-214; never updated because dq is
    masked). Replicated — O(N) data."""
    q_top: jnp.ndarray     # (nl, N): q[.., N, :N]
    q_right: jnp.ndarray   # (nl, N): q[.., :N, N]


jax.tree_util.register_dataclass(
    VertexRing, data_fields=["q_top", "q_right"], meta_fields=[])


# ---------------------------------------------------------------------------
# local-view halo exchange (inside shard_map)
# ---------------------------------------------------------------------------

def _local_slice(vec, axis_name, ln):
    """This tile's length-ln slice of a replicated global edge vector."""
    i = lax.axis_index(axis_name)
    return lax.dynamic_slice_in_dim(vec, i * ln, ln, axis=-1)


def vghost(a: jnp.ndarray, high_row=None, high_col=None,
           ym: str = "y", xm: str = "x") -> Ghosted:
    """Ghosted view of an owned-rep vertex tile.

    Interior tile edges receive the neighbor's edge data (ppermute); the
    global LOW walls (beyond row/col 0 — only ever read by ring outputs that
    are masked to zero) get zero ghosts; the global HIGH walls (the dropped
    ring row/col N) get `high_row`/`high_col` — zeros for psi/solver fields,
    slip values for zeta-like fields, the frozen VertexRing for q. high_row
    is this tile's (..., nx_l) slice; its corner extensions come from the
    x-neighbor exchange of the same slip row (global corners are zero,
    matching bc_deriv's corners=0)."""
    yi, xi = lax.axis_index(ym), lax.axis_index(xm)
    ny, nx = lax.axis_size(ym), lax.axis_size(xm)

    left_recv = halo._shift_from_prev(a[..., :, -1], xm, False)
    right_recv = halo._shift_from_next(a[..., :, 0], xm, False)
    zc = jnp.zeros_like(a[..., :, 0])
    gl = jnp.where(xi == 0, zc, left_recv)
    hc = zc if high_col is None else high_col
    gr = jnp.where(xi == nx - 1, hc, right_recv)

    top_ext = jnp.concatenate([gl[..., -1:], a[..., -1, :], gr[..., -1:]],
                              axis=-1)
    bot_ext = jnp.concatenate([gl[..., :1], a[..., 0, :], gr[..., :1]],
                              axis=-1)
    gb_recv = halo._shift_from_prev(top_ext, ym, False)
    gt_recv = halo._shift_from_next(bot_ext, ym, False)
    gb = jnp.where(yi == 0, jnp.zeros_like(bot_ext), gb_recv)
    if high_row is None:
        row_t = jnp.zeros_like(top_ext)
    else:
        # corner entries: the x-neighbor's adjacent slip value; zero at the
        # global x-walls (global ring corners are 0, vertex.bc_deriv)
        cl = halo._shift_from_prev(high_row[..., -1], xm, False)
        cr = halo._shift_from_next(high_row[..., 0], xm, False)
        zs = jnp.zeros_like(high_row[..., 0])
        cl = jnp.where(xi == 0, zs, cl)
        cr = jnp.where(xi == nx - 1, zs, cr)
        row_t = jnp.concatenate([cl[..., None], high_row, cr[..., None]],
                                axis=-1)
    gt = jnp.where(yi == ny - 1, row_t, gt_recv)
    return Ghosted(a, gl, gr, gb, gt)


def _grow_gcol(a, ym="y", xm="x"):
    """(global_row, global_col) index grids of this tile's owned nodes."""
    ny_l, nx_l = a.shape[-2], a.shape[-1]
    gy = lax.broadcasted_iota(jnp.int32, (ny_l, nx_l), 0) \
        + lax.axis_index(ym) * ny_l
    gx = lax.broadcasted_iota(jnp.int32, (ny_l, nx_l), 1) \
        + lax.axis_index(xm) * nx_l
    return gy, gx


def bc_psi_own(psi):
    """vertex.bc_psi on owned rep: zero the stored global ring row/col 0
    (the dropped row/col N is implicitly zero)."""
    gy, gx = _grow_gcol(psi)
    ring = (gy == 0) | (gx == 0)
    return jnp.where(ring[None] if psi.ndim == 3 else ring,
                     jnp.zeros((), psi.dtype), psi)


def bc_deriv_own(field, psi, bc_fac, delta):
    """vertex.bc_deriv on owned rep: the STORED ring (global row/col 0) gets
    2*bc_fac/Delta^2 * psi(first interior); corners 0. The dropped ring is
    supplied at read time via slip_high(...) ghosts."""
    c = 2.0 * bc_fac / (delta * delta)
    gy, gx = _grow_gcol(field)
    # psi one node inward: global row 1 / col 1 == local row/col 1 on the
    # wall tiles (ny_l >= 2 enforced by the sharding rule)
    up = jnp.roll(psi, -1, axis=-2)     # value from the row above
    right = jnp.roll(psi, -1, axis=-1)
    out = jnp.where((gy == 0)[None], c * up, field)
    out = jnp.where((gx == 0)[None], c * right, out)
    corner = (gy == 0) & (gx == 0)
    return jnp.where(corner[None], jnp.zeros((), field.dtype), out)


def slip_high(psi, bc_fac, delta, ym="y", xm="x"):
    """(high_row, high_col) ghosts of a zeta-like field at the dropped ring:
    2*bc_fac/Delta^2 * psi(first interior) — psi local row/col -1 IS global
    N-1 on the wall tiles (and the values are only consumed there)."""
    c = 2.0 * bc_fac / (delta * delta)
    return c * psi[..., -1, :], c * psi[..., :, -1]


def bc_deriv_rel_own(field, parent, bc_fac, delta):
    """vertex.bc_deriv_rel on owned rep (set_bc_ms's tmp relation,
    qg_baroclinic_ms.h:67-69): stored-ring value = 2*bc_fac/Delta^2 *
    (parent first interior - parent ring); corners 0."""
    c = 2.0 * bc_fac / (delta * delta)
    gy, gx = _grow_gcol(field)
    up = jnp.roll(parent, -1, axis=-2)
    right = jnp.roll(parent, -1, axis=-1)
    out = jnp.where((gy == 0)[None], c * (up - parent), field)
    out = jnp.where((gx == 0)[None], c * (right - parent), out)
    corner = (gy == 0) & (gx == 0)
    return jnp.where(corner[None], jnp.zeros((), field.dtype), out)


def slip_high_rel(parent, parent_hr, parent_hc, bc_fac, delta):
    """Dropped-ring ghosts of the tmp relation: 2*bc_fac/Delta^2 *
    (parent first interior - parent's OWN dropped-ring value)."""
    c = 2.0 * bc_fac / (delta * delta)
    return (c * (parent[..., -1, :] - parent_hr),
            c * (parent[..., :, -1] - parent_hc))


def ring_slices(ring: VertexRing, ny_l: int, nx_l: int, ym="y", xm="x"):
    """This tile's slices of the frozen q ring (consumed only by the
    top/right wall tiles)."""
    return (_local_slice(ring.q_top, xm, nx_l),
            _local_slice(ring.q_right, ym, ny_l))


# ---------------------------------------------------------------------------
# sharded vertex multigrid (vpoisson_sharded)
# ---------------------------------------------------------------------------

def _nb_sum(g: Ghosted):
    """E + W + N + S in solvers.vmg.relax_v's association order."""
    return g.shift(0, 1) + g.shift(0, -1) + g.shift(1, 0) + g.shift(-1, 0)


def _vlap_own(g: Ghosted, delta: float):
    """(E + W + N + S - 4C)/d^2 in solvers.vmg._vlap's order; ring values
    are garbage and must be masked by the caller (as _vlap's zeros are)."""
    a = g.a
    lap = (g.shift(0, 1) + g.shift(0, -1) + g.shift(1, 0) + g.shift(-1, 0)
           - 4 * a) / (delta * delta)
    return lap


def residual_v_sharded(a, b, lvl, idh0, idh1):
    """Masked residual on owned tiles (solvers.vmg.residual_v)."""
    res = b - _vlap_own(vghost(a), lvl.delta)
    if lvl.S2 is not None:
        res = res - stretch(a, lvl.S2, idh0, idh1)
    if lvl.lam != 0.0:
        res = res + lvl.lam * a
    res = res * lvl.mask
    return res, halo.pmax2(jnp.max(jnp.abs(res)))


def relax_v_sharded(da, res, lvl, nrelax):
    """Red-black masked vertical-line relaxation, halo refresh per color."""
    d2 = lvl.delta * lvl.delta

    def one_color(da, cmask):
        nb = _nb_sum(vghost(da))
        rhs = (-d2 * res + nb) * lvl.mask
        x = tridiag.solve_factored(lvl.cp, lvl.im, lvl.t0, rhs)
        return jnp.where(cmask, x * lvl.mask, da)

    def body(_, da):
        da = one_color(da, lvl.red)
        da = one_color(da, ~lvl.red)
        return da

    return jax.lax.fori_loop(0, nrelax, body, da)


def vrestrict_weighted_sharded(f):
    """ops.vertex.vrestrict_weighted on owned tiles: (2C+E+W+N+S)/6 at the
    co-located (even-index) nodes; zero beyond every wall (the unsharded
    version zero-pads, our wall ghosts are zero)."""
    g = vghost(f)
    out = (2 * f + g.shift(0, 1) + g.shift(0, -1) + g.shift(1, 0)
           + g.shift(-1, 0)) / 6.0
    return out[..., ::2, ::2]


def vprolong_sharded(c):
    """ops.vertex.vprolong on owned tiles (injection / 2-point / 4-point),
    using the dropped-ring zeros of the coarse correction as high ghosts."""
    g = vghost(c)
    E = g.shift(0, 1)
    Nn = g.shift(1, 0)
    NE = g.shift(1, 1)
    f_ee = c
    f_eo = 0.5 * (c + E)
    f_oe = 0.5 * (c + Nn)
    f_oo = 0.25 * (c + E + Nn + NE)
    ny, nx = c.shape[-2], c.shape[-1]
    row0 = jnp.stack([f_ee, f_eo], -1).reshape(*c.shape[:-2], ny, 2 * nx)
    row1 = jnp.stack([f_oe, f_oo], -1).reshape(*c.shape[:-2], ny, 2 * nx)
    out = jnp.stack([row0, row1], -2).reshape(*c.shape[:-2], 2 * ny, 2 * nx)
    return out


def level_is_sharded(n_owned: int, my: int, mx: int) -> bool:
    """Same rule as shard_mg: every tile keeps >= 2x2 owned nodes with even
    tile sizes (so red-black parity and the ::2 subsample stay aligned)."""
    return (n_owned % (2 * my) == 0 and n_owned % (2 * mx) == 0
            and n_owned // my >= 2 and n_owned // mx >= 2)


def _vlevel_owned(lvl: vmg.VLevel) -> vmg.VLevel:
    sl = lambda x: None if x is None else x[..., :-1, :-1]
    return vmg.VLevel(delta=lvl.delta, S2=sl(lvl.S2), lam=lvl.lam,
                      mask=sl(lvl.mask), t0=sl(lvl.t0), cp=sl(lvl.cp),
                      im=sl(lvl.im), red=sl(lvl.red))


def prepare_vlevels(levels, my: int, mx: int):
    """(mixed levels list, sharded_flags): owned-rep VLevels while the level
    shards, the original full-rep VLevels for the replicated tail."""
    out, flags = [], []
    for lvl in levels:
        n_owned = lvl.red.shape[-1] - 1
        s = level_is_sharded(n_owned, my, mx)
        flags.append(s)
        out.append(_vlevel_owned(lvl) if s else lvl)
    return out, tuple(flags)


def vpoisson_sharded(a0, b, *, levels, sharded_flags, my, mx, idh0, idh1,
                     tolerance=1e-5, nrelax=5, nitermax=vmg.NITERMAX):
    """Local-view vpoisson on owned tiles (mirrors solvers.vmg.vpoisson)."""
    nlev = len(levels)
    sharded = list(sharded_flags)

    def cycle(a, res):
        pyr = [res]
        for k in range(1, nlev):
            r = pyr[-1]
            if sharded[k - 1]:
                r = vrestrict_weighted_sharded(r)
                if not sharded[k]:
                    # gather the owned coarse grid, reattach the zero ring
                    r = to_full(halo.gather_global(r))
            else:
                r = vertex.vrestrict_weighted(r)
            pyr.append(r)
        da = jnp.zeros_like(pyr[-1])
        for k in range(nlev - 1, -1, -1):
            if k < nlev - 1:
                if sharded[k + 1]:
                    da = vprolong_sharded(da)
                else:
                    da = vertex.vprolong(da)
                    da = vertex.set_ring(da, 0., 0., 0., 0.)
                    if sharded[k]:   # replicated -> sharded boundary
                        da = halo.local_tile(to_owned(da), my, mx)
            if sharded[k]:
                da = relax_v_sharded(da, pyr[k], levels[k], nrelax)
            else:
                da = vmg.relax_v(da, pyr[k], levels[k], nrelax)
        return a + da

    def residual0(a):
        return residual_v_sharded(a, b, levels[0], idh0, idh1)

    res0, maxres0 = residual0(a0)

    def cond(state):
        a, res, resa, i = state
        return (i < nitermax) & ((i < 1) | (resa > tolerance))

    def body(state):
        a, res, resa, i = state
        a = cycle(a, res)
        res, resa = residual0(a)
        return (a, res, resa, i + 1)

    a, res, resa, iters = jax.lax.while_loop(
        cond, body, (a0, res0, maxres0, jnp.asarray(0, jnp.int32)))
    return a, MGStats(iters=iters, resb=maxres0, resa=resa,
                      nrelax=jnp.asarray(nrelax, jnp.int32))


# ---------------------------------------------------------------------------
# sharded node step
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VertexShardConst:
    """Owned-rep constants for the sharded qg-node step."""
    mask: jnp.ndarray
    psi_pg: jnp.ndarray
    S2: jnp.ndarray | None
    yv: jnp.ndarray
    vlevels: Any                 # mixed owned/full VLevel list
    ring: VertexRing             # frozen q ring (replicated)
    topo: jnp.ndarray | None     # owned (N, N) bottom topography
    topo_top: jnp.ndarray | None   # (N,): topo[N, :N] dropped-ring row
    topo_right: jnp.ndarray | None  # (N,): topo[:N, N]
    q_forcing_3d: jnp.ndarray | None  # owned (nl, N, N)
    mask_full: jnp.ndarray | None  # replicated (N+1, N+1), stochastic only
    sig_lev_c: tuple | None      # centered filter-weight pyramid
    mask_c: tuple | None         # centered mask pyramid
    idh0: tuple
    idh1: tuple
    sharded_flags: tuple
    wl_flags: tuple | None       # per-level sharded flags, centered pyramid


jax.tree_util.register_dataclass(
    VertexShardConst,
    data_fields=["mask", "psi_pg", "S2", "yv", "vlevels", "ring", "topo",
                 "topo_top", "topo_right", "q_forcing_3d", "mask_full",
                 "sig_lev_c", "mask_c"],
    meta_fields=["idh0", "idh1", "sharded_flags", "wl_flags"])


def _pyramid_flags(N: int, my: int, mx: int) -> tuple:
    """Sharded flag per centered-pyramid level l = 0..depth (size 2^l),
    using the shard_mg threshold."""
    from msom_tpu.parallel import shard_mg
    depth = int(round(np.log2(N)))
    return tuple(shard_mg.level_is_sharded(2 ** l, my, mx)
                 for l in range(depth + 1))


def shard_const(cfg, const: node.NodeQGConstants, q0_full, my, mx
                ) -> VertexShardConst:
    """Convert full-rep NodeQGConstants (+ the initial q for its frozen
    ring) into the owned-rep sharded const."""
    levels, flags = prepare_vlevels(const.vlevels, my, mx)
    ring = VertexRing(q_top=jnp.asarray(q0_full[..., -1, :-1]),
                      q_right=jnp.asarray(q0_full[..., :-1, -1]))
    has_topo = not np.allclose(np.asarray(const.topo), 0.0)
    wl_flags = None
    if cfg.dtflt > 0:
        wl_flags = _pyramid_flags(cfg.N, my, mx)
    return VertexShardConst(
        mask=to_owned(const.mask), psi_pg=to_owned(const.psi_pg),
        S2=None if const.S2 is None else to_owned(const.S2),
        yv=to_owned(const.yv), vlevels=levels, ring=ring,
        topo=to_owned(const.topo) if has_topo else None,
        topo_top=jnp.asarray(const.topo[..., -1, :-1]) if has_topo else None,
        topo_right=jnp.asarray(const.topo[..., :-1, -1]) if has_topo else None,
        q_forcing_3d=None if const.q_forcing_3d is None
        else to_owned(const.q_forcing_3d),
        mask_full=const.mask if cfg.stochastic else None,
        sig_lev_c=const.sig_lev_c, mask_c=const.mask_c,
        idh0=const.idh0, idh1=const.idh1, sharded_flags=flags,
        wl_flags=wl_flags)


def _specs_const(c: VertexShardConst, my, mx):
    def rule(x):
        if not hasattr(x, "ndim") or x.ndim < 2:
            return P()
        ny, nx = x.shape[-2], x.shape[-1]
        if (ny % my == 0 and nx % mx == 0 and ny // my >= 2
                and nx // mx >= 2):
            return P(*([None] * (x.ndim - 2) + ["y", "x"]))
        return P()
    specs = jax.tree.map(rule, c)
    # The VertexRing (and the topo ring / full-grid stochastic mask) are
    # replicated by construction (ring_slices/vghost slice them with global
    # offsets): force P() so an (nl, N) leaf with nl % my == 0 can never be
    # mesh-sharded by the generic rule above.
    specs = dataclasses.replace(
        specs, ring=jax.tree.map(lambda _: P(), c.ring))
    if c.mask_full is not None:
        specs = dataclasses.replace(specs, mask_full=P())
    # the centered filter pyramids shard per wl_flags (levels below the
    # shard_mg threshold stay replicated), not the generic shape rule
    if c.wl_flags is not None and c.sig_lev_c is not None:
        def per_level(pyr):
            return tuple(P("y", "x") if f and hasattr(p, "ndim")
                         and p.ndim == 2 else P()
                         for p, f in zip(pyr, c.wl_flags))
        specs = dataclasses.replace(
            specs, sig_lev_c=per_level(c.sig_lev_c),
            mask_c=per_level(c.mask_c))
    return specs


def rhs_pv_sharded(cfg, c: VertexShardConst, q, psi, t, ym="y", xm="x"):
    """Owned-rep port of models.qg_node.rhs_pv (same term order)."""
    d = cfg.delta
    nl = cfg.nl
    m = c.mask
    ny_l, nx_l = q.shape[-2], q.shape[-1]
    q_top, q_right = ring_slices(c.ring, ny_l, nx_l, ym, xm)

    def J(p_gh, q_gh):
        # J(p, qq) = arakawa_mjac(qq, p) — args swapped like the unsharded J
        return arakawa_mjac_g(q_gh, p_gh, d)

    def betaterm(p_gh):
        return cfg.beta * (p_gh.shift(0, 1) - p_gh.shift(0, -1)) / (2 * d)

    qf = _q_forcing_owned(cfg, c.yv, t)

    if nl == 1:
        q_gh = vghost(q, high_row=q_top, high_col=q_right)
        psi_gh = vghost(psi)
        dq = (-J(psi_gh, q_gh) - betaterm(psi_gh)
              - cfg.hEkb * cfg.f0 / (2 * cfg.dh[nl - 1]) * q
              + qf[None] + cfg.nu * _vlap_own(q_gh, d))
        return dq * m

    q = q * m
    psi = psi * m
    psi_gh = vghost(psi)
    zeta = _vlap_own(psi_gh, d)
    zeta = bc_deriv_own(zeta, psi, cfg.bc_fac, d)
    z_hr, z_hc = slip_high(psi, cfg.bc_fac, d)
    zeta_gh = vghost(zeta, high_row=z_hr, high_col=z_hc)

    pp_gh = vghost(c.psi_pg)
    dq = -J(psi_gh, zeta_gh) - J(pp_gh, zeta_gh) - betaterm(psi_gh)
    Jd = (J(psi_gh[:-1], psi_gh[1:]) + J(pp_gh[:-1], psi_gh[1:])
          + J(psi_gh[:-1], pp_gh[1:]))
    idh0 = jnp.asarray(c.idh0, q.dtype).reshape(nl, 1, 1)
    idh1 = jnp.asarray(c.idh1, q.dtype).reshape(nl, 1, 1)
    dq = dq.at[:-1].add(-c.S2 * Jd * idh1[:-1])
    dq = dq.at[1:].add(c.S2 * Jd * idh0[1:])
    # bottom friction + topography (qg_baroclinic_ms.h:150) — one combined
    # .add, matching the unsharded association order exactly
    bot = -cfg.hEkb * cfg.f0 / (2 * cfg.dh[nl - 1]) * zeta[nl - 1]
    if c.topo is not None:
        topo_top = _local_slice(c.topo_top, xm, nx_l)
        topo_right = _local_slice(c.topo_right, ym, ny_l)
        topo_gh = vghost(c.topo, high_row=topo_top, high_col=topo_right)
        bot = bot - J(psi_gh[nl - 1], topo_gh) * cfg.f0 / cfg.dh[nl - 1]
    dq = dq.at[nl - 1].add(bot)
    dq = dq + cfg.nu * stretch(zeta, c.S2, c.idh0, c.idh1)
    tmp = _vlap_own(zeta_gh, d)
    # set_bc_ms tmp relation: parent's OWN ring subtracted (see
    # models.qg_node.rhs_pv and tests/oracle_node.py)
    tmp = bc_deriv_rel_own(tmp, zeta, cfg.bc_fac, d)
    dq = dq + cfg.nu * tmp
    if cfg.nu4 != 0.0:
        t_hr, t_hc = slip_high_rel(zeta, z_hr, z_hc, cfg.bc_fac, d)
        tmp_gh = vghost(tmp, high_row=t_hr, high_col=t_hc)
        dq = dq - cfg.nu4 * (stretch(tmp, c.S2, c.idh0, c.idh1)
                             + _vlap_own(tmp_gh, d))
    dq = dq.at[0].add(qf)
    if c.q_forcing_3d is not None:
        dq = dq + c.q_forcing_3d
    return dq * m


def _q_forcing_owned(cfg, yv_own, t):
    """models.qg_node.q_forcing_field on the owned yv tile."""
    y = yv_own
    amp = -(cfg.tau0 + cfg.tau1 * jnp.cos(2 * jnp.pi * t / cfg.tf1)) \
        / cfg.dh[0] * cfg.forc_mode * jnp.pi / cfg.L0
    arg = cfg.forc_mode * jnp.pi * (
        y + y * (y - cfg.L0) * 2 / (cfg.L0 ** 2) * cfg.dy_ws
        * jnp.sin(2 * jnp.pi * t / cfg.tf2)) / cfg.L0
    return amp * jnp.sin(arg)


def adjust_dt_sharded(cfg, psi, dtmax0, prev):
    """models.qg_node.adjust_dt: forward-difference face speeds over owned
    nodes; the face into the dropped wall ring uses psi[N] = 0 (the same
    value the unsharded max sees)."""
    d = cfg.delta
    g = vghost(psi)
    u1 = jnp.abs(g.shift(1, 0) - psi) / d
    u2 = jnp.abs(g.shift(0, 1) - psi) / d
    umax = halo.pmax2(jnp.maximum(jnp.max(u1), jnp.max(u2)))
    big = jnp.asarray(jnp.finfo(psi.dtype).max / 4, psi.dtype)
    dtm = jnp.minimum(dtmax0, jnp.where(umax > 0, cfg.CFL * d / umax, big))
    dtm = jnp.where(dtm > prev, (prev + 0.1 * dtm) / 1.1, dtm)
    return dtm, dtm


def diag_1d_sharded(cfg, c: VertexShardConst, psi, q, t, ym="y", xm="x"):
    """models.qg_node.diag_1d with psum reductions; owned-node sums only
    (the dropped ring contributes zero in the unsharded sum because psi's
    ring is zero), so no vertex is double-counted (qg.h:377-380)."""
    d2 = cfg.delta ** 2
    ny_l, nx_l = q.shape[-2], q.shape[-1]
    q_top, q_right = ring_slices(c.ring, ny_l, nx_l, ym, xm)
    lap_psi = _vlap_own(vghost(psi), cfg.delta) * c.mask
    lap_q = _vlap_own(vghost(q, high_row=q_top, high_col=q_right),
                      cfg.delta) * c.mask
    qf = _q_forcing_owned(cfg, c.yv, t)
    ke = halo.psum2(-jnp.sum(0.5 * psi[0] * lap_psi[0])) * d2
    d_ke = halo.psum2(-cfg.nu * jnp.sum(psi[0] * lap_q[0])) * d2
    f_ke = halo.psum2(-jnp.sum(psi[0] * qf)) * d2
    return ke, d_ke, f_ke


def _noise_owned(cfg, c: VertexShardConst, key, my, mx):
    """The stochastic kick's spatially-correlated noise, bitwise-equal to
    the unsharded models.qg_node.generate_noise: the full (nl, N+1, N+1)
    field is generated REPLICATED on every device from the shared key (the
    wavelet pyramid is redundant O(N^2) work, the price of exactness), and
    this device slices its owned tile."""
    full_const = node.NodeQGConstants(
        mask=c.mask_full, psi_pg=None, S2=None, topo=None,
        q_forcing_3d=None, sig_lev=None, sig_lev_c=None, mask_c=None,
        vlevels=None, yv=None, idh0=c.idh0, idh1=c.idh1)
    full = node.generate_noise(cfg, full_const, key,
                               (cfg.nl, cfg.N + 1, cfg.N + 1))
    return halo.local_tile(to_owned(full), my, mx)


def make_node_step_sharded(cfg, mesh, const: node.NodeQGConstants, q0_full,
                           state_example: node.NodeQGState):
    """Build (step, place_state, const_sharded): the shard_map'ed qg-node
    predictor-corrector on owned-rep vertex tiles.

    step(state, const_sharded, tnext) -> (state, NodeStepDiag), with
    state.q/state.psi in owned rep (owned_state/to_full to convert);
    state_example: an owned-rep state fixing the pytree layout."""
    my, mx = mesh.devices.shape
    DT = cfg.dt_clamped()
    csh = shard_const(cfg, const, q0_full, my, mx)

    def local_step(state, c, tnext):
        from msom_tpu.models.qg import dtnext

        def update(q, psi_guess, prev, t):
            psi, st = vpoisson_sharded(
                psi_guess, q, levels=c.vlevels,
                sharded_flags=c.sharded_flags, my=my, mx=mx,
                idh0=c.idh0, idh1=c.idh1, tolerance=cfg.TOLERANCE)
            psi = bc_psi_own(psi)
            dq = rhs_pv_sharded(cfg, c, q, psi, t)
            dtm, prev = adjust_dt_sharded(cfg, psi, DT, prev)
            return dq, psi, prev, dtm, st

        dq, psi1, prev, dtm, st = update(state.q, state.psi,
                                         state.dt_prev, state.t)
        dt = dtnext(state.t, tnext, dtm)

        noise = None
        key = state.key
        if cfg.stochastic:
            key, sub = jax.random.split(key)
            noise = _noise_owned(cfg, c, sub, my, mx)

        q_half = state.q + dq * (dt / 2)
        if cfg.stochastic:
            q_half = q_half + noise * jnp.sqrt(dt) / 2.0
        dq2, psi2, prev, _, _ = update(q_half, psi1, prev, state.t)
        q_new = state.q + dq2 * dt
        if cfg.stochastic:
            q_new = q_new + noise * jnp.sqrt(dt)

        ke, d_ke, f_ke = diag_1d_sharded(cfg, c, psi2, q_new, state.t)
        new = node.NodeQGState(q=q_new, psi=psi2, psi_f=state.psi_f,
                               t=state.t + dt, dt_prev=prev, i=state.i + 1,
                               key=key, nbar=state.nbar)
        return new, node.NodeStepDiag(dt=dt, ke=ke, d_ke=d_ke, f_ke=f_ke,
                                      mg_iters=st.iters)

    def _state_specs(st):
        def rule(x):
            if (hasattr(x, "ndim") and x.ndim >= 2
                    and x.shape[-1] % mx == 0 and x.shape[-2] % my == 0):
                return P(*([None] * (x.ndim - 2) + ["y", "x"]))
            return P()
        return jax.tree.map(rule, st)

    const_specs = _specs_const(csh, my, mx)
    sspecs = _state_specs(state_example)
    diag_specs = jax.tree.map(lambda _: P(), node.NodeStepDiag(
        dt=0.0, ke=0.0, d_ke=0.0, f_ke=0.0, mg_iters=0))
    step = jax.jit(shard_map(
        local_step, mesh=mesh,
        in_specs=(sspecs, const_specs, P()),
        out_specs=(sspecs, diag_specs), check_vma=False))

    def place(tree, specs):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, specs)

    def place_state(st):
        return place(st, _state_specs(st))

    csh_placed = place(csh, const_specs)
    return step, place_state, csh_placed


def owned_state(state: node.NodeQGState) -> node.NodeQGState:
    """Full-rep NodeQGState -> owned rep."""
    return dataclasses.replace(
        state, q=to_owned(state.q), psi=to_owned(state.psi),
        psi_f=None if state.psi_f is None else to_owned(state.psi_f))


# ---------------------------------------------------------------------------
# sharded masked wavelet filter (the dtflt event under vertex sharding)
# ---------------------------------------------------------------------------

def _wprolong(coarse, fine_sharded, coarse_sharded, my, mx):
    """Bilinear prolongation coarse level -> fine level across the
    sharded/replicated boundary (bitwise-equal to solvers.mg.prolong_bilinear
    of the assembled global array, the shard_mg contract)."""
    from msom_tpu.ops.bc import BC
    from msom_tpu.parallel import shard_mg
    from msom_tpu.solvers import mg as cmg

    if fine_sharded:
        if coarse_sharded:
            return shard_mg._prolong_sharded(coarse, BC.DIRICHLET)
        return halo.local_tile(cmg.prolong_bilinear(coarse, BC.DIRICHLET),
                               my, mx)
    return cmg.prolong_bilinear(coarse, BC.DIRICHLET)


def wavelet_sharded(s, wl_flags, mask_c, my, mx):
    """Masked forward wavelet transform (ops.wavelet.wavelet with a mask
    pyramid) of an owned centered tile: local 2x2 restriction while the
    level shards, one all-gather at the replicated-tail crossing."""
    from msom_tpu.solvers import mg as cmg

    depth = len(wl_flags) - 1
    pyr = [s]                                  # finest (level depth) first
    for l in range(depth - 1, -1, -1):
        r = cmg.restrict_cell(pyr[-1])         # blockwise: local either way
        if wl_flags[l + 1] and not wl_flags[l]:
            r = halo.gather_global(r)
        pyr.append(r)
    pyr.reverse()                              # pyr[l] = field at level l
    w = [pyr[0]]
    for l in range(1, depth + 1):
        p = _wprolong(pyr[l - 1], wl_flags[l], wl_flags[l - 1], my, mx)
        w.append(pyr[l] - p)
    return [wl * ml for wl, ml in zip(w, mask_c)]


def inverse_wavelet_sharded(w, wl_flags, mask_c, my, mx):
    """Masked reconstruction (ops.wavelet.inverse_wavelet)."""
    s = w[0] * mask_c[0]
    for l in range(1, len(w)):
        p = _wprolong(s, wl_flags[l], wl_flags[l - 1], my, mx)
        s = (p + w[l]) * mask_c[l]
    return s


def comp_q_sharded(cfg, c: VertexShardConst, psi, my, mx,
                   ym: str = "y", xm: str = "x"):
    """models.qg_node.comp_q on owned tiles; also returns the re-frozen
    dropped-ring VertexRing (vertex.bc_deriv's global row/col N values,
    which change whenever psi does — e.g. after the wavelet filter)."""
    g = vghost(psi)
    q = _vlap_own(g, cfg.delta)
    if cfg.nl > 1:
        q = q + stretch(psi, c.S2, c.idh0, c.idh1)
    else:
        q = q - cfg.iRd2_low * psi
    q = bc_deriv_own(q, psi, cfg.bc_fac, cfg.delta)
    cc = 2.0 * cfg.bc_fac / (cfg.delta * cfg.delta)
    yi, xi = lax.axis_index(ym), lax.axis_index(xm)
    row = jnp.where(yi == my - 1, psi[..., -1, :],
                    jnp.zeros_like(psi[..., -1, :]))
    row = lax.psum(row, ym)                      # global row N-1, this x-slice
    q_top = cc * lax.all_gather(row, xm, axis=row.ndim - 1, tiled=True)
    col = jnp.where(xi == mx - 1, psi[..., :, -1],
                    jnp.zeros_like(psi[..., :, -1]))
    col = lax.psum(col, xm)
    q_right = cc * lax.all_gather(col, ym, axis=col.ndim - 1, tiled=True)
    # ring corners stay zero (vertex.bc_deriv corner=0)
    q_top = q_top.at[..., 0].set(0.0)
    q_right = q_right.at[..., 0].set(0.0)
    return q, VertexRing(q_top=q_top, q_right=q_right)


def make_node_filter_sharded(cfg, mesh, state_example: node.NodeQGState):
    """Build the shard_map'ed dtflt wavelet-filter event
    (models.qg_node.wavelet_filter on owned-rep tiles).

    filter(state, const_sharded) -> (state, new_ring): the caller must
    replace const_sharded.ring with new_ring (comp_q re-freezes the dropped
    q ring from the filtered psi)."""
    my, mx = mesh.devices.shape
    from msom_tpu.parallel import shard_mg
    assert shard_mg.level_is_sharded(cfg.N, my, mx), \
        "sharded filter: finest level must shard (use the unsharded filter)"

    def local_filter(state, c):
        psi, _ = vpoisson_sharded(
            state.psi, state.q, levels=c.vlevels,
            sharded_flags=c.sharded_flags, my=my, mx=mx,
            idh0=c.idh0, idh1=c.idh1, tolerance=cfg.TOLERANCE)
        psi = bc_psi_own(psi)
        # vertex -> centered average (qg_baroclinic_ms.h:369-371)
        g = vghost(psi)
        pc = 0.25 * (psi + g.shift(1, 0) + g.shift(0, 1) + g.shift(1, 1))
        w = wavelet_sharded(pc, c.wl_flags, c.mask_c, my, mx)
        w = [wl * sl for wl, sl in zip(w, c.sig_lev_c)]
        pl = inverse_wavelet_sharded(w, c.wl_flags, c.mask_c, my, mx)
        # centered -> vertex: average of the 4 surrounding cells (:385)
        gpl = vghost(pl)
        psi_loc = 0.25 * (gpl.shift(-1, -1) + gpl.shift(0, -1)
                          + gpl.shift(-1, 0) + pl)
        psi_f = (state.psi_f * state.nbar + psi_loc / cfg.dtflt) \
            / (state.nbar + 1)
        psi_new = (psi - psi_loc) * c.mask
        q_new, ring_new = comp_q_sharded(cfg, c, psi_new, my, mx)
        new = dataclasses.replace(state, psi=psi_new, q=q_new, psi_f=psi_f,
                                  nbar=state.nbar + 1)
        return new, ring_new

    def _state_specs(st):
        def rule(x):
            if (hasattr(x, "ndim") and x.ndim >= 2
                    and x.shape[-1] % mx == 0 and x.shape[-2] % my == 0):
                return P(*([None] * (x.ndim - 2) + ["y", "x"]))
            return P()
        return jax.tree.map(rule, st)

    sspecs = _state_specs(state_example)

    def build(csh):
        cspecs = _specs_const(csh, my, mx)
        ring_specs = jax.tree.map(lambda _: P(), csh.ring)
        return jax.jit(shard_map(
            local_filter, mesh=mesh, in_specs=(sspecs, cspecs),
            out_specs=(sspecs, ring_specs), check_vma=False))

    cache = {}

    def filter_fn(state, csh):
        if "f" not in cache:
            cache["f"] = build(csh)
        return cache["f"](state, csh)

    return filter_fn
