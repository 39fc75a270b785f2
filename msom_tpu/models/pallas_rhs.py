"""Fused Pallas TPU kernels for the msqg RHS (update_qg hot path).

One HBM pass computes, from psi (plus the static coupling fields): zeta =
lap(psi), the Arakawa self-advection, the beta term, the large-scale (PG)
coupling terms J(pp, zeta) and the interface stretch-Jacobian cascade
(including the pp cross terms), the large-scale relative-vorticity advection
(_LS_RV), harmonic/biharmonic dissipation (two in-kernel Laplacian sweeps
with the intermediate ghost rule, matching the reference's two-sweep
biharmonic, /root/reference/msqg/qg.h:406-422), Ekman friction, the wind
forcing, bottom topography J(psi, topo)/(Ro dh) and the 3-D forcing field —
i.e. the whole of update_qg (/root/reference/msqg/qg.h:609-650) for every
WALLED configuration (free-slip and partial-slip sbc >= 0), in both the
standard and the ENERGY_CONSERV / stochastic advection variants. A second
kernel fuses the passive-tracer tendencies (ptr_rhs, qg.h:573-588). The XLA
lowering of the same math costs ~25 ms at 2048^2 x 4 layers for the
uncoupled case alone (dozens of unfused roll/select kernels); each kernel
here is one grid pass.

Not covered (callers fall back to models.qg.rhs): spatially x-varying
stretching/wind/Ro fields (the kernel streams them as y-profiles; a 2-D
frpg input disables it). The doubly-periodic cases (sbc == -1) ARE
covered, coupled or not: psi/q/tracer halo slabs WRAP (modular BlockSpec
index maps) and their ghost rules become pure rolls; topography keeps
its Neumann pad via the grow-keyed rule; and pp (whose periodic ghost
law is the custom NON-wrap dirichlet(vpg x - upg y), msqg/qg.h:1105-1114)
streams as pre-tiled PADDED views with the law baked in at build (the
`_LS_RV` periodic-channel configuration, msqg/qg.h:5, VERDICT r5 #9).

Ghost handling: ghost values are materialized in-register from the uniform
per-axis rules, composed x-after-y exactly like ops.bc.pad / ops.ghost:
  * psi, pp, q, zetap: Dirichlet half-cell (ghost = -interior; corners
    compose to +interior);
  * topo, tracers: Neumann (ghost = +interior);
  * zeta and the biharmonic intermediate under partial slip (sbc > 0):
    edge ghosts c*(parent_in - parent_ghost) with Dirichlet corner fill,
    matching ops.ghost.ghosted_slip (/root/reference/msqg/qg.h:185-198).

Tiling mirrors solvers.pallas_mg: y-tiles of T rows with 8-row halo slabs
(halo use = 3 rows), redundant rim compute, full-width rows (the lane axis
is never split).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msom_tpu.solvers.pallas_mg import _tile_profile, default_interpret

_H = 3  # halo rows used (<= 8, the slab width)
_VMEM_BUDGET = 14 * 1024 * 1024  # see _pick_tile
_VMEM_CAP = 64 * 1024 * 1024


@dataclasses.dataclass(frozen=True)
class RhsKernelData:
    """Static per-config data for the fused RHS kernels.

    rows == 0 is the single-device layout. rows > 0 is the ROWS-SHARDED
    layout (the kernel-keeping distributed step, parallel/step.py): the
    model's y axis splits into `rows` equal shards, T divides the local row
    count, and the constant fields additionally carry halo-extended forms
    (`pp_ext`/`topo_ext`: per-shard (n_loc + 16)-row windows concatenated so
    sharding over axis -2 hands every device exactly its window). The
    kernels are IDENTICAL in both modes — wall rules key on the global row
    index (grow + row0), so a shard at a domain wall applies the physical
    ghost law and an interior shard consumes real neighbor rows from the
    halo slabs."""
    strl: jnp.ndarray | None   # (ntiles, nl-1, T+6, 1) tiled y-profile
    wind: jnp.ndarray          # (ntiles, 1, T+6, 1)
    iro: jnp.ndarray | None    # (ntiles, 1, T+6, 1): 1/(Ro(y)*dh_bot) (topo)
    pp: jnp.ndarray | None     # (nl, N, N) large-scale psi interior
    topo: jnp.ndarray | None   # (1, N, N)
    umax_pp: jnp.ndarray | None  # (nl,) precomputed pp CFL face maxima
    pp_ext: jnp.ndarray | None   # rows mode: (nl, rows*(n_loc+16), N)
    topo_ext: jnp.ndarray | None
    pp_t: jnp.ndarray | None     # periodic-coupled: PRE-TILED PADDED pp
    #                              (nl, ntiles*(T+8), N+2) — the custom
    #                              non-wrap ghost law (msqg/qg.h:1105-1114)
    #                              is baked into pp_pad at build, so the
    #                              kernel reads plain views
    zetap_t: jnp.ndarray | None  # same for the _LS_RV zetap_pad
    T: int
    Ttr: int                   # tracer-kernel tile (0: tracer kernel off)
    rows: int = 0              # row-shard count (0: unsharded layout)


jax.tree_util.register_dataclass(
    RhsKernelData,
    data_fields=["strl", "wind", "iro", "pp", "topo", "umax_pp", "pp_ext",
                 "topo_ext", "pp_t", "zetap_t"],
    meta_fields=["T", "Ttr", "rows"])


def _pick_tile(n: int, nfields: float, itemsize: int,
               divisor: int | None = None) -> int | None:
    """y-tile size: multiple of 8. Two constraints, both measured on v5e at
    2048^2 (tools/coupled_kernel_bench.py sweep, PERF.md r4):

    * a per-buffer SWEET SPOT that depends on N only — (T+6)*n*itemsize
      around 330 KB per field-layer (the 44 = 5.5 x 8 coefficient
      reproduces pallas_mg.pick_tile's throughput-optimal picks: T=32 at
      2048, 64 at 1024, 128 at 512 in f32). Larger tiles LOSE throughput
      (plain RHS 0.54 -> 1.11 ms going 32 -> 64 at 2048), smaller tiles
      pay halo redundancy (coupled RHS 2.95 ms at T=8 vs 2.08 at T=32);
    * an absolute live-VMEM cap for compile feasibility when many fields
      stream (nfields counts (C, T+6, nx) field equivalents with
      view-weight): the coupled kernel compiles at an estimated 61 MB and
      fails at ~120 MB, so cap at 64 MB."""
    if n < 64 or n % 8:
        return None
    for t in (128, 64, 32, 16, 8):
        if divisor is not None and (t > divisor or divisor % t):
            continue   # rows mode: T must tile the LOCAL shard rows
        if n % t == 0 and t <= n // 2 \
                and 44.0 * (t + 6) * n * itemsize <= _VMEM_BUDGET \
                and 5.5 * nfields * (t + 6) * n * itemsize <= _VMEM_CAP:
            return t
    return None


def _tile_padded(f_pad: np.ndarray, T: int) -> np.ndarray:
    """(C, n+2, nx+2) PADDED constant -> (C, ntiles*(T+8), nx+2) tiles:
    tile i holds pad rows [iT-2, iT+T+6) clamped; its first T+6 rows are
    interior view rows [iT-3, iT+T+3) — the same row window as the psi
    halo slab. 3-D tile-concatenated layout + 8-multiple tile height
    (Mosaic block rules)."""
    C, np2, nx2 = f_pad.shape
    n = np2 - 2
    ntiles = n // T
    rows = np.arange(-2, T + 6)
    out = np.empty((C, ntiles * (T + 8), nx2), f_pad.dtype)
    for i in range(ntiles):
        out[:, i * (T + 8):(i + 1) * (T + 8), :] = \
            f_pad[:, np.clip(i * T + rows, 0, np2 - 1), :]
    return out


def _ext_windows(a: np.ndarray, rows: int) -> np.ndarray:
    """Concatenated per-shard halo-extended windows of a global (..., N, nx)
    constant: shard d's block is rows [d*n_loc - 8, d*n_loc + n_loc + 8) of
    the edge-clamped array — sharding the result over axis -2 in `rows`
    equal parts hands each device its own window. Clamped rows at the
    physical walls are never consumed (the kernel's _yfix wall rule
    overrides the single ghost row that is)."""
    N = a.shape[-2]
    n_loc = N // rows
    pad = np.concatenate([a[..., :1, :]] * 8 + [a]
                         + [a[..., -1:, :]] * 8, axis=-2)
    blocks = [pad[..., d * n_loc:d * n_loc + n_loc + 16, :]
              for d in range(rows)]
    return np.concatenate(blocks, axis=-2)


def build_kernel_data(cfg, const_wind: np.ndarray,
                      strl_prof: np.ndarray | None, *,
                      Ro: np.ndarray | None = None,
                      pp_pad=None, topo_pad=None, zetap_pad=None,
                      need_q: bool = False,
                      has_qforc: bool = False,
                      rows: int = 0) -> RhsKernelData | None:
    """Build the kernel-side constants, or None when the config cannot use
    the fused path (periodic, x-varying profiles, no feasible tile).

    strl_prof: (nl-1, N) y-profile (None for nl == 1); const_wind: (N, N)
    x-constant; Ro: (N, N) x-constant (only consumed with topography);
    pp_pad/topo_pad: the padded constant fields from QGConstants.

    rows > 0: build the ROWS-SHARDED layout (see RhsKernelData) for a
    `rows`-way y decomposition — T divides N//rows and the pp/topo
    constants gain halo-extended per-shard windows."""
    periodic = cfg.sbc < 0
    N, nl = cfg.N, cfg.nl
    dt = jnp.dtype(cfg.dtype)
    itemsize = dt.itemsize
    windp = np.asarray(const_wind)
    if not np.array_equal(windp, np.broadcast_to(windp[:, :1], windp.shape)):
        return None
    has_pg = pp_pad is not None
    has_topo = topo_pad is not None
    iro = None
    if has_topo:
        Rop = np.asarray(Ro)
        if not np.array_equal(Rop, np.broadcast_to(Rop[:, :1], Rop.shape)):
            return None
        irop = 1.0 / (Rop[:, 0] * float(cfg.dh[nl - 1]))

    flsrv = bool(cfg.flsrv == 1 and has_pg)
    divisor = None
    if rows:
        if N % rows or (N // rows) % 8:
            return None
        divisor = N // rows
    nfields = (2.0 + (1.0 if need_q else 0.0)
               + (0.0 if not has_pg else (2.0 if flsrv else 1.0))
               + (1.5 / nl if has_topo else 0.0)
               + (0.5 if has_qforc else 0.0))
    T = _pick_tile(N, nfields * max(nl, 2), itemsize, divisor)
    if T is None:
        return None
    Ttr = 0
    if cfg.nptr > 0:
        ntr = nl * cfg.nptr
        # psi views + tracer views + relax (center-only)
        Ttr = _pick_tile(N, 1.0 * max(nl, 2) + 2.0 * ntr, itemsize,
                         divisor) or 0
    wind = jnp.asarray(_tile_profile(windp[None, :, 0], T, _H), dt)
    strl = None
    if strl_prof is not None:
        strl = jnp.asarray(_tile_profile(np.asarray(strl_prof), T, _H), dt)
    iro_t = None
    if has_topo:
        iro_t = jnp.asarray(_tile_profile(irop[None, :], T, _H), dt)
    pp = umax_pp = pp_ext = pp_t = zetap_t = None
    if has_pg:
        from msom_tpu.ops.ghost import ghosted_from_padded, \
            max_face_speed_layers
        pp = jnp.asarray(pp_pad)[:, 1:-1, 1:-1]
        # pp is constant in time: its part of the CFL chain
        # (/root/reference/msqg/qg.h:387-390) is precomputed once here with
        # the exact function the XLA path uses
        umax_pp = max_face_speed_layers(ghosted_from_padded(
            jnp.asarray(pp_pad)), float(cfg.delta))
        if rows and not periodic:
            # the periodic pp path consumes pp_t exclusively — building
            # pp_ext there would be dead HBM + shard_map argument traffic
            pp_ext = jnp.asarray(_ext_windows(np.asarray(pp), rows), dt)
        if periodic:
            # the periodic pp ghost law is custom (non-wrap,
            # msqg/qg.h:1105-1114); it is baked into pp_pad at build, so
            # the kernel streams PRE-TILED PADDED views instead of
            # applying a rule
            pp_t = jnp.asarray(_tile_padded(np.asarray(pp_pad), T), dt)
            if flsrv and zetap_pad is not None:
                zetap_t = jnp.asarray(
                    _tile_padded(np.asarray(zetap_pad), T), dt)
    topo = topo_ext = None
    if has_topo:
        topo_np = np.asarray(topo_pad)[None, 1:-1, 1:-1]
        topo = jnp.asarray(topo_np, dt)
        if rows:
            topo_ext = jnp.asarray(_ext_windows(topo_np, rows), dt)
    return RhsKernelData(strl=strl, wind=wind, iro=iro_t, pp=pp, topo=topo,
                         umax_pp=umax_pp, pp_ext=pp_ext, topo_ext=topo_ext,
                         pp_t=pp_t, zetap_t=zetap_t,
                         T=T, Ttr=Ttr, rows=rows)


def strl_profile(strl):
    """Shared kernel gate for the stretching field: (ok, y_profile).
    The kernels stream strl as an (nl-1, N) y-profile, so it must be
    x-uniform; ok=False disables the fused path (a 2-D frpg input).
    Single source of truth for models.qg.build_constants AND the
    rows-sharded builder (parallel.step)."""
    if strl is None:
        return True, None
    s = np.asarray(strl)
    if not np.array_equal(s, np.broadcast_to(s[..., :1], s.shape)):
        return False, None
    return True, s[..., 0]


def applicable(cfg, const) -> bool:
    """Static config gate (see module docstring): every walled (sbc >= 0)
    configuration — coupled or not — and the plain doubly-periodic case,
    whenever the profile fields are x-constant and a VMEM tile exists
    (rhsk presence encodes all of that, decided at build time)."""
    return (getattr(cfg, "use_pallas", True)
            and getattr(const, "rhsk", None) is not None)


def rows_specs(kd: RhsKernelData, ym: str = "y"):
    """shard_map PartitionSpecs for a rows-mode RhsKernelData: profile
    tiles and the pp/topo (+ ext) fields split over the y mesh axis, the
    precomputed pp CFL maxima replicated."""
    from jax.sharding import PartitionSpec as P
    row3 = P(None, ym, None)
    return RhsKernelData(
        strl=None if kd.strl is None else P(ym),
        wind=P(ym),
        iro=None if kd.iro is None else P(ym),
        pp=None if kd.pp is None else row3,
        topo=None if kd.topo is None else row3,
        umax_pp=None if kd.umax_pp is None else P(),
        pp_ext=None if kd.pp_ext is None else row3,
        topo_ext=None if kd.topo_ext is None else row3,
        pp_t=None if kd.pp_t is None else row3,
        zetap_t=None if kd.zetap_t is None else row3,
        T=kd.T, Ttr=kd.Ttr, rows=kd.rows)


# ---------------------------------------------------------------------------
# in-register ghost machinery (uniform per-axis rules, x composed after y)
# ---------------------------------------------------------------------------

def _xshift(a, di: int, sign: float = -1.0):
    """x-neighbor view with ghost = sign*edge (Dirichlet -1 / Neumann +1),
    applied uniformly over rows: ghost rows then get sign*(sign*corner) =
    +corner for matching per-axis signs — the ops.bc.pad composition."""
    nx = a.shape[-1]
    out = jnp.roll(a, -di, axis=2)
    col = jax.lax.broadcasted_iota(jnp.int32, a.shape[-2:], 1)
    edge = nx - 1 if di > 0 else 0
    return jnp.where(col[None] == edge, sign * a, out)


def _yroll(a, dj: int):
    return jnp.roll(a, -dj, axis=1)


def _yfix(f, grow, nglob, sign: float = -1.0):
    """Materialize the physical wall ghost rows: row(-1) = sign*row(0),
    row(N) = sign*row(N-1)."""
    up = _yroll(f, 1)     # value from the row above (grow+1)
    dn = _yroll(f, -1)    # value from the row below (grow-1)
    f = jnp.where(grow[None] == -1, sign * up, f)
    return jnp.where(grow[None] == nglob, sign * dn, f)


def _lap(f, id2, sign: float = -1.0):
    return (_xshift(f, 1, sign) + _xshift(f, -1, sign) + _yroll(f, 1)
            + _yroll(f, -1) - 4.0 * f) * id2


def _views(f, sign: float = -1.0):
    """center + 8 neighbor views, x applied before y (Ghosted.shift order);
    `f` must already have its wall ghost ROWS materialized (_yfix)."""
    fE, fW = _xshift(f, 1, sign), _xshift(f, -1, sign)
    return dict(c=f, e=fE, w=fW, n=_yroll(f, 1), s=_yroll(f, -1),
                ne=_yroll(fE, 1), se=_yroll(fE, -1),
                nw=_yroll(fW, 1), sw=_yroll(fW, -1))


def _views_slip(zeta, psi_f, grow, nglob, twoc):
    """Views of a Laplacian-derived field under the partial-slip wall law
    (ops.ghost.ghosted_slip): edge ghosts = c*(psi_in - psi_ghost) =
    2c*psi_in (psi is Dirichlet), corner ghosts keep the Dirichlet fill
    (+interior corner). psi_f = psi with its wall rows materialized."""
    nx = zeta.shape[-1]
    f_dir = _yfix(zeta, grow, nglob)                  # corner source
    f = jnp.where(grow[None] == -1, twoc * _yroll(psi_f, 1), zeta)
    f = jnp.where(grow[None] == nglob, twoc * _yroll(psi_f, -1), f)
    is_gr = (grow == -1) | (grow == nglob)
    col = jax.lax.broadcasted_iota(jnp.int32, zeta.shape[-2:], 1)

    def xs(di):
        out = jnp.roll(f, -di, axis=2)
        edge = nx - 1 if di > 0 else 0
        gval = jnp.where(is_gr[None], -f_dir, twoc * psi_f)
        return jnp.where(col[None] == edge, gval, out)

    fE, fW = xs(1), xs(-1)
    return dict(c=f, e=fE, w=fW, n=_yroll(f, 1), s=_yroll(f, -1),
                ne=_yroll(fE, 1), se=_yroll(fE, -1),
                nw=_yroll(fW, 1), sw=_yroll(fW, -1))


def _lap_ghostvals(f, w, grow, nglob, id2):
    """Laplacian of f whose edge ghost VALUES (both axes) come from the
    array w evaluated at the adjacent interior cell (no corners needed)."""
    nx = f.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, f.shape[-2:], 1)
    g = jnp.where(grow[None] == -1, _yroll(w, 1), f)
    g = jnp.where(grow[None] == nglob, _yroll(w, -1), g)

    def xs(di):
        out = jnp.roll(g, -di, axis=2)
        edge = nx - 1 if di > 0 else 0
        return jnp.where(col[None] == edge, w, out)

    return (xs(1) + xs(-1) + _yroll(g, 1) + _yroll(g, -1) - 4.0 * g) * id2


def _mjac(p, q, i12d2):
    """-J(p, q), the 12-point Arakawa bracket on view dicts
    (ops.ghost.arakawa_mjac_g, /root/reference/msqg/qg.h:252-262)."""
    j = ((q["e"] - q["w"]) * (p["n"] - p["s"])
         + (q["s"] - q["n"]) * (p["e"] - p["w"])
         + q["e"] * (p["ne"] - p["se"])
         - q["w"] * (p["nw"] - p["sw"])
         - q["n"] * (p["ne"] - p["nw"])
         + q["s"] * (p["se"] - p["sw"])
         + p["n"] * (q["ne"] - q["nw"])
         - p["s"] * (q["se"] - q["sw"])
         - p["e"] * (q["ne"] - q["se"])
         + p["w"] * (q["nw"] - q["sw"]))
    return j * i12d2


def _vslice(v: dict, idx) -> dict:
    return {k: a[idx] for k, a in v.items()}


def _stretch_prof(a, s, idh0, idh1):
    """Gamma(a) with an (nl-1, R, 1) stretching profile and static python
    float metrics (ops.stretch semantics)."""
    nl = a.shape[0]
    if nl == 1:
        return jnp.zeros_like(a)
    dif = s * (a[:-1] - a[1:])   # s[l]*(a[l] - a[l+1])
    rows = []
    for l in range(nl):
        g = None
        if l > 0 and idh0[l] != 0.0:
            g = idh0[l] * dif[l - 1]
        if l < nl - 1 and idh1[l] != 0.0:
            t = -idh1[l] * dif[l]
            g = t if g is None else g + t
        rows.append(jnp.zeros_like(a[0]) if g is None else g)
    return jnp.stack(rows, axis=0)


def _views_wrap(f):
    """center + 8 neighbor views under doubly-periodic wrap (pure rolls;
    the y-wrap is carried by the modular halo slabs)."""
    fE = jnp.roll(f, -1, axis=2)
    fW = jnp.roll(f, 1, axis=2)
    return dict(c=f, e=fE, w=fW, n=_yroll(f, 1), s=_yroll(f, -1),
                ne=_yroll(fE, 1), se=_yroll(fE, -1),
                nw=_yroll(fW, 1), sw=_yroll(fW, -1))


def _views_padded(px):
    """center + 8 neighbor views of a PRE-PADDED (C, R, nx+2) tile whose
    ghost values (custom laws baked in at build) ride the extra columns
    and the halo rows — plain slices/rolls, no ghost rules."""
    c = px[:, :, 1:-1]
    e = px[:, :, 2:]
    w = px[:, :, :-2]
    return dict(c=c, e=e, w=w, n=_yroll(c, 1), s=_yroll(c, -1),
                ne=_yroll(e, 1), se=_yroll(e, -1),
                nw=_yroll(w, 1), sw=_yroll(w, -1))


def _rhs_kernel(*refs, T, nglob, delta, beta, iRe, iRe4, ek_top, ek_bot,
                idh0, idh1, has_strl, has_pg, flsrv, has_topo, has_qforc,
                need_q, stochastic, energy_conserv, itr_stoch, sbc,
                periodic):
    it = iter(refs)
    psi_c, psi_u, psi_d = next(it), next(it), next(it)
    if need_q:
        q_c, q_u, q_d = next(it), next(it), next(it)
    if has_pg and periodic:
        ppt_r = next(it)
        if flsrv:
            zpt_r = next(it)
    elif has_pg:
        pp_c, pp_u, pp_d = next(it), next(it), next(it)
    if has_topo:
        topo_c, topo_u, topo_d = next(it), next(it), next(it)
    if has_qforc:
        qf_c = next(it)
    strl_r, wind_r = next(it), next(it)
    if has_topo:
        iro_r = next(it)
    row0_ref = next(it)   # (1,) SMEM: global row index of local row 0
    out_ref, umax_ref = next(it), next(it)

    i = pl.program_id(0)
    nl = psi_c.shape[0]
    nx = psi_c.shape[-1]
    d2 = delta * delta
    id2 = 1.0 / d2
    i12d2 = 1.0 / (12.0 * d2)
    R = T + 2 * _H
    slip = sbc > 0.0
    cslip = sbc / ((0.5 * sbc + 1.0) * d2) if slip else 0.0

    def slab(c, u, d):
        return jnp.concatenate(
            [u[:, 8 - _H:8, :], c[:], d[:, 0:_H, :]], axis=1)

    psi = slab(psi_c, psi_u, psi_d)
    grow = (jax.lax.broadcasted_iota(jnp.int32, (R, nx), 0) + i * T - _H
            + row0_ref[0])

    s = strl_r[0, :, :, :] if has_strl else None   # (nl-1, R, 1)
    wind = wind_r[0, 0, :, :]                       # (R, 1)

    if periodic:
        # the halo slabs wrap (modular index maps), so every ghost is a
        # pure roll — no wall-row materialization anywhere
        pv = _views_wrap(psi)
        zeta = (pv["e"] + pv["w"] + pv["n"] + pv["s"] - 4.0 * psi) * id2
        zv = _views_wrap(zeta)
        zeta_f = zeta
        if has_pg:
            # pp does NOT wrap: its custom ghost law rides the pre-padded
            # tile (msqg/qg.h:1105-1114 via build-time pp_pad)
            ppv = _views_padded(ppt_r[:, :R, :])
            if flsrv:
                zpv = _views_padded(zpt_r[:, :R, :])
        if need_q:
            q = slab(q_c, q_u, q_d)
            if energy_conserv:
                qv = _views_wrap(q)
    else:
        psi = _yfix(psi, grow, nglob)
        zeta = _lap(psi, id2)
        pv = _views(psi)
        if slip:
            zv = _views_slip(zeta, psi, grow, nglob, 2.0 * cslip)
        else:
            zv = _views(_yfix(zeta, grow, nglob))
        zeta_f = zv["c"]   # zeta with its wall ghost rows materialized

        if has_pg:
            pp = _yfix(slab(pp_c, pp_u, pp_d), grow, nglob)
            ppv = _views(pp)
            if flsrv:
                zpv = _views(_yfix(_lap(pp, id2), grow, nglob))
        if need_q:
            q = slab(q_c, q_u, q_d)
            if energy_conserv:
                qv = _views(_yfix(q, grow, nglob))

    # advection: J(psi, zeta) + beta v (advection_pv, msqg/qg.h:287-393);
    # the msqg core skips advection entirely for nl == 1 (qg.h:376-379).
    # ENERGY_CONSERV advects the full PV q (msqg/qg.h:310-340); the
    # stochastic variant drops the top-layer self-advection, the self part
    # of the cascade and adds -q/tr_stoch damping (qg_stochastic.h:17-111).
    if nl > 1:
        dq = _mjac(pv, qv if energy_conserv else zv, i12d2)
        if stochastic:
            dq = jnp.concatenate([jnp.zeros_like(dq[:1]), dq[1:]], axis=0)
        dq = dq + beta * (pv["w"] - pv["e"]) / (2.0 * delta)
        if has_pg:
            dq = dq + _mjac(ppv, zv, i12d2)
    else:
        dq = jnp.zeros_like(psi)
    if nl > 1 and has_strl:
        # interface cascade ju/jd with the J(psi_l, psi_l+1) self term
        # (unless stochastic/energy_conserv) + the pp cross terms
        J = None
        if has_pg:
            J = (_mjac(_vslice(ppv, slice(None, -1)),
                       _vslice(pv, slice(1, None)), i12d2)
                 + _mjac(_vslice(pv, slice(None, -1)),
                         _vslice(ppv, slice(1, None)), i12d2))
        if not stochastic and not energy_conserv:
            Jself = _mjac(_vslice(pv, slice(None, -1)),
                          _vslice(pv, slice(1, None)), i12d2)
            J = Jself if J is None else J + Jself
        if J is not None:
            sj = s * J
            rows = []
            for l in range(nl):
                g = dq[l]
                if l < nl - 1 and idh1[l] != 0.0:
                    g = g + idh1[l] * sj[l]
                if l > 0 and idh0[l] != 0.0:
                    g = g - idh0[l] * sj[l - 1]
                rows.append(g)
            dq = jnp.stack(rows, axis=0)
    if nl > 1 and has_pg and flsrv:
        dq = dq + _mjac(pv, zpv, i12d2)
    if nl > 1 and stochastic:
        dq = dq - q * itr_stoch

    # dissipation (dissip, msqg/qg.h:406-422)
    tmp = None
    if iRe != 0.0:
        tmp = (zv["e"] + zv["w"] + zv["n"] + zv["s"] - 4.0 * zv["c"]) * id2
        dq = dq + iRe * tmp
        if has_strl:
            dq = dq + iRe * _stretch_prof(zeta, s, idh0, idh1)
    if iRe4 != 0.0:
        if tmp is None:
            tmp = (zv["e"] + zv["w"] + zv["n"] + zv["s"]
                   - 4.0 * zv["c"]) * id2
        if periodic:
            tv_ = _views_wrap(tmp)
            bih = (tv_["e"] + tv_["w"] + tv_["n"] + tv_["s"]
                   - 4.0 * tmp) * id2
        elif slip:
            # intermediate ghosts c*(zeta_in - zeta_ghost), zeta_ghost =
            # 2c*psi (ops.bc.pad_zeta_slip applied to the tmp field)
            w = cslip * (zeta - 2.0 * cslip * psi)
            bih = _lap_ghostvals(tmp, w, grow, nglob, id2)
        else:
            bih = _lap(_yfix(tmp, grow, nglob), id2)
        if has_strl:
            bih = bih + _stretch_prof(tmp, s, idh0, idh1)
        dq = dq + iRe4 * bih

    # Ekman friction + wind (msqg/qg.h:428-459)
    rows = []
    for l in range(nl):
        g = dq[l]
        if l == 0 and ek_top != 0.0:
            g = g - ek_top * zeta_f[0]
        if l == nl - 1 and ek_bot != 0.0:
            g = g - ek_bot * zeta_f[nl - 1]
        if l == 0:
            g = g - wind
        rows.append(g)
    dq = jnp.stack(rows, axis=0)

    # bottom topography (msqg/qg.h:480-488): J(psi_bot, topo)/(Ro dh_bot)
    if has_topo:
        topo = _yfix(slab(topo_c, topo_u, topo_d), grow, nglob, sign=1.0)
        tv = _views(topo, sign=1.0)
        jt = _mjac(_vslice(pv, slice(nl - 1, nl)), tv, i12d2)
        iro = iro_r[0, 0, :, :]   # (R, 1)
        dq = jnp.concatenate([dq[:nl - 1], dq[nl - 1:] + jt * iro], axis=0)

    out = dq[:, _H:T + _H, :]
    # 3-D forcing (msqg/qg.h:465-474): center-only block, added post-slice
    if has_qforc:
        out = out + qf_c[:]
    out_ref[:] = out

    # fused CFL: per-layer max |face velocity| over this tile's rows — the
    # psi tile is already in VMEM, so the whole CFL field pass
    # (ops.ghost.max_face_speed_layers, ~3 ms of rolls + copies at 2048^2x4
    # when lowered by XLA) collapses into these registers. Faces are
    # evaluated from the cell on each side (interior faces twice, wall
    # faces once via the materialized ghosts) — identical extrema. The pp
    # part of the chain is precomputed at build time (pp is constant).
    i2d = 1.0 / (2.0 * delta)
    uc = -(pv["n"] - pv["s"]) * i2d
    ucW = -(pv["nw"] - pv["sw"]) * i2d
    ucE = -(pv["ne"] - pv["se"]) * i2d
    vc = (pv["e"] - pv["w"]) * i2d
    vcS = (pv["se"] - pv["sw"]) * i2d
    vcN = (pv["ne"] - pv["nw"]) * i2d
    speed = jnp.maximum(
        jnp.maximum(jnp.abs(0.5 * (uc + ucW)), jnp.abs(0.5 * (uc + ucE))),
        jnp.maximum(jnp.abs(0.5 * (vc + vcS)), jnp.abs(0.5 * (vc + vcN))))
    for l in range(nl):   # static; scalar stores into the SMEM accumulator
        umax_ref[i, l] = jnp.max(speed[l, _H:T + _H, :])


def rhs_fused(cfg, const, psi: jnp.ndarray, q: jnp.ndarray | None = None,
              interpret: bool | None = None, *, psi_ext=None, q_ext=None,
              row0=None):
    """(dq, umax_layers) for any walled configuration (see module
    docstring); umax_layers is the (nl,) per-layer max |face velocity| of
    psi for the CFL controller, computed in the same VMEM pass (combine
    with const.rhsk.umax_pp for the pp part). `q` is required for the
    stochastic (damping) and energy_conserv (advected-PV) variants.

    Rows-sharded mode (const.rhsk.rows > 0, called inside shard_map with
    local views): `psi` is the local (nl, n_loc, nx) shard, `psi_ext` the
    halo-extended concat([up8, psi, dn8]) from parallel.halo.ext_rows8
    (likewise q/q_ext when needed), `row0` the global row index of local
    row 0 (yi * n_loc). umax_layers is then this shard's maxima — pmax
    across the mesh before the CFL recurrence."""
    if interpret is None:
        interpret = default_interpret()
    kd: RhsKernelData = const.rhsk
    nl, n, nx = psi.shape
    T = kd.T
    nb, tb = n // 8, T // 8
    periodic = cfg.sbc < 0
    need_q = bool(cfg.stochastic or cfg.energy_conserv)
    has_pg = kd.pp is not None
    has_topo = kd.topo is not None
    has_qforc = const.qforc is not None
    rows = kd.rows > 0
    if rows:
        assert psi_ext is not None and row0 is not None, \
            "rows-sharded rhs_fused needs psi_ext + row0"

    def specs3(c, wrap=periodic):
        center = pl.BlockSpec((c, T, nx), lambda i: (0, i, 0))
        if rows:
            # halo slabs come from the (n_loc + 16)-row EXT array: local
            # row r sits at ext row r + 8, so the up slab (local rows
            # [iT-8, iT)) is ext 8-row block i*tb and the down slab
            # (local rows [(i+1)T, (i+1)T+8)) is ext block (i+1)*tb + 1.
            # Wall-shard halo content is unused (grow-keyed ghost rules).
            up = pl.BlockSpec((c, 8, nx), lambda i: (0, i * tb, 0))
            down = pl.BlockSpec((c, 8, nx),
                                lambda i: (0, (i + 1) * tb + 1, 0))
        elif wrap:
            # periodic: the halo slabs wrap around the global y boundary
            up = pl.BlockSpec((c, 8, nx),
                              lambda i: (0, (i * tb - 1) % nb, 0))
            down = pl.BlockSpec((c, 8, nx),
                                lambda i: (0, ((i + 1) * tb) % nb, 0))
        else:
            up = pl.BlockSpec((c, 8, nx),
                              lambda i: (0, jnp.maximum(i * tb - 1, 0), 0))
            down = pl.BlockSpec((c, 8, nx),
                                lambda i: (0, jnp.minimum((i + 1) * tb,
                                                          nb - 1), 0))
        return [center, up, down]

    def prof_spec(carr):
        return pl.BlockSpec((1, carr.shape[1], T + 2 * _H, 1),
                            lambda i: (i, 0, 0, 0))

    def tri(center, ext):
        """(center, up-source, down-source) argument triple."""
        return [center, ext, ext] if rows else [center, center, center]

    args, in_specs = tri(psi, psi_ext), specs3(nl)
    if need_q:
        args += tri(q, q_ext)
        in_specs += specs3(nl)
    if has_pg and periodic:
        # pre-tiled padded constants: (nl, T+8, nx+2) blocks per tile
        def pt_spec(carr):
            return pl.BlockSpec((carr.shape[0], T + 8, carr.shape[-1]),
                                lambda i: (0, i, 0))
        args += [kd.pp_t]
        in_specs += [pt_spec(kd.pp_t)]
        if kd.zetap_t is not None:
            args += [kd.zetap_t]
            in_specs += [pt_spec(kd.zetap_t)]
    elif has_pg:
        args += tri(kd.pp, kd.pp_ext)
        in_specs += specs3(nl)
    if has_topo:
        args += tri(kd.topo, kd.topo_ext)
        in_specs += specs3(1, wrap=False)   # topo pad is Neumann always
    if has_qforc:
        args += [const.qforc]
        in_specs += [pl.BlockSpec((nl, T, nx), lambda i: (0, i, 0))]
    has_strl = kd.strl is not None
    strl_arg = kd.strl if has_strl else jnp.zeros((n // T, 1, T + 2 * _H, 1),
                                                  psi.dtype)
    args += [strl_arg, kd.wind]
    in_specs += [prof_spec(strl_arg), prof_spec(kd.wind)]
    if has_topo:
        args += [kd.iro]
        in_specs += [prof_spec(kd.iro)]
    row0_arr = (jnp.zeros((1,), jnp.int32) if row0 is None
                else jnp.asarray(row0, jnp.int32).reshape(1))
    args += [row0_arr]
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]

    dh = cfg.dh
    kern = functools.partial(
        _rhs_kernel, T=T, nglob=cfg.N, delta=float(cfg.delta),
        beta=float(cfg.beta), iRe=float(cfg.iRe), iRe4=float(cfg.iRe4),
        ek_top=float(cfg.Eks / (cfg.Rom * 2 * dh[0])),
        ek_bot=float(cfg.Ekb / (cfg.Rom * 2 * dh[nl - 1])),
        idh0=tuple(float(v) for v in const.idh0),
        idh1=tuple(float(v) for v in const.idh1),
        has_strl=has_strl, has_pg=has_pg, flsrv=bool(cfg.flsrv == 1
                                                     and has_pg),
        has_topo=has_topo, has_qforc=has_qforc, need_q=need_q,
        stochastic=bool(cfg.stochastic),
        energy_conserv=bool(cfg.energy_conserv),
        itr_stoch=float(cfg.itr_stoch), sbc=float(cfg.sbc),
        periodic=periodic)
    dq, umax_tiles = pl.pallas_call(
        kern,
        grid=(n // T,),
        in_specs=in_specs,
        # the umax accumulator lives in SMEM (scalars per tile x layer; a
        # vector store of a sub-(8,128) block trips Mosaic layout checks),
        # one full-array block resident across the whole grid
        out_specs=[pl.BlockSpec((nl, T, nx), lambda i: (0, i, 0)),
                   pl.BlockSpec((n // T, nl), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct(psi.shape, psi.dtype),
                   jax.ShapeDtypeStruct((n // T, nl), psi.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return dq, jnp.max(umax_tiles, axis=0)


# ---------------------------------------------------------------------------
# fused passive-tracer kernel (ptr_rhs, /root/reference/msqg/qg.h:573-588)
# ---------------------------------------------------------------------------

def _tracer_kernel(psi_c, psi_u, psi_d, tr_c, tr_u, tr_d, *rest, T, nglob,
                   nl, nptr, delta, iPe, ptr_ir, has_relax, periodic):
    if has_relax:
        relax_c, row0_ref, out_ref = rest
    else:
        row0_ref, out_ref = rest
    i = pl.program_id(0)
    nx = psi_c.shape[-1]
    id2 = 1.0 / (delta * delta)
    i12d2 = id2 / 12.0
    R = T + 2 * _H

    def slab(c, u, d):
        return jnp.concatenate(
            [u[:, 8 - _H:8, :], c[:], d[:, 0:_H, :]], axis=1)

    grow = (jax.lax.broadcasted_iota(jnp.int32, (R, nx), 0) + i * T - _H
            + row0_ref[0])
    tr = slab(tr_c, tr_u, tr_d)                       # (nl*nptr, R, nx)
    if periodic:
        pv = _views_wrap(slab(psi_c, psi_u, psi_d))
        trv = _views_wrap(tr)                         # wrap tracer ghosts
    else:
        pv = _views(_yfix(slab(psi_c, psi_u, psi_d), grow, nglob))
        trv = _views(_yfix(tr, grow, nglob, sign=1.0), sign=1.0)  # Neumann
    # one psi-view set per tracer: flatten order (l, j) -> repeat per layer
    pv_e = {k: jnp.repeat(a, nptr, axis=0) for k, a in pv.items()}

    dtr = _mjac(pv_e, trv, i12d2)
    lap_tr = (trv["e"] + trv["w"] + trv["n"] + trv["s"]
              - 4.0 * trv["c"]) * id2
    # per-tracer static coefficients applied slice-wise (a constant array
    # would be a captured constant, which pallas_call rejects)
    dtr = jnp.stack([dtr[k] + iPe[k % nptr] * lap_tr[k]
                     for k in range(nl * nptr)], axis=0)
    dtr = dtr[:, _H:T + _H, :]
    trc = tr[:, _H:T + _H, :]
    tgt = (relax_c[:] - trc) if has_relax else -trc
    out_ref[:] = jnp.stack([dtr[k] + ptr_ir[k % nptr] * tgt[k]
                            for k in range(nl * nptr)], axis=0)


def tracer_fused(cfg, const, psi: jnp.ndarray, tracers: jnp.ndarray,
                 interpret: bool | None = None, *, psi_ext=None,
                 tr_ext=None, row0=None) -> jnp.ndarray:
    """dtracers (nl, nptr, N, N) — the fused ptr_rhs: Arakawa advection by
    psi + explicit diffusion /Pe + relaxation (msqg/qg.h:573-588), Neumann
    tracer walls (set_vars bc_type+1, qg.h:869). Rows-sharded mode as in
    rhs_fused: tr_ext is ext_rows8 of the FLATTENED (nl*nptr, n_loc, nx)
    tracer shard."""
    if interpret is None:
        interpret = default_interpret()
    kd: RhsKernelData = const.rhsk
    nl, n, nx = psi.shape
    nptr = cfg.nptr
    ntr = nl * nptr
    T = kd.Ttr
    nb, tb = n // 8, T // 8
    tr_flat = tracers.reshape(ntr, n, nx)
    has_relax = const.ptr_relax is not None
    periodic = cfg.sbc < 0
    rows = kd.rows > 0
    if rows:
        assert psi_ext is not None and tr_ext is not None \
            and row0 is not None, "rows-sharded tracer_fused needs ext+row0"

    def specs3(c):
        center = pl.BlockSpec((c, T, nx), lambda i: (0, i, 0))
        if rows:
            up = pl.BlockSpec((c, 8, nx), lambda i: (0, i * tb, 0))
            down = pl.BlockSpec((c, 8, nx),
                                lambda i: (0, (i + 1) * tb + 1, 0))
        elif periodic:
            up = pl.BlockSpec((c, 8, nx),
                              lambda i: (0, (i * tb - 1) % nb, 0))
            down = pl.BlockSpec((c, 8, nx),
                                lambda i: (0, ((i + 1) * tb) % nb, 0))
        else:
            up = pl.BlockSpec((c, 8, nx),
                              lambda i: (0, jnp.maximum(i * tb - 1, 0), 0))
            down = pl.BlockSpec((c, 8, nx),
                                lambda i: (0, jnp.minimum((i + 1) * tb,
                                                          nb - 1), 0))
        return [center, up, down]

    def tri(center, ext):
        return [center, ext, ext] if rows else [center, center, center]

    args = tri(psi, psi_ext) + tri(tr_flat, tr_ext)
    in_specs = specs3(nl) + specs3(ntr)
    if has_relax:
        args += [const.ptr_relax.reshape(ntr, n, nx)]
        in_specs += [pl.BlockSpec((ntr, T, nx), lambda i: (0, i, 0))]
    args += [jnp.zeros((1,), jnp.int32) if row0 is None
             else jnp.asarray(row0, jnp.int32).reshape(1)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
    kern = functools.partial(
        _tracer_kernel, T=T, nglob=cfg.N, nl=nl, nptr=nptr,
        delta=float(cfg.delta),
        iPe=tuple(float(v) for v in cfg.iPe[:nptr]),
        ptr_ir=tuple(float(v) for v in cfg.ptr_ir[:nptr]),
        has_relax=has_relax, periodic=periodic)
    dtr = pl.pallas_call(
        kern,
        grid=(n // T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ntr, T, nx), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((ntr, n, nx), psi.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return dtr.reshape(nl, nptr, n, nx)
