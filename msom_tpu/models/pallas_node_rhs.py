"""Fused Pallas TPU kernel for the qg-node RHS (rhs_pv hot path).

One HBM pass over the (nl, N+1, N+1) VERTEX arrays computes the whole of
rhs_pv_baroclinic (/root/reference/qg-node/qg_baroclinic_ms.h:103-196):
mask-multiplied psi, zeta = lap(psi) with the partial-slip ring relation,
Arakawa self- and PG-advection, beta, the stretch-Jacobian cascade ju/jd,
bottom friction + topography, harmonic nu (stretch + del2 with the
set_bc_ms tmp ring relation) and biharmonic -nu4 dissipation, the
wandering-wind surface forcing and the 3-D forcing — or
rhs_pv_barotropic (qg_barotropic.h:16-29) for nl = 1. The XLA lowering of
the same math costs ~9.6 ms at 2048^2 x 4 on v5e (PERF.md r4).

The vertex grid is SIMPLER for a kernel than the cell grid: boundary nodes
live IN the array (no ghost materialization) — stencils are plain rolls,
interior-only quantities are zeroed on the ring, and the two ring RULES
(bc_deriv: ring = 2*bc_fac/Delta^2 * first_interior(psi);
bc_deriv_rel for the biharmonic intermediate: parent's own ring
subtracted) are where-applied from global row/col indices. The (N+1) rows
do NOT divide the tile: Pallas's ragged-grid support pads the out-of-range
block reads and discards out-of-range writes, and every surviving value
only reads rows/cols <= N (ring values are rule-set before being read), so
the padding garbage never propagates (probed on hardware, r4).

Gating (models/qg_node.rhs_pv): walled grids (any mask — the mask streams
as a tile input) with x-constant S2 (a y-profile; flag_ms y-variation is
fine, an N2 input field is not).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msom_tpu.models.pallas_rhs import (_mjac, _stretch_prof, _vslice,
                                        _VMEM_BUDGET, _VMEM_CAP)
from msom_tpu.solvers.pallas_mg import default_interpret

_H = 3


@dataclasses.dataclass(frozen=True)
class NodeRhsData:
    """Static per-config data for the fused nodal RHS kernel."""
    S2: jnp.ndarray | None     # (ntiles, nl-1, T+6, 1) tiled y-profile
    T: int
    has_pg: bool               # static content flags (decided at build —
    has_topo: bool             # const is traced inside the jitted step)
    has_qf3: bool


jax.tree_util.register_dataclass(
    NodeRhsData, data_fields=["S2"],
    meta_fields=["T", "has_pg", "has_topo", "has_qf3"])


def _pick_tile_node(M: int, nfields: float, itemsize: int) -> int | None:
    """Same throughput law as pallas_rhs._pick_tile (330 KB per field-layer
    buffer + the live-VMEM cap) but WITHOUT divisibility — the ragged last
    block is handled by Pallas grid padding."""
    if M < 65:
        return None
    for t in (128, 64, 32, 16, 8):
        if t <= M // 2 \
                and 44.0 * (t + 6) * M * itemsize <= _VMEM_BUDGET \
                and 5.5 * nfields * (t + 6) * M * itemsize <= _VMEM_CAP:
            return t
    return None


def _tile_profile_ragged(prof: np.ndarray, T: int, halo: int,
                         ntiles: int) -> np.ndarray:
    """(nl, M) y-profile -> (ntiles, nl, T + 2*halo, 1), clip-indexed."""
    nl, M = prof.shape
    rows = np.arange(-halo, T + halo)
    out = np.empty((ntiles, nl, T + 2 * halo, 1), prof.dtype)
    for i in range(ntiles):
        out[i, :, :, 0] = prof[:, np.clip(i * T + rows, 0, M - 1)]
    return out


def build_node_kernel_data(cfg, S2, psi_pg, topo,
                           q_forcing_3d) -> NodeRhsData | None:
    """None when the fused path does not apply (periodic, x-varying S2,
    no feasible tile)."""
    if cfg.periodic:
        return None
    M = cfg.N + 1
    nl = cfg.nl
    dt = jnp.dtype(cfg.dtype)
    sprof = None
    if nl > 1:
        s_np = np.asarray(S2)
        if not np.array_equal(s_np, np.broadcast_to(s_np[..., :1],
                                                    s_np.shape)):
            return None
        sprof = s_np[..., 0]                    # (nl-1, M)
    has_pg = bool(nl > 1 and psi_pg is not None
                  and np.any(np.asarray(psi_pg)))
    has_topo = bool(topo is not None and np.any(np.asarray(topo)))
    # field-equivalent count per nl channel (mirrors
    # pallas_rhs.build_kernel_data): psi + zeta/tmp temporaries (2) + the
    # mask and topo single-channel streams + pp + q (barotropic) + qf3
    nfields = (2.0 + 1.0 / nl
               + (1.0 if has_pg else 0.0)
               + (1.5 / nl if has_topo else 0.0)
               + (1.0 / nl if nl == 1 else 0.0)
               + (0.5 if q_forcing_3d is not None else 0.0))
    T = _pick_tile_node(M, nfields * max(nl, 2), dt.itemsize)
    if T is None:
        return None
    ntiles = (M + T - 1) // T
    S2t = None
    if sprof is not None:
        S2t = jnp.asarray(_tile_profile_ragged(sprof, T, _H, ntiles), dt)
    return NodeRhsData(
        S2=S2t, T=T, has_pg=has_pg, has_topo=has_topo,
        has_qf3=q_forcing_3d is not None)


def _node_kernel(*refs, T, Mglob, delta, beta, nu, nu4, fric, topo_fac,
                 idh0, idh1, bc_fac, nl, has_pg, has_topo, has_qf3,
                 has_S2):
    it = iter(refs)
    psi_c, psi_u, psi_d = next(it), next(it), next(it)
    m_c, m_u, m_d = next(it), next(it), next(it)
    if nl == 1:
        q_c, q_u, q_d = next(it), next(it), next(it)
    if has_pg:
        pp_c, pp_u, pp_d = next(it), next(it), next(it)
    if has_topo:
        topo_c, topo_u, topo_d = next(it), next(it), next(it)
    if has_qf3:
        qf3_c = next(it)
    if has_S2:
        S2_r = next(it)
    qf_r = next(it)
    (out_ref,) = it

    i = pl.program_id(0)
    nx = psi_c.shape[-1]
    d2 = delta * delta
    id2 = 1.0 / d2
    i12d2 = id2 / 12.0
    R = T + 2 * _H
    c2 = 2.0 * bc_fac * id2

    def slab(c, u, d):
        return jnp.concatenate(
            [u[:, 8 - _H:8, :], c[:], d[:, 0:_H, :]], axis=1)

    grow = jax.lax.broadcasted_iota(jnp.int32, (R, nx), 0) + i * T - _H
    gcol = jax.lax.broadcasted_iota(jnp.int32, (R, nx), 1)
    row_lo, row_hi = grow == 0, grow == Mglob - 1
    col_lo, col_hi = gcol == 0, gcol == Mglob - 1
    ring = row_lo | row_hi | col_lo | col_hi
    corner = (row_lo | row_hi) & (col_lo | col_hi)

    def views(f):
        fE = jnp.roll(f, -1, axis=-1)
        fW = jnp.roll(f, 1, axis=-1)
        fN = jnp.roll(f, -1, axis=-2)
        fS = jnp.roll(f, 1, axis=-2)
        return dict(c=f, e=fE, w=fW, n=fN, s=fS,
                    ne=jnp.roll(fE, -1, axis=-2),
                    se=jnp.roll(fE, 1, axis=-2),
                    nw=jnp.roll(fW, -1, axis=-2),
                    sw=jnp.roll(fW, 1, axis=-2))

    def interior0(x):
        return jnp.where(ring[None], jnp.zeros((), x.dtype), x)

    def vlap0(v):
        """Masked 5-point vertex Laplacian, zero ring (vmg._vlap)."""
        return interior0((v["e"] + v["w"] + v["n"] + v["s"]
                          - 4.0 * v["c"]) * id2)

    def ring_rule(f, parent_v, sub=None):
        """bc_deriv / bc_deriv_rel (ops.vertex): non-corner ring value =
        c2*(first_interior(parent) - sub); corners 0. Each non-corner ring
        node belongs to exactly one wall, so the where-chain order is
        immaterial; `sub` (the parent's own ring value, set_bc_ms's tmp
        relation) is read at the ring position itself."""
        pv = parent_v
        fi = jnp.where(col_lo[None], pv["e"],
                       jnp.where(col_hi[None], pv["w"],
                                 jnp.where(row_lo[None], pv["n"],
                                           pv["s"])))
        val = c2 * (fi - (0.0 if sub is None else sub))
        out = jnp.where(ring[None], val, f)
        return jnp.where(corner[None], jnp.zeros((), f.dtype), out)

    mask = slab(m_c, m_u, m_d)[0]                     # (R, nx)
    psi = slab(psi_c, psi_u, psi_d)

    def J(p_v, q_v):
        """+jacobian(p, q) of the qg-node macro = _mjac with swapped args
        (models.qg_node.rhs_pv), interior-zeroed."""
        return interior0(_mjac(q_v, p_v, i12d2))

    def beta_term(p_v):
        return interior0(beta * (p_v["e"] - p_v["w"]) / (2.0 * delta))

    qf = qf_r[:, 0]                                   # (T,) out-row profile
    m_out = mask[_H:T + _H, :]

    if nl == 1:
        q = slab(q_c, q_u, q_d)
        pv = views(psi)
        qv = views(q)
        dq = (-J(pv, qv) - beta_term(pv) - fric * q
              + nu * vlap0(qv))[:, _H:T + _H, :]
        dq = dq + qf[None, :, None]
        out_ref[:] = dq * m_out[None]
        return

    psi = psi * mask[None]
    pv = views(psi)
    zeta = vlap0(pv)
    zeta = ring_rule(zeta, pv)
    zv = views(zeta)

    if has_pg:
        ppv = views(slab(pp_c, pp_u, pp_d))

    s = S2_r[0, :, :, :] if has_S2 else None          # (nl-1, R, 1)

    dq = -J(pv, zv) - beta_term(pv)
    if has_pg:
        dq = dq - J(ppv, zv)

    Jd = J(_vslice(pv, slice(None, -1)), _vslice(pv, slice(1, None)))
    if has_pg:
        Jd = Jd + J(_vslice(ppv, slice(None, -1)),
                    _vslice(pv, slice(1, None))) \
            + J(_vslice(pv, slice(None, -1)),
                _vslice(ppv, slice(1, None)))
    sj = s * Jd
    rows = []
    for l in range(nl):
        g = dq[l]
        if l < nl - 1:
            g = g - sj[l] * idh1[l]
        if l > 0:
            g = g + sj[l - 1] * idh0[l]
        rows.append(g)
    dq = jnp.stack(rows, axis=0)

    # bottom friction + topography (one combined add, matching the model's
    # association order)
    bot = -fric * zeta[nl - 1:nl]
    if has_topo:
        tv = views(slab(topo_c, topo_u, topo_d))        # (1, R, nx)
        bot = bot - J(_vslice(pv, slice(nl - 1, nl)), tv) * topo_fac
    dq = jnp.concatenate([dq[:nl - 1], dq[nl - 1:] + bot], axis=0)

    # dissipation: nu*(stretch(zeta) + tmp), -nu4*(stretch(tmp) + lap(tmp))
    dq = dq + nu * _stretch_prof(zeta, s, idh0, idh1)
    tmp = vlap0(zv)
    tmp = ring_rule(tmp, zv, sub=zeta)
    dq = dq + nu * tmp
    if nu4 != 0.0:
        tv_ = views(tmp)
        dq = dq - nu4 * (_stretch_prof(tmp, s, idh0, idh1) + vlap0(tv_))

    dq = dq[:, _H:T + _H, :]
    dq = jnp.concatenate([(dq[0] + qf[:, None])[None], dq[1:]], axis=0)
    if has_qf3:
        dq = dq + qf3_c[:]
    out_ref[:] = dq * m_out[None]


def rhs_fused_node(cfg, const, q, psi, qf_profile,
                   interpret: bool | None = None):
    """dq = rhs_pv on the vertex grid via the fused kernel. `qf_profile`:
    the (N+1,) y-profile of the time-varying wind forcing (traced — it
    depends on t)."""
    if interpret is None:
        interpret = default_interpret()
    kd: NodeRhsData = const.nrhsk
    nl = cfg.nl
    M = cfg.N + 1
    T = kd.T
    nt = (M + T - 1) // T
    nb = (M + 7) // 8
    tb = T // 8
    has_pg = kd.has_pg
    has_topo = kd.has_topo
    has_qf3 = kd.has_qf3
    has_S2 = kd.S2 is not None

    def specs3(c):
        center = pl.BlockSpec((c, T, M), lambda i: (0, i, 0))
        up = pl.BlockSpec((c, 8, M),
                          lambda i: (0, jnp.maximum(i * tb - 1, 0), 0))
        down = pl.BlockSpec((c, 8, M),
                            lambda i: (0, jnp.minimum((i + 1) * tb,
                                                      nb - 1), 0))
        return [center, up, down]

    mask = const.mask[None]
    args = [psi, psi, psi, mask, mask, mask]
    in_specs = specs3(nl) + specs3(1)
    if nl == 1:
        args += [q, q, q]
        in_specs += specs3(1)
    if has_pg:
        args += [const.psi_pg] * 3
        in_specs += specs3(nl)
    if has_topo:
        topo = const.topo[None]
        args += [topo, topo, topo]
        in_specs += specs3(1)
    if has_qf3:
        args += [const.q_forcing_3d]
        in_specs += [pl.BlockSpec((nl, T, M), lambda i: (0, i, 0))]
    if has_S2:
        args += [kd.S2]
        in_specs += [pl.BlockSpec((1, kd.S2.shape[1], T + 2 * _H, 1),
                                  lambda i: (i, 0, 0, 0))]
    args += [qf_profile[:, None]]
    in_specs += [pl.BlockSpec((T, 1), lambda i: (i, 0))]

    dh = cfg.dh
    kern = functools.partial(
        _node_kernel, T=T, Mglob=M, delta=float(cfg.delta),
        beta=float(cfg.beta), nu=float(cfg.nu), nu4=float(cfg.nu4),
        fric=float(cfg.hEkb * cfg.f0 / (2.0 * dh[nl - 1])),
        topo_fac=float(cfg.f0 / dh[nl - 1]),
        idh0=tuple(float(v) for v in const.idh0),
        idh1=tuple(float(v) for v in const.idh1),
        bc_fac=float(cfg.bc_fac), nl=nl, has_pg=has_pg,
        has_topo=has_topo, has_qf3=has_qf3, has_S2=has_S2)
    dq = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nl, T, M), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((nl, M, M), psi.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return dq
