"""Surface-QG variant of the nodal model — COMPLETED design.

The reference ships an *unfinished* SQG variant
(/root/reference/qg-node/sqg_baroclinic_ms.h — rhs_bs stops mid-statement at
:239, marked "TODO: STOPPED HERE" :235). This module implements the design
that file sketches, finished and made self-consistent:

* surface buoyancy `bs` is an extra prognostic on the (N+1)^2 vertex grid;
* SQG layer metrics: idh0[0] = 1/dh[0], idh1[0] = 1/(dhc[0]*dh[0])
  (sqg_baroclinic_ms.h:500-509), surface S2[0] = f/N^2[0] and interior
  S2[l] = f^2/N^2[l] (:544-549);
* the top-layer stretching is S2[0]*bs*idh0[0] - S2[1]*(psi0-psi1)*idh1[0]
  (comp_stretch, :77-98) — here split into the psi-part (which enters the
  elliptic inversion operator) and the KNOWN bs source moved to the
  right-hand side, so the nodal multigrid (solvers.vmg) is reused unchanged;
* prognostic PV q excludes the bs source (q = lap(psi) + Gamma_psi(psi)),
  whose evolution is carried by bs itself:
      dbs/dt = -J(psi_0 + psi_pg_0, bs) + nu*lap(bs) - nu4*lap^2(bs)
  with homogeneous Neumann walls (the Neumann hints the reference leaves on
  del2_bs/del4_bs, :212-231) and the interior mask applied as in rhs_pv;
* dq/dt is the baroclinic rhs_pv with the SQG interface metrics.

bs == 0 reduces exactly to models.qg_node's baroclinic path with the SQG
metrics (tested)."""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from msom_tpu.models import qg_node as node
from msom_tpu.ops import vertex
from msom_tpu.ops.stencil import arakawa_mjac
from msom_tpu.ops.stretch import stretch
from msom_tpu.solvers import vmg


@dataclasses.dataclass(frozen=True)
class SQGConstants:
    mask: jnp.ndarray
    psi_pg: jnp.ndarray
    S2: jnp.ndarray            # (nl, N+1, N+1): [0]=surface f/N^2, rest f^2/N^2
    topo: jnp.ndarray
    vlevels: Any
    yv: jnp.ndarray
    idh0: tuple                # SQG metrics: idh0[0] = 1/dh[0]
    idh1: tuple


jax.tree_util.register_dataclass(
    SQGConstants,
    data_fields=["mask", "psi_pg", "S2", "topo", "vlevels", "yv"],
    meta_fields=["idh0", "idh1"])


@dataclasses.dataclass
class SQGState:
    q: jnp.ndarray
    bs: jnp.ndarray            # (N+1, N+1) surface buoyancy
    psi: jnp.ndarray
    t: jnp.ndarray
    dt_prev: jnp.ndarray
    i: jnp.ndarray
    key: jnp.ndarray


jax.tree_util.register_dataclass(
    SQGState, data_fields=["q", "bs", "psi", "t", "dt_prev", "i", "key"],
    meta_fields=[])


class SQGStepDiag(NamedTuple):
    dt: jnp.ndarray
    ke: jnp.ndarray
    bs2: jnp.ndarray           # surface buoyancy variance (conservation oracle)
    mg_iters: jnp.ndarray


def sqg_metrics(dh):
    """idh0/idh1 with the SQG surface convention
    (sqg_baroclinic_ms.h:500-509)."""
    dh = np.asarray(dh, np.float64)
    nl = len(dh)
    dhc = 0.5 * (dh[:-1] + dh[1:])
    idh0 = np.zeros(nl)
    idh1 = np.zeros(nl)
    idh0[0] = 1.0 / dh[0]
    if nl > 1:
        idh1[0] = 1.0 / (dhc[0] * dh[0])
        for l in range(1, nl - 1):
            idh0[l] = 1.0 / (dhc[l - 1] * dh[l])
            idh1[l] = 1.0 / (dhc[l] * dh[l])
        idh0[nl - 1] = 1.0 / (dhc[nl - 2] * dh[nl - 1])
    return idh0, idh1


def build_constants(cfg: node.NodeQGConfig, *, mask=None, psi_pg=None,
                    N2=None, topo=None) -> SQGConstants:
    """cfg.N2 must have nl entries: N2[0] at the surface, N2[1:] at the
    nl-1 interior interfaces."""
    dt = jnp.dtype(cfg.dtype)
    N, nl = cfg.N, cfg.nl
    assert nl >= 2, "SQG variant needs nl >= 2"
    xv = np.arange(N + 1) * cfg.delta
    _, Yv = np.meshgrid(xv, xv, indexing="xy")
    if mask is None:
        mask = vertex.default_mask(N, dt)
    else:
        mask = jnp.asarray(mask, dt)
    idh0, idh1 = sqg_metrics(cfg.dh[:nl])
    if psi_pg is None:
        psi_pg = jnp.zeros((nl, N + 1, N + 1), dt)
    else:
        psi_pg = jnp.asarray(psi_pg, dt)
    if N2 is None:
        N2a = np.asarray(cfg.N2[:nl], np.float64)[:, None, None] \
            * np.ones((nl, N + 1, N + 1))
    else:
        N2a = np.asarray(N2, np.float64)[:nl]
    f_var = cfg.f0 + cfg.flag_ms * cfg.beta * (Yv - 0.5 * cfg.L0)
    S2 = np.empty_like(N2a)
    S2[0] = f_var / N2a[0]              # surface: f/N^2 (:544-549)
    S2[1:] = f_var ** 2 / N2a[1:]       # interfaces: f^2/N^2
    S2 = jnp.asarray(S2, dt)
    topo_arr = jnp.zeros((N + 1, N + 1), dt) if topo is None \
        else jnp.asarray(topo, dt) * cfg.scale_topo
    # the inversion couples layers through the INTERFACE values S2[1:] with
    # zero top coupling (t0[0] = 0 in relax_baroclinic regardless,
    # sqg_baroclinic_ms.h:286-292) — i.e. the standard layered operator with
    # coupling metrics (0, idh0[1:]) x idh1
    idh0_c = np.r_[0.0, idh0[1:]]
    vlevels = vmg.build_vlevels(nl=nl, N=N, L0=cfg.L0, S2=S2[1:],
                                idh0=idh0_c, idh1=idh1, iRd2_low=0.0,
                                mask=mask, dtype=dt)
    return SQGConstants(mask=mask, psi_pg=psi_pg, S2=S2, topo=topo_arr,
                        vlevels=vlevels, yv=jnp.asarray(Yv, dt),
                        idh0=tuple(float(v) for v in idh0),
                        idh1=tuple(float(v) for v in idh1))


def _node_const(cfg, const: SQGConstants) -> node.NodeQGConstants:
    """View the SQG constants as a baroclinic NodeQGConstants with the
    psi-coupling metrics (zero top idh0): rhs_pv and inversion are reused."""
    return node.NodeQGConstants(
        mask=const.mask, psi_pg=const.psi_pg, S2=const.S2[1:],
        topo=const.topo, q_forcing_3d=None, sig_lev=None, sig_lev_c=None,
        mask_c=None, vlevels=const.vlevels, yv=const.yv,
        idh0=(0.0,) + const.idh0[1:], idh1=const.idh1)


def bs_source(cfg, const: SQGConstants, bs):
    """S2[0]*bs*idh0[0] at the top layer — the known part of the stretching
    (comp_stretch upper-layer bs term, sqg_baroclinic_ms.h:84)."""
    nl = cfg.nl
    src = const.S2[0] * bs * const.idh0[0]
    zeros = jnp.zeros((nl - 1,) + bs.shape, bs.dtype)
    return jnp.concatenate([src[None], zeros], axis=0)


def comp_q(cfg, const: SQGConstants, psi, bs):
    """q including the bs stretching (comp_q_baroclinic + comp_stretch with
    bs)."""
    nc = _node_const(cfg, const)
    return node.comp_q(cfg, nc, psi) + bs_source(cfg, const, bs)


def invert_q(cfg, const: SQGConstants, psi_guess, q, bs):
    """Solve lap(psi) + Gamma_psi(psi) = q - bs_source."""
    nc = _node_const(cfg, const)
    return node.invert_q(cfg, nc, psi_guess, q - bs_source(cfg, const, bs))


def rhs_bs(cfg, const: SQGConstants, psi, bs):
    """dbs/dt = -J(psi_0 + psi_pg_0, bs) + nu*lap(bs) - nu4*lap^2(bs),
    Neumann walls, masked interior (the completed rhs_bs)."""
    d = cfg.delta
    ps = psi[0] + const.psi_pg[0]

    def J(p, b):
        out = jnp.zeros_like(b)
        return out.at[1:-1, 1:-1].set(arakawa_mjac(b, p, d))

    def lap_neumann(b):
        P = jnp.pad(b, ((1, 1), (1, 1)), mode="edge")
        return (P[2:, 1:-1] + P[:-2, 1:-1] + P[1:-1, 2:] + P[1:-1, :-2]
                - 4.0 * b) / (d * d)

    db = -J(ps, bs)
    if cfg.nu != 0.0:
        db = db + cfg.nu * lap_neumann(bs)
    if cfg.nu4 != 0.0:
        db = db - cfg.nu4 * lap_neumann(lap_neumann(bs))
    return db * const.mask


def init_state(cfg, const: SQGConstants, *, psi0=None, bs0=None,
               seed=0) -> SQGState:
    dt = jnp.dtype(cfg.dtype)
    N, nl = cfg.N, cfg.nl
    key = jax.random.PRNGKey(seed)
    if psi0 is None:
        key, sub = jax.random.split(key)
        psi = cfg.noise_init * jax.random.uniform(
            sub, (nl, N + 1, N + 1), dt, -1.0, 1.0)
    else:
        psi = jnp.asarray(psi0, dt)
    psi = vertex.bc_psi(psi)
    if bs0 is None:
        key, sub = jax.random.split(key)
        bs = cfg.noise_init * jax.random.uniform(sub, (N + 1, N + 1), dt,
                                                 -1.0, 1.0) * const.mask
    else:
        bs = jnp.asarray(bs0, dt)
    q = comp_q(cfg, const, psi, bs)
    return SQGState(q=q, bs=bs, psi=psi, t=jnp.asarray(0.0, dt),
                    dt_prev=jnp.asarray(0.0, dt),
                    i=jnp.asarray(0, jnp.int32), key=key)


def make_step(cfg: node.NodeQGConfig):
    """Predictor-corrector advancing (q, bs) together."""
    DT = cfg.dt_clamped()

    def step(state: SQGState, const: SQGConstants, tnext):
        from msom_tpu.models.qg import dtnext

        def update(q, bs, psi_guess, prev, t):
            psi, st = invert_q(cfg, const, psi_guess, q, bs)
            nc = _node_const(cfg, const)
            dq = node.rhs_pv(cfg, nc, q, psi, t)
            db = rhs_bs(cfg, const, psi, bs)
            dtm, prev = node.adjust_dt(cfg, psi, DT, prev)
            return dq, db, psi, prev, dtm, st

        dq, db, psi1, prev, dtm, st = update(state.q, state.bs, state.psi,
                                             state.dt_prev, state.t)
        dt = dtnext(state.t, tnext, dtm)
        q_half = state.q + dq * (dt / 2)
        bs_half = state.bs + db * (dt / 2)
        dq2, db2, psi2, prev, _, _ = update(q_half, bs_half, psi1, prev,
                                            state.t)
        q_new = state.q + dq2 * dt
        bs_new = state.bs + db2 * dt

        d2 = cfg.delta ** 2
        ke = -jnp.sum(0.5 * psi2[0] * vmg._vlap(psi2, cfg.delta)[0]) * d2
        bs2 = jnp.sum(bs_new ** 2) * d2
        new = SQGState(q=q_new, bs=bs_new, psi=psi2, t=state.t + dt,
                       dt_prev=prev, i=state.i + 1, key=state.key)
        return new, SQGStepDiag(dt=dt, ke=ke, bs2=bs2, mg_iters=st.iters)

    return step
