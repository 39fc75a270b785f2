"""Term-by-term energy budget diagnostics for the msqg model.

Re-implements /root/reference/msqg/qg_energy.h: every PV-equation term is
multiplied by the weight w = -psi*(1-ediag) + ediag and dt, and accumulated
into per-term fields between outputs:
  de_j1  — self-advection J(psi, q) part
  de_j2  — large-scale coupling J(psi_pg, q) part
  de_j3  — beta + J(psi, q_pg) part
  de_vd  — harmonic + biharmonic dissipation
  de_bf  — surface/bottom Ekman friction
  de_ft  — wavelet-filter energy flux (accumulated at filter events)
The jc = J(psi, psi_pg) cross-term cancels between j2 and j3 exactly as in
the reference split (qg_energy.h:19-26, 70-71), so with ediag=1 and dt=1 the
sum j1+j2+j3+vd+bf reproduces the unforced RHS identically — the invariant
the tests pin down.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from msom_tpu.ops.bc import BC, pad
from msom_tpu.ops.ghost import (arakawa_mjac_g, beta_effect_g, ghosted,
                                ghosted_from_padded, laplacian_g)
from msom_tpu.ops.stretch import stretch
from msom_tpu.models.qg import QGConstants, _bc_psi, _ghost_deriv
from msom_tpu.params import QGConfig


@dataclasses.dataclass
class EnergyAccum:
    de_bf: jnp.ndarray
    de_vd: jnp.ndarray
    de_j1: jnp.ndarray
    de_j2: jnp.ndarray
    de_j3: jnp.ndarray
    de_ft: jnp.ndarray
    po_mft: jnp.ndarray    # running mean of psi between filter events
    nme_ft: jnp.ndarray


jax.tree_util.register_dataclass(
    EnergyAccum,
    data_fields=["de_bf", "de_vd", "de_j1", "de_j2", "de_j3", "de_ft",
                 "po_mft", "nme_ft"],
    meta_fields=[])


def init_energy(cfg: QGConfig) -> EnergyAccum:
    z = jnp.zeros((cfg.nl, cfg.N, cfg.N), jnp.dtype(cfg.dtype))
    return EnergyAccum(de_bf=z, de_vd=z, de_j1=z, de_j2=z, de_j3=z, de_ft=z,
                       po_mft=z, nme_ft=jnp.asarray(0, jnp.int32))


def _weight(psi, ediag):
    return -psi * (1.0 - ediag) + ediag


def advection_de(cfg: QGConfig, const: QGConstants, psi, psi_g, zeta_g,
                 dt, ediag):
    """(dj1, dj2, dj3) increments (advection_de,
    /root/reference/msqg/qg_energy.h:27-154), vectorized over layers with the
    ju/jd swap pattern ju2 = -jd3_prev, ju3 = -jd2_prev."""
    d = cfg.delta
    nl = cfg.nl
    mj = arakawa_mjac_g
    # pruned pp (no PG coupling): all J(., pp) contributions are zero
    have_pg = const.pp_pad is not None
    pp = ghosted_from_padded(const.pp_pad) if have_pg else None
    w = _weight(psi, ediag) * dt
    dj1 = mj(psi_g, zeta_g, d) * w
    dj2 = mj(pp, zeta_g, d) * w if have_pg else jnp.zeros_like(dj1)
    dj3 = beta_effect_g(psi_g, cfg.beta, d) * w
    if cfg.flsrv == 1 and const.zetap_pad is not None:
        dj3 = dj3 + mj(psi_g, ghosted_from_padded(const.zetap_pad), d) * w
    if nl > 1:
        idh0 = jnp.asarray(const.idh0, psi.dtype).reshape(nl, 1, 1)
        idh1 = jnp.asarray(const.idh1, psi.dtype).reshape(nl, 1, 1)
        jd1 = mj(psi_g[:-1], psi_g[1:], d)          # (nl-1, N, N) interfaces
        s = const.strl
        # downward terms at layer l (l < nl-1): s1 * (...) * idh1
        dj1 = dj1.at[:-1].add(s * jd1 * idh1[:-1] * w[:-1])
        # upward terms at layer l (l > 0): ju1 = -jd1[l-1], ju2 = -jd3[l-1],
        # ju3 = -jd2[l-1] (the swap, qg_energy.h:93-95)
        dj1 = dj1.at[1:].add(-s * jd1 * idh0[1:] * w[1:])
        if have_pg:
            jd2 = mj(pp[:-1], psi_g[1:], d)
            jd3 = mj(psi_g[:-1], pp[1:], d)
            jc = mj(psi_g, pp, d)                    # (nl, N, N) per layer
            dj2 = dj2.at[:-1].add(s * (jd2 + jc[:-1]) * idh1[:-1] * w[:-1])
            dj3 = dj3.at[:-1].add(s * (jd3 - jc[:-1]) * idh1[:-1] * w[:-1])
            dj2 = dj2.at[1:].add(s * (-jd3 + jc[1:]) * idh0[1:] * w[1:])
            dj3 = dj3.at[1:].add(s * (-jd2 - jc[1:]) * idh0[1:] * w[1:])
    return dj1, dj2, dj3


def dissip_de(cfg: QGConfig, const: QGConstants, psi, zeta, zeta_g, dt,
              ediag):
    """de_vd increment (dissip_de, /root/reference/msqg/qg_energy.h:157-187)."""
    d = cfg.delta
    w = _weight(psi, ediag) * dt
    tmp = laplacian_g(zeta_g, d)
    out = cfg.iRe * tmp * w
    if cfg.nl > 1:
        out = out + cfg.iRe * stretch(zeta, const.strl, const.idh0,
                                      const.idh1) * w
    tmp_g = _ghost_deriv(cfg, tmp, zeta_g)
    bih = laplacian_g(tmp_g, d)
    if cfg.nl > 1:
        bih = bih + stretch(tmp, const.strl, const.idh0, const.idh1)
    return out + cfg.iRe4 * bih * w


def ekman_de(cfg: QGConfig, psi, zeta, dt, ediag):
    """de_bf increment (/root/reference/msqg/qg_energy.h:190-204)."""
    w = _weight(psi, ediag) * dt
    out = jnp.zeros_like(psi)
    out = out.at[0].add(-cfg.Eks / (cfg.Rom * 2 * cfg.dh[0]) * zeta[0] * w[0])
    out = out.at[cfg.nl - 1].add(
        -cfg.Ekb / (cfg.Rom * 2 * cfg.dh[cfg.nl - 1]) * zeta[cfg.nl - 1]
        * w[cfg.nl - 1])
    return out


def energy_tend(cfg: QGConfig, const: QGConstants, acc: EnergyAccum, psi, dt):
    """Per-step accumulation (energy_tend + comp_diag event,
    /root/reference/msqg/qg_energy.h:228-242, 286-288)."""
    ediag = float(max(cfg.ediag, 0))
    bc = _bc_psi(cfg)
    psi_g = ghosted(psi, bc)
    zeta = laplacian_g(psi_g, cfg.delta)
    zeta_g = _ghost_deriv(cfg, zeta, psi_g)
    dj1, dj2, dj3 = advection_de(cfg, const, psi, psi_g, zeta_g, dt, ediag)
    dvd = dissip_de(cfg, const, psi, zeta, zeta_g, dt, ediag)
    dbf = ekman_de(cfg, psi, zeta, dt, ediag)
    po_mft = (acc.po_mft * acc.nme_ft + psi) / (acc.nme_ft + 1)
    return dataclasses.replace(
        acc, de_j1=acc.de_j1 + dj1, de_j2=acc.de_j2 + dj2,
        de_j3=acc.de_j3 + dj3, de_vd=acc.de_vd + dvd, de_bf=acc.de_bf + dbf,
        po_mft=po_mft, nme_ft=acc.nme_ft + 1)


def filter_de(cfg: QGConfig, const: QGConstants, acc: EnergyAccum, q, psi):
    """Filter-event energy flux (filter_de,
    /root/reference/msqg/qg_energy.h:207-226): evaluate the filter WITHOUT
    advancing the state (dtflt < 0 restores q in the reference) and
    accumulate de_ft += (q_pre - q_post)/(-dtflt) * dtflt * w(po_mft)."""
    from msom_tpu.models import qg as m
    from msom_tpu.ops.wavelet import filter_field

    ediag = float(max(cfg.ediag, 0))
    bc = _bc_psi(cfg)
    psi_inv, _ = m.invert_q(cfg, const, psi, q)
    psi_f = filter_field(psi_inv, const.sig_lev, bc)
    q_post = m.comp_q(cfg, const, psi_f)
    tmp2 = (q - q_post) / (-cfg.dtflt)
    w = _weight(acc.po_mft, ediag)
    de_ft = acc.de_ft + tmp2 * cfg.dtflt * w
    return dataclasses.replace(acc, de_ft=de_ft,
                               po_mft=jnp.zeros_like(acc.po_mft),
                               nme_ft=jnp.asarray(0, jnp.int32))


def reset_window(acc: EnergyAccum) -> EnergyAccum:
    """Zero the per-window accumulators after an output flush
    (/root/reference/msqg/qg.c:159-166)."""
    z = jnp.zeros_like(acc.de_bf)
    return dataclasses.replace(acc, de_bf=z, de_vd=z, de_j1=z, de_j2=z,
                               de_j3=z, de_ft=z)
