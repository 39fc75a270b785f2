"""Nodal (vertex-grid) multi-layer QG model — the qg-node family.

TPU-native re-implementation of /root/reference/qg-node/: vertex fields on
(N+1)^2 nodes with an interior mask, function-pointer solver variants
(barotropic qg_barotropic.h / baroclinic multi-layer qg_baroclinic_ms.h)
becoming config-selected code paths, the time-varying meridionally-wandering
double-gyre wind recomputed every step (qg.c:136-145), partial-slip bc_fac
boundary machinery, the masked wavelet scale filter, spatially-correlated
stochastic forcing, and the nodal multigrid inversion (solvers/vmg.py).

Sign conventions follow qg-node (OPPOSITE beta convention from msqg,
SURVEY.md §2.3): rhs = -J(psi, zeta) - J(psi_pg, zeta) - beta*v - ... with
J(p,q) the +J Arakawa macro (qg.h:178-188).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msom_tpu.ops import tridiag, vertex
from msom_tpu.ops.stencil import arakawa_mjac
from msom_tpu.ops.stretch import layer_metrics, stretch
from msom_tpu.solvers import vmg


@dataclasses.dataclass(frozen=True)
class NodeQGConfig:
    """qg-node configuration (registry defaults, /root/reference/qg-node/
    qg.h:104-129 and qg.c:60-64)."""
    N: int = 64
    nl: int = 1
    L0: float = 1.0
    f0: float = 1.0
    beta: float = 0.0
    hEkb: float = 0.0
    nu: float = 0.0
    nu4: float = 0.0
    gp_low: float = 0.0
    scale_topo: float = 1.0
    tau0: float = 0.0
    tau1: float = 0.0
    tf1: float = 1.0
    tf2: float = 1.0
    dy_ws: float = 1.0
    forc_mode: float = 2.0
    noise_init: float = 0.0
    Lfmax: float = 1e30
    Lfmin: float = 1e30
    fac_filt_Rd: float = 0.0
    dtflt: float = -1.0
    dh: Tuple[float, ...] = (1.0,)
    N2: Tuple[float, ...] = (1.0,)
    bc_fac: float = 0.0
    flag_ms: int = 0
    DT: float = 1e10
    tend: float = 100.0
    dtout: float = 1.0
    dtdiag: float = -1.0
    CFL: float = 0.5
    TOLERANCE: float = 1e-5
    amp_stoch: float = 0.0
    L_filt_stoch: float = 0.0
    stochastic: bool = False
    use_pallas: bool = True  # TPU-runtime knob: fused nodal RHS kernel
    #                          (models/pallas_node_rhs.py); sharded paths
    #                          keep the partitionable XLA lowering
    solver: str = "auto"     # PV inversion: "auto" picks the direct nodal
    #                          spectral solve (DST-I x vertical modes,
    #                          solvers/spectral.build_spectral_node — exact,
    #                          all-MXU) whenever the mask is the default
    #                          wall rectangle and S2 is horizontally uniform
    #                          (flag_ms = 0, no N2 field), else the vertex
    #                          multigrid; "vmg" forces the multigrid
    #                          (reference-parity path, nodal-poisson.h);
    #                          "spectral" requires applicability.
    dtype: str = "float32"

    @property
    def delta(self):
        return self.L0 / self.N

    @property
    def iRd2_low(self):
        # qg_barotropic.h:114-118
        if self.gp_low != 0.0:
            return self.f0 ** 2 / (self.gp_low * self.dh[self.nl - 1])
        return 0.0

    @property
    def periodic(self):
        """bc_fac = -1 -> doubly-periodic domain (the reference's
        experimental option, qg-node/qg.c:117-121, qg.h:74). A periodic
        vertex grid has N independent nodes per axis (node N == node 0),
        so the state drops to (nl, N, N) and every operator uses wrap
        ghosts; the inversion reuses the cell-grid periodic multigrid."""
        return self.bc_fac == -1

    def dt_clamped(self):
        """Viscous + beta CFL clamps (qg.h:511-512)."""
        DT = self.DT
        if self.nu != 0:
            DT = 0.5 * min(DT, (self.L0 / self.N) ** 2 / self.nu / 4.0)
        if self.beta != 0:
            DT = min(DT, 1.0 / (2.0 * self.beta * self.L0))
        return DT


_NODE_KEYS = {f.name for f in dataclasses.fields(NodeQGConfig)}


def load_node_config(path_or_text, **overrides) -> NodeQGConfig:
    from msom_tpu.params import _parse_kv
    kv = _parse_kv(path_or_text)
    # reference grammar (qg-node/qg.c:105-106): the stochastic noise scale
    # is keyed `L_filt`; the module itself is compile-time (-D_STOCHASTIC)
    # with amp_stoch = 0 meaning no kick, so amp_stoch != 0 <=> stochastic
    if "L_filt" in kv:
        kv.setdefault("L_filt_stoch", float(kv.pop("L_filt")))
    kw = {k: v for k, v in kv.items() if k in _NODE_KEYS}
    if float(kw.get("amp_stoch", 0.0)) != 0.0:
        kw.setdefault("stochastic", True)
    if "dh" in kw and not isinstance(kw["dh"], tuple):
        kw["dh"] = (float(kw["dh"]),)
    if "N2" in kw and not isinstance(kw["N2"], tuple):
        kw["N2"] = (float(kw["N2"]),)
    kw.update(overrides)
    return NodeQGConfig(**kw)


@dataclasses.dataclass(frozen=True)
class NodeQGConstants:
    mask: jnp.ndarray              # (N+1, N+1)
    psi_pg: jnp.ndarray            # (nl, N+1, N+1)
    S2: jnp.ndarray | None         # (nl-1, N+1, N+1) f_var^2/N^2
    topo: jnp.ndarray              # (N+1, N+1)
    q_forcing_3d: jnp.ndarray | None
    sig_lev: tuple | None          # LOW-pass weights per level (vertex)
    sig_lev_c: tuple | None        # centered-grid (N,N) low-pass weights
    mask_c: tuple | None           # centered mask pyramid for wavelet_mask
    vlevels: Any
    yv: jnp.ndarray                # (N+1, N+1) vertex y-coords
    idh0: tuple
    idh1: tuple
    nspec: Any = None              # spectral.SpectralData nodal direct
    #                                inversion (DST-I x modes), or None
    nrhsk: Any = None              # pallas_node_rhs.NodeRhsData, or None


jax.tree_util.register_dataclass(
    NodeQGConstants,
    data_fields=["mask", "psi_pg", "S2", "topo", "q_forcing_3d", "sig_lev",
                 "sig_lev_c", "mask_c", "vlevels", "yv", "nspec", "nrhsk"],
    meta_fields=["idh0", "idh1"])


@dataclasses.dataclass
class NodeQGState:
    q: jnp.ndarray
    psi: jnp.ndarray
    psi_f: jnp.ndarray | None
    t: jnp.ndarray
    dt_prev: jnp.ndarray
    i: jnp.ndarray
    key: jnp.ndarray
    nbar: jnp.ndarray


jax.tree_util.register_dataclass(
    NodeQGState,
    data_fields=["q", "psi", "psi_f", "t", "dt_prev", "i", "key", "nbar"],
    meta_fields=[])


class NodeStepDiag(NamedTuple):
    dt: jnp.ndarray
    ke: jnp.ndarray
    d_ke: jnp.ndarray
    f_ke: jnp.ndarray
    mg_iters: jnp.ndarray


def _dtype(cfg):
    return jnp.dtype(cfg.dtype)


def build_constants(cfg: NodeQGConfig, *, mask=None, psi_pg=None, N2=None,
                    topo=None, q_forcing_3d=None) -> NodeQGConstants:
    """set_vars + module init (qg.h:404-452, qg_baroclinic_ms.h:449-580).

    Periodic mode (bc_fac = -1, qg-node/qg.c:117-121): the grid drops to
    the N independent nodes per axis, `mask` is None (no walls), and
    `vlevels` holds the cell-grid periodic multigrid coefficients
    (solvers/mg.build_layered_coeffs) instead of vertex VLevels."""
    if cfg.periodic:
        if mask is not None and not np.all(np.asarray(mask) == 1.0):
            raise ValueError(
                "periodic (bc_fac=-1) configs have no walls: a non-trivial "
                "mask cannot be applied — drop the mask or use a walled "
                "config (bc_fac >= 0)")
        return _build_constants_periodic(cfg, psi_pg=psi_pg, N2=N2,
                                         topo=topo,
                                         q_forcing_3d=q_forcing_3d)
    dt = _dtype(cfg)
    N, nl = cfg.N, cfg.nl
    if nl > 1 and cfg.iRd2_low != 0.0:
        # same de-pairing hazard the periodic branch rejects: iRd2_low is a
        # barotropic-module concept (qg_barotropic.h:36,117) — comp_q only
        # subtracts it for nl == 1, and the spectral/vmg inversions would
        # otherwise silently disagree about whether to include it
        raise ValueError(
            "iRd2_low (gp_low) is only defined for the barotropic nl == 1 "
            "module (qg_barotropic.h); got nl > 1 with gp_low set")
    delta = cfg.delta
    xv = np.arange(N + 1) * delta
    Xv, Yv = np.meshgrid(xv, xv, indexing="xy")

    if mask is None:
        mask = vertex.default_mask(N, dt)
    else:
        mask = jnp.asarray(mask, dt)

    _, idh0, idh1 = layer_metrics(np.asarray(cfg.dh[:nl]))

    if psi_pg is None:
        psi_pg = jnp.zeros((nl, N + 1, N + 1), dt)
    else:
        psi_pg = jnp.asarray(psi_pg, dt)

    S2 = None
    if nl > 1:
        if N2 is None:
            N2a = np.asarray(cfg.N2[:nl - 1], np.float64)[:, None, None] \
                * np.ones((nl - 1, N + 1, N + 1))
        else:
            N2a = np.asarray(N2, np.float64)[:nl - 1]
        # N^2 -> f_var^2/N^2 (qg_baroclinic_ms.h:498-505), f_var
        # = f0 + flag_ms*beta*(y - L0/2) (:48)
        f_var = cfg.f0 + cfg.flag_ms * cfg.beta * (Yv - 0.5 * cfg.L0)
        S2 = jnp.asarray(f_var**2 / N2a, dt)

    topo_arr = jnp.zeros((N + 1, N + 1), dt) if topo is None \
        else jnp.asarray(topo, dt) * cfg.scale_topo

    vlevels = vmg.build_vlevels(nl=nl, N=N, L0=cfg.L0, S2=S2, idh0=idh0,
                                pallas=cfg.use_pallas,
                                idh1=idh1, iRd2_low=cfg.iRd2_low, mask=mask,
                                dtype=dt)

    # filter weights: LOW-pass only in qg-node (the high-pass complement is
    # never taken, qg_baroclinic_ms.h:554-559), with the y-dependent L_filt
    # or local-deformation-radius cutoff (:536-548); computed on the
    # CENTERED grid (the wavelet works on cell-centered averages, :367-372)
    sig_lev_c = mask_c = None
    if cfg.dtflt > 0:
        from msom_tpu.ops.wavelet import sig_lev_pyramid
        xc = (np.arange(N) + 0.5) * delta
        _, Yc = np.meshgrid(xc, xc, indexing="xy")
        if cfg.fac_filt_Rd > 0:
            S2c = 0.25 * (np.asarray(S2)[0, :-1, :-1] + np.asarray(S2)[0, 1:, :-1]
                          + np.asarray(S2)[0, :-1, 1:] + np.asarray(S2)[0, 1:, 1:])
            lf = np.minimum(cfg.fac_filt_Rd * cfg.dh[0] / np.sqrt(S2c),
                            cfg.Lfmax)
        else:
            lf = cfg.Lfmax + (Yc / cfg.L0) * (cfg.Lfmin - cfg.Lfmax)
        sig_lev_c = tuple(jnp.asarray(s, dt) for s in
                          sig_lev_pyramid(lf, cfg.L0, highpass=False))
        # centered mask pyramid (mask_c, qg_baroclinic_ms.h:563-578):
        # 4-vertex average, restricted with dirichlet-0 boundary
        mc = 0.25 * (np.asarray(mask)[:-1, :-1] + np.asarray(mask)[1:, :-1]
                     + np.asarray(mask)[:-1, 1:] + np.asarray(mask)[1:, 1:])
        pyr = [mc]
        for _ in range(int(round(np.log2(N)))):
            m = pyr[-1]
            pyr.append(0.25 * (m[::2, ::2] + m[1::2, ::2] + m[::2, 1::2]
                               + m[1::2, 1::2]))
        pyr.reverse()
        mask_c = tuple(jnp.asarray(m, dt) for m in pyr)

    # direct nodal spectral inversion (solver="auto"/"spectral"): exact
    # DST-I x vertical-mode solve of the interior system with zero ring —
    # applicable iff the mask is the default wall rectangle and S2 is
    # horizontally uniform (flag_ms = 0, uniform N2)
    nspec = None
    if cfg.solver in ("auto", "spectral"):
        from msom_tpu.solvers import spectral as spectral_mod
        mask_ok = bool(np.array_equal(np.asarray(mask),
                                      np.asarray(vertex.default_mask(N, dt))))
        sprof = None
        s_ok = True
        if nl > 1:
            s_np = np.asarray(S2)
            if np.all(s_np == s_np[:, :1, :1]):
                sprof = s_np[:, 0, 0]
            else:
                s_ok = False
        if mask_ok and s_ok:
            nspec = spectral_mod.build_spectral_node(
                nl=nl, N=N, L0=cfg.L0, dh=np.asarray(cfg.dh[:nl]),
                s_profile=sprof, iRd2_low=cfg.iRd2_low, dtype=dt)
        elif cfg.solver == "spectral":
            raise ValueError(
                "solver='spectral' needs the default wall mask and "
                "horizontally-uniform S2 (flag_ms=0); use solver='vmg'")

    nrhsk = None
    if cfg.use_pallas:
        from msom_tpu.models import pallas_node_rhs
        nrhsk = pallas_node_rhs.build_node_kernel_data(
            cfg, S2, psi_pg, topo, q_forcing_3d)

    return NodeQGConstants(
        mask=mask, psi_pg=psi_pg, S2=S2, topo=topo_arr,
        q_forcing_3d=None if q_forcing_3d is None
        else jnp.asarray(q_forcing_3d, dt),
        sig_lev=None, sig_lev_c=sig_lev_c, mask_c=mask_c,
        vlevels=vlevels, yv=jnp.asarray(Yv, dt),
        idh0=tuple(float(v) for v in idh0),
        idh1=tuple(float(v) for v in idh1), nspec=nspec, nrhsk=nrhsk)


def _build_constants_periodic(cfg, *, psi_pg=None, N2=None, topo=None,
                              q_forcing_3d=None) -> NodeQGConstants:
    from msom_tpu.solvers import mg as cmg

    dt = _dtype(cfg)
    N, nl = cfg.N, cfg.nl
    delta = cfg.delta
    xv = np.arange(N) * delta
    Xv, Yv = np.meshgrid(xv, xv, indexing="xy")
    _, idh0, idh1 = layer_metrics(np.asarray(cfg.dh[:nl]))

    psi_pg = jnp.zeros((nl, N, N), dt) if psi_pg is None \
        else jnp.asarray(psi_pg, dt)
    S2 = None
    if nl > 1:
        if N2 is None:
            N2a = np.asarray(cfg.N2[:nl - 1], np.float64)[:, None, None] \
                * np.ones((nl - 1, N, N))
        else:
            N2a = np.asarray(N2, np.float64)[:nl - 1]
        f_var = cfg.f0 + cfg.flag_ms * cfg.beta * (Yv - 0.5 * cfg.L0)
        S2 = jnp.asarray(f_var**2 / N2a, dt)
    topo_arr = jnp.zeros((N, N), dt) if topo is None \
        else jnp.asarray(topo, dt)[..., :N, :N] * cfg.scale_topo

    # iRd2_low is a BAROTROPIC-module concept (qg_barotropic.h:36,117):
    # comp_q only subtracts iRd2_low*psi when nl == 1, so the inversion
    # operator must carry the matching shift only then (a (nl, N, N) lam
    # for nl > 1 would silently de-pair invert_q from comp_q).
    lam = None
    if cfg.iRd2_low != 0.0:
        if nl > 1:
            raise ValueError(
                "iRd2_low (gp_low) is only defined for the barotropic "
                "nl == 1 module (qg_barotropic.h); got periodic nl > 1")
        lam = jnp.full((nl, N, N), -cfg.iRd2_low, dt)
    clevels = cmg.build_layered_coeffs(nl=nl, N=N, L0=cfg.L0, s=S2,
                                       idh0=idh0, idh1=idh1, lam=lam,
                                       dtype=dt)
    sig_lev_c = None
    if cfg.dtflt > 0:
        from msom_tpu.ops.wavelet import sig_lev_pyramid
        xc = (np.arange(N) + 0.5) * delta
        _, Yc = np.meshgrid(xc, xc, indexing="xy")
        lf = cfg.Lfmax + (Yc / cfg.L0) * (cfg.Lfmin - cfg.Lfmax)
        sig_lev_c = tuple(jnp.asarray(s, dt) for s in
                          sig_lev_pyramid(lf, cfg.L0, highpass=False))
    return NodeQGConstants(
        mask=None, psi_pg=psi_pg, S2=S2, topo=topo_arr,
        q_forcing_3d=None if q_forcing_3d is None
        else jnp.asarray(q_forcing_3d, dt)[..., :N, :N],
        sig_lev=None, sig_lev_c=sig_lev_c, mask_c=None,
        vlevels=clevels, yv=jnp.asarray(Yv, dt),
        idh0=tuple(float(v) for v in idh0),
        idh1=tuple(float(v) for v in idh1))


def _project_nullspace(cfg, f):
    """Remove the periodic operator's nullspace component (the global
    constant across layers; left nullvector = dh weights): the analog of
    zeroing the barotropic k=0 mode in the spectral solve."""
    if cfg.iRd2_low != 0.0:
        return f
    w = jnp.asarray(cfg.dh[:cfg.nl], f.dtype)
    wbar = jnp.einsum("l,lyx->", w, f) / (w.sum() * f.shape[-1]
                                          * f.shape[-2])
    return f - wbar


def comp_q(cfg, const, psi):
    """q = lap(psi) + Gamma(psi) (- iRd2_low*psi barotropic), masked BCs
    (comp_q_baroclinic :200-211 / comp_q_barotropic :33-39); periodic:
    wrap ghosts, no ring."""
    if cfg.periodic:
        from msom_tpu.ops.bc import BC
        from msom_tpu.ops.ghost import ghosted, laplacian_g
        q = laplacian_g(ghosted(psi, BC.PERIODIC), cfg.delta)
        if cfg.nl > 1:
            q = q + stretch(psi, const.S2, const.idh0, const.idh1)
        else:
            q = q - cfg.iRd2_low * psi
        return q
    q = vmg._vlap(psi, cfg.delta)
    if cfg.nl > 1:
        q = q + stretch(psi, const.S2, const.idh0, const.idh1)
    else:
        q = q - cfg.iRd2_low * psi
    q = vertex.bc_deriv(q, psi, cfg.bc_fac, cfg.delta)
    return q


def invert_q(cfg, const, psi_guess, q):
    if cfg.periodic:
        from msom_tpu.ops.bc import BC
        from msom_tpu.solvers import mg as cmg
        psi, st = cmg.solve_layered(
            psi_guess, _project_nullspace(cfg, q), L0=cfg.L0,
            idh0=const.idh0, idh1=const.idh1, bc=BC.PERIODIC,
            tolerance=cfg.TOLERANCE, levels=const.vlevels)
        return _project_nullspace(cfg, psi), st
    if const.nspec is not None and cfg.solver in ("auto", "spectral"):
        # exact one-shot nodal solve (build_constants docstring): interior
        # vertices via DST-I x modes, zero ring
        from msom_tpu.solvers import spectral as spectral_mod
        psi_int = spectral_mod.solve_spectral(const.nspec,
                                              q[..., 1:-1, 1:-1])
        psi = jnp.zeros_like(q).at[..., 1:-1, 1:-1].set(psi_int)
        z = jnp.zeros((), q.dtype)
        st = vmg.MGStats(iters=jnp.zeros((), jnp.int32), resb=z, resa=z,
                         nrelax=jnp.zeros((), jnp.int32))
        return vertex.bc_psi(psi), st
    psi, st = vmg.vpoisson(psi_guess, q, levels=const.vlevels,
                           idh0=const.idh0, idh1=const.idh1,
                           tolerance=cfg.TOLERANCE)
    psi = vertex.bc_psi(psi)
    return psi, st


def q_forcing_profile(cfg, y, t):
    """Time-varying wandering-gyre wind on a y array (event forcing,
    qg.c:136-145) — x-constant, so a (M,) profile suffices."""
    amp = -(cfg.tau0 + cfg.tau1 * jnp.cos(2 * jnp.pi * t / cfg.tf1)) \
        / cfg.dh[0] * cfg.forc_mode * jnp.pi / cfg.L0
    arg = cfg.forc_mode * jnp.pi * (
        y + y * (y - cfg.L0) * 2 / (cfg.L0 ** 2) * cfg.dy_ws
        * jnp.sin(2 * jnp.pi * t / cfg.tf2)) / cfg.L0
    return amp * jnp.sin(arg)


def q_forcing_field(cfg, const, t):
    """Time-varying wandering-gyre wind (event forcing, qg.c:136-145)."""
    return q_forcing_profile(cfg, const.yv, t)


def _rhs_pv_periodic(cfg, const, q, psi, t):
    """rhs_pv with wrap ghosts on the N-node periodic grid: the same terms
    as the wall path minus every boundary rule (no mask, no bc_deriv —
    there are no walls)."""
    from msom_tpu.ops.bc import BC
    from msom_tpu.ops.ghost import arakawa_mjac_g, ghosted, laplacian_g

    d = cfg.delta
    nl = cfg.nl
    G = lambda f: ghosted(f, BC.PERIODIC)

    def J(p, qq):
        return arakawa_mjac_g(G(qq), G(p), d)

    def betaterm(p):
        return cfg.beta * (jnp.roll(p, -1, -1) - jnp.roll(p, 1, -1)) / (2 * d)

    qf = q_forcing_field(cfg, const, t)
    if nl == 1:
        dq = (-J(psi, q) - betaterm(psi)
              - cfg.hEkb * cfg.f0 / (2 * cfg.dh[nl - 1]) * q
              + qf[None] + cfg.nu * laplacian_g(G(q), d))
        return dq
    zeta = laplacian_g(G(psi), d)
    pp = const.psi_pg
    dq = -J(psi, zeta) - J(pp, zeta) - betaterm(psi)
    Jd = (J(psi[:-1], psi[1:]) + J(pp[:-1], psi[1:]) + J(psi[:-1], pp[1:]))
    idh0 = jnp.asarray(const.idh0, q.dtype).reshape(nl, 1, 1)
    idh1 = jnp.asarray(const.idh1, q.dtype).reshape(nl, 1, 1)
    dq = dq.at[:-1].add(-const.S2 * Jd * idh1[:-1])
    dq = dq.at[1:].add(const.S2 * Jd * idh0[1:])
    dq = dq.at[nl - 1].add(-cfg.hEkb * cfg.f0 / (2 * cfg.dh[nl - 1])
                           * zeta[nl - 1]
                           - J(psi[nl - 1], const.topo) * cfg.f0
                           / cfg.dh[nl - 1])
    dq = dq + cfg.nu * stretch(zeta, const.S2, const.idh0, const.idh1)
    tmp = laplacian_g(G(zeta), d)
    dq = dq + cfg.nu * tmp
    if cfg.nu4 != 0.0:
        dq = dq - cfg.nu4 * (stretch(tmp, const.S2, const.idh0, const.idh1)
                             + laplacian_g(G(tmp), d))
    dq = dq.at[0].add(qf)
    if const.q_forcing_3d is not None:
        dq = dq + const.q_forcing_3d
    return dq


def rhs_pv(cfg, const, q, psi, t):
    """rhs_pv_baroclinic (qg_baroclinic_ms.h:103-196) / rhs_pv_barotropic
    (qg_barotropic.h:16-29). J(p,q) = arakawa_mjac(q, p) (the qg-node macro
    swaps the roles, giving +J)."""
    if cfg.periodic:
        return _rhs_pv_periodic(cfg, const, q, psi, t)
    from msom_tpu.solvers import pallas_mg as _pk
    if const.nrhsk is not None and cfg.use_pallas and _pk.enabled(psi.dtype):
        from msom_tpu.models import pallas_node_rhs
        qf_prof = q_forcing_profile(cfg, const.yv[:, 0], t)
        return pallas_node_rhs.rhs_fused_node(cfg, const, q, psi, qf_prof)
    d = cfg.delta
    nl = cfg.nl
    m = const.mask

    def J(p, qq):
        out = jnp.zeros_like(p)
        return out.at[..., 1:-1, 1:-1].set(arakawa_mjac(qq, p, d))

    def betaterm(p):
        out = jnp.zeros_like(p)
        bt = cfg.beta * (p[..., 1:-1, 2:] - p[..., 1:-1, :-2]) / (2 * d)
        return out.at[..., 1:-1, 1:-1].set(bt)

    qf = q_forcing_field(cfg, const, t)

    if nl == 1:
        dq = (-J(psi, q) - betaterm(psi)
              - cfg.hEkb * cfg.f0 / (2 * cfg.dh[nl - 1]) * q
              + qf[None] + cfg.nu * vmg._vlap(q, d))
        return dq * m

    q = q * m
    psi = psi * m
    zeta = vmg._vlap(psi, d)
    zeta = vertex.bc_deriv(zeta, psi, cfg.bc_fac, d)

    pp = const.psi_pg
    dq = -J(psi, zeta) - J(pp, zeta) - betaterm(psi)
    # interface cascade jd = J(psi_l, psi_{l+1}) + J(pp_l, psi_{l+1})
    # + J(psi_l, pp_{l+1}) (qg_baroclinic_ms.h:124)
    Jd = (J(psi[:-1], psi[1:]) + J(pp[:-1], psi[1:]) + J(psi[:-1], pp[1:]))
    idh0 = jnp.asarray(const.idh0, q.dtype).reshape(nl, 1, 1)
    idh1 = jnp.asarray(const.idh1, q.dtype).reshape(nl, 1, 1)
    dq = dq.at[:-1].add(-const.S2 * Jd * idh1[:-1])
    dq = dq.at[1:].add(const.S2 * Jd * idh0[1:])
    # bottom friction + topography (:150)
    dq = dq.at[nl - 1].add(-cfg.hEkb * cfg.f0 / (2 * cfg.dh[nl - 1])
                           * zeta[nl - 1]
                           - J(psi[nl - 1], const.topo) * cfg.f0
                           / cfg.dh[nl - 1])
    # dissipation (:159-170): harmonic on (stretch+del2 of zeta), biharmonic
    dq = dq + cfg.nu * stretch(zeta, const.S2, const.idh0, const.idh1)
    tmp = vmg._vlap(zeta, d)
    # set_bc_ms tmp relation (qg_baroclinic_ms.h:67-69): the parent's OWN
    # ring value is subtracted (zeta's slip ring is nonzero for bc_fac > 0)
    # — found by the independent oracle lockstep (tests/oracle_node.py)
    tmp = vertex.bc_deriv_rel(tmp, zeta, cfg.bc_fac, d)
    dq = dq + cfg.nu * tmp
    if cfg.nu4 != 0.0:
        dq = dq - cfg.nu4 * (stretch(tmp, const.S2, const.idh0, const.idh1)
                             + vmg._vlap(tmp, d))
    # surface + 3-D forcing (:176-186)
    dq = dq.at[0].add(qf)
    if const.q_forcing_3d is not None:
        dq = dq + const.q_forcing_3d
    return dq * m


def adjust_dt(cfg, psi, dtmax0, prev):
    """adjust_dt (qg.h:258-284): face velocity from nodal psi differences,
    previous-dt smoothing."""
    d = cfg.delta
    if cfg.periodic:
        u1 = jnp.abs(jnp.roll(psi, -1, -2) - psi) / d
        u2 = jnp.abs(jnp.roll(psi, -1, -1) - psi) / d
        umax = jnp.maximum(jnp.max(u1), jnp.max(u2))
        big = jnp.asarray(jnp.finfo(psi.dtype).max / 4, psi.dtype)
        dtm = jnp.minimum(dtmax0,
                          jnp.where(umax > 0, cfg.CFL * d / umax, big))
        dtm = jnp.where(dtm > prev, (prev + 0.1 * dtm) / 1.1, dtm)
        return dtm, dtm
    u1 = jnp.abs(psi[..., 1:, :] - psi[..., :-1, :]) / d
    u2 = jnp.abs(psi[..., :, 1:] - psi[..., :, :-1]) / d
    umax = jnp.maximum(jnp.max(u1), jnp.max(u2))
    big = jnp.asarray(jnp.finfo(psi.dtype).max / 4, psi.dtype)
    dtm = jnp.minimum(dtmax0, jnp.where(umax > 0, cfg.CFL * d / umax, big))
    dtm = jnp.where(dtm > prev, (prev + 0.1 * dtm) / 1.1, dtm)
    return dtm, dtm


def init_state(cfg, const, *, psi0=None, seed=0) -> NodeQGState:
    dt = _dtype(cfg)
    N, nl = cfg.N, cfg.nl
    npts = N if cfg.periodic else N + 1
    key = jax.random.PRNGKey(seed)
    if psi0 is None:
        key, sub = jax.random.split(key)
        noise = jax.random.uniform(sub, (nl, npts, npts), dt, -1., 1.)
        psi = cfg.noise_init * (noise
                                + jnp.sin(2 * jnp.pi * const.yv / cfg.L0))
    else:
        psi = jnp.asarray(psi0, dt)
    if cfg.periodic:
        psi = _project_nullspace(cfg, psi)
    else:
        psi = vertex.bc_psi(psi)
    q = comp_q(cfg, const, psi)
    psi_f = jnp.zeros_like(psi) if cfg.dtflt > 0 else None
    return NodeQGState(q=q, psi=psi, psi_f=psi_f, t=jnp.asarray(0.0, dt),
                       dt_prev=jnp.asarray(0.0, dt),
                       i=jnp.asarray(0, jnp.int32), key=key,
                       nbar=jnp.asarray(0, jnp.int32))


def diag_1d(cfg, const, psi, q, t):
    """(ke, d_ke, f_ke) as in write_1d_diag (qg.h:381-390); cell-style sum
    over nodes excluding the duplicated boundary (fields are zero there)."""
    d2 = cfg.delta ** 2
    if cfg.periodic:
        from msom_tpu.ops.bc import BC
        from msom_tpu.ops.ghost import ghosted, laplacian_g
        lap_psi = laplacian_g(ghosted(psi, BC.PERIODIC), cfg.delta)
        lap_q = laplacian_g(ghosted(q, BC.PERIODIC), cfg.delta)
        qf = q_forcing_field(cfg, const, t)
        ke = -jnp.sum(0.5 * psi[0] * lap_psi[0]) * d2
        d_ke = -cfg.nu * jnp.sum(psi[0] * lap_q[0]) * d2
        f_ke = -jnp.sum(psi[0] * qf) * d2
        return ke, d_ke, f_ke
    lap_psi = vmg._vlap(psi, cfg.delta)
    lap_q = vmg._vlap(q, cfg.delta)
    qf = q_forcing_field(cfg, const, t)
    ke = -jnp.sum(0.5 * psi[0] * lap_psi[0]) * d2
    d_ke = -cfg.nu * jnp.sum(psi[0] * lap_q[0]) * d2
    f_ke = -jnp.sum(psi[0] * qf) * d2
    return ke, d_ke, f_ke


def to_vertex_full(cfg, a):
    """Periodic (.., N, N) owned nodes -> the (.., N+1, N+1) vertex view
    the reference's NetCDF layout stores (node N == node 0 wrapped);
    identity for wall domains."""
    if not cfg.periodic:
        return a
    a = jnp.concatenate([a, a[..., :1, :]], axis=-2)
    return jnp.concatenate([a, a[..., :, :1]], axis=-1)


def make_step(cfg: NodeQGConfig):
    DT = cfg.dt_clamped()

    def step(state: NodeQGState, const: NodeQGConstants, tnext):
        from msom_tpu.models.qg import dtnext

        def update(q, psi_guess, prev, t):
            psi, st = invert_q(cfg, const, psi_guess, q)
            dq = rhs_pv(cfg, const, q, psi, t)
            dtm, prev = adjust_dt(cfg, psi, DT, prev)
            return dq, psi, prev, dtm, st

        dq, psi1, prev, dtm, st = update(state.q, state.psi, state.dt_prev,
                                         state.t)
        dt = dtnext(state.t, tnext, dtm)

        noise = None
        key = state.key
        if cfg.stochastic:
            key, sub = jax.random.split(key)
            noise = generate_noise(cfg, const, sub, state.q.shape)

        q_half = state.q + dq * (dt / 2)
        if cfg.stochastic:
            q_half = q_half + noise * jnp.sqrt(dt) / 2.0
        dq2, psi2, prev, _, _ = update(q_half, psi1, prev, state.t)
        q_new = state.q + dq2 * dt
        if cfg.stochastic:
            q_new = q_new + noise * jnp.sqrt(dt)

        ke, d_ke, f_ke = diag_1d(cfg, const, psi2, q_new, state.t)
        new = NodeQGState(q=q_new, psi=psi2, psi_f=state.psi_f,
                          t=state.t + dt, dt_prev=prev, i=state.i + 1,
                          key=key, nbar=state.nbar)
        return new, NodeStepDiag(dt=dt, ke=ke, d_ke=d_ke, f_ke=f_ke,
                                 mg_iters=st.iters)

    return step


def generate_noise(cfg, const, key, shape):
    """Spatially-correlated noise (qg-node/qg_stochastic.h): white normal
    field, wavelet transform, damp the large scales with the high-pass
    weights from L_filt, inverse transform."""
    from msom_tpu.ops.wavelet import sig_lev_pyramid, wavelet, inverse_wavelet
    from msom_tpu.ops.bc import BC

    white = jax.random.normal(key, shape, _dtype(cfg)) * cfg.amp_stoch
    if cfg.L_filt_stoch <= 0:
        return white
    N = cfg.N
    if cfg.periodic:
        r = lambda a, d, ax: jnp.roll(a, d, ax)
        wc = 0.25 * (white + r(white, -1, -2) + r(white, -1, -1)
                     + r(r(white, -1, -2), -1, -1))
        sig = sig_lev_pyramid(np.full((N, N), cfg.L_filt_stoch), cfg.L0,
                              highpass=True)
        w = wavelet(wc, BC.PERIODIC)
        w = tuple(wl * jnp.asarray(sl, wc.dtype) for wl, sl in zip(w, sig))
        filt = inverse_wavelet(w, BC.PERIODIC)
        return 0.25 * (filt + r(filt, 1, -2) + r(filt, 1, -1)
                       + r(r(filt, 1, -2), 1, -1))
    # centered-grid transform of the (N+1) field's interior N-average
    wc = 0.25 * (white[..., :-1, :-1] + white[..., 1:, :-1]
                 + white[..., :-1, 1:] + white[..., 1:, 1:])
    sig = sig_lev_pyramid(np.full((N, N), cfg.L_filt_stoch), cfg.L0,
                          highpass=True)
    w = wavelet(wc, BC.NEUMANN)
    w = tuple(wl * jnp.asarray(sl, wc.dtype) for wl, sl in zip(w, sig))
    filt = inverse_wavelet(w, BC.NEUMANN)
    out = jnp.zeros(shape, wc.dtype)
    # back to vertices: 4-cell average (with edge duplication)
    fc = jnp.pad(filt, [(0, 0)] * (filt.ndim - 2) + [(1, 1), (1, 1)],
                 mode="edge")
    vtx = 0.25 * (fc[..., :-1, :-1] + fc[..., 1:, :-1]
                  + fc[..., :-1, 1:] + fc[..., 1:, 1:])
    return vtx * const.mask


def wavelet_filter(cfg, const, state: NodeQGState) -> NodeQGState:
    """Masked wavelet filter with eddy/mean split (wavelet_filter,
    qg_baroclinic_ms.h:345-400): transform the cell-centered average of psi,
    damp with the LOW-pass sig_lev, reconstruct the large-scale part
    psi_loc, accumulate psi_f and subtract: psi <- (psi - psi_loc)*mask."""
    from msom_tpu.ops.wavelet import wavelet, inverse_wavelet
    from msom_tpu.ops.bc import BC

    psi, _ = invert_q(cfg, const, state.psi, state.q)
    if cfg.periodic:
        r = lambda a, d, ax: jnp.roll(a, d, ax)
        pc = 0.25 * (psi + r(psi, -1, -2) + r(psi, -1, -1)
                     + r(r(psi, -1, -2), -1, -1))
        w = wavelet(pc, BC.PERIODIC)
        w = tuple(wl * sl for wl, sl in zip(w, const.sig_lev_c))
        pl = inverse_wavelet(w, BC.PERIODIC)
        psi_loc = 0.25 * (r(r(pl, 1, -2), 1, -1) + r(pl, 1, -1)
                          + r(pl, 1, -2) + pl)
        psi_f = (state.psi_f * state.nbar + psi_loc / cfg.dtflt) \
            / (state.nbar + 1)
        psi_new = psi - psi_loc
        q_new = comp_q(cfg, const, psi_new)
        return dataclasses.replace(state, psi=psi_new, q=q_new, psi_f=psi_f,
                                   nbar=state.nbar + 1)
    # vertex -> centered average (:369-371)
    pc = 0.25 * (psi[..., :-1, :-1] + psi[..., 1:, :-1]
                 + psi[..., :-1, 1:] + psi[..., 1:, 1:])
    w = wavelet(pc, BC.DIRICHLET, const.mask_c)
    w = tuple(wl * sl for wl, sl in zip(w, const.sig_lev_c))
    pl = inverse_wavelet(w, BC.DIRICHLET, const.mask_c)
    # centered -> vertex: average of the 4 surrounding cells (:385)
    plp = jnp.pad(pl, [(0, 0)] * (pl.ndim - 2) + [(1, 1), (1, 1)])
    psi_loc = 0.25 * (plp[..., :-1, :-1] + plp[..., 1:, :-1]
                      + plp[..., :-1, 1:] + plp[..., 1:, 1:])
    psi_f = (state.psi_f * state.nbar + psi_loc / cfg.dtflt) / (state.nbar + 1)
    psi_new = (psi - psi_loc) * const.mask
    q_new = comp_q(cfg, const, psi_new)
    return dataclasses.replace(state, psi=psi_new, q=q_new, psi_f=psi_f,
                               nbar=state.nbar + 1)
