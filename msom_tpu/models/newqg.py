"""newqg — the transitional cell-centered single/multi-layer QG model.

Re-implements /root/reference/newqg/qg.h + qg.c: LAYERS-based cell-centered
fields, plain scalar Helmholtz inversion lap(psi) + iRd2_low*psi = q (the
coefficient -f0^2/(gp_low*dh[nl-1]) lives only in the bottom layer,
qg.h:345-354 — layers are otherwise uncoupled), Arakawa advection with the
opposite-sign beta convention (rhs = -J(psi, zeta) - beta*v), harmonic
dissipation, bottom Ekman friction, the time/space-localized pulse wind
forcing (qg.c:69-75), inline CFL with previous-dt smoothing, and
NetCDF restart (restart.nc -> psi, qg.c:56-60).

Reuses the msqg machinery: same pad-based stencils (the newqg zeta/q ghost
relation bc_fac*(psi[] - psi[ghost]) with bc_fac = sbc/((0.5*sbc+1)*Delta^2),
qg.h:295-318, IS the msqg partial-slip law, pad_zeta_slip).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msom_tpu.ops.bc import BC, pad, pad_zeta_slip
from msom_tpu.ops.stencil import arakawa_mjac, laplacian, shift
from msom_tpu.solvers import mg


@dataclasses.dataclass(frozen=True)
class NewQGConfig:
    """Defaults per /root/reference/newqg/qg.h:85-95."""
    N: int = 64
    nl: int = 1
    L0: float = 1.0
    f0: float = 1.0
    beta: float = 0.0
    hEkb: float = 0.0
    tau0: float = 0.0
    nu: float = 0.0
    sbc: float = 0.0
    gp_low: float = 0.0
    dh: Tuple[float, ...] = (1.0,)
    DT: float = 1e10
    tend: float = 1.0
    dtout: float = 1.0
    CFL: float = 0.5
    TOLERANCE: float = 1e-5
    dtype: str = "float64"
    solver: str = "mg"       # "mg" or "spectral" (exact direct, constant lam)

    def __post_init__(self):
        if self.solver not in ("mg", "spectral"):
            raise ValueError(f"solver={self.solver!r}: must be 'mg' or "
                             "'spectral'")

    @property
    def delta(self):
        return self.L0 / self.N

    @property
    def iRd2_low(self):
        """NEGATIVE Helmholtz coefficient (qg.h:348-350)."""
        if self.gp_low != 0.0:
            return -self.f0 ** 2 / (self.gp_low * self.dh[self.nl - 1])
        return 0.0


_KEYS = None


def load_newqg_config(path_or_text, **overrides) -> NewQGConfig:
    from msom_tpu.params import _parse_kv
    global _KEYS
    if _KEYS is None:
        _KEYS = {f.name for f in dataclasses.fields(NewQGConfig)}
    kv = _parse_kv(path_or_text)
    kw = {k: v for k, v in kv.items() if k in _KEYS}
    if "dh" in kw and not isinstance(kw["dh"], tuple):
        kw["dh"] = (float(kw["dh"]),)
    kw.update(overrides)
    return NewQGConfig(**kw)


@dataclasses.dataclass
class NewQGState:
    q: jnp.ndarray
    psi: jnp.ndarray
    t: jnp.ndarray
    dt_prev: jnp.ndarray
    i: jnp.ndarray


jax.tree_util.register_dataclass(
    NewQGState, data_fields=["q", "psi", "t", "dt_prev", "i"], meta_fields=[])


class NewQGDiag(NamedTuple):
    dt: jnp.ndarray
    ke: jnp.ndarray


def _bc(cfg):
    return BC.PERIODIC if cfg.sbc == -1 else BC.DIRICHLET


def lam_per_layer(cfg: NewQGConfig) -> np.ndarray:
    """(nl,) Helmholtz coefficient vector: -1/Rd^2 in the bottom layer only
    (/root/reference/newqg/qg.h:148-157,174-178). Single source for both the
    multigrid coefficient field and the spectral denominators."""
    lam_vec = np.zeros(cfg.nl)
    lam_vec[cfg.nl - 1] = cfg.iRd2_low
    return lam_vec


def build_levels(cfg: NewQGConfig):
    """Helmholtz coefficient only in the bottom layer (qg.h:174-178)."""
    dt = jnp.dtype(cfg.dtype)
    lam = None
    if cfg.iRd2_low != 0.0:
        lam_np = np.broadcast_to(lam_per_layer(cfg)[:, None, None],
                                 (cfg.nl, cfg.N, cfg.N))
        lam = jnp.asarray(lam_np, dt)
    return mg.build_layered_coeffs(nl=cfg.nl, N=cfg.N, L0=cfg.L0, s=None,
                                   lam=lam, dtype=dt), lam


def comp_q(cfg, lam, psi):
    q = laplacian(pad(psi, _bc(cfg)), cfg.delta)
    if lam is not None:
        q = q + lam * psi
    return q


def init_state(cfg, lam, *, psi0=None, seed=0) -> NewQGState:
    dt = jnp.dtype(cfg.dtype)
    if psi0 is None:
        key = jax.random.PRNGKey(seed)
        psi = 1e-3 * jax.random.uniform(key, (cfg.nl, cfg.N, cfg.N), dt,
                                        -1.0, 1.0)
    else:
        psi = jnp.asarray(psi0, dt)
    q = comp_q(cfg, lam, psi)
    return NewQGState(q=q, psi=psi, t=jnp.asarray(0.0, dt),
                      dt_prev=jnp.asarray(0.0, dt),
                      i=jnp.asarray(0, jnp.int32))


def make_step(cfg: NewQGConfig):
    from msom_tpu.models.qg import dtnext

    levels, lam = build_levels(cfg)
    dtp = jnp.dtype(cfg.dtype)
    x = (np.arange(cfg.N) + 0.5) * cfg.delta
    X, Y = np.meshgrid(x, x, indexing="xy")
    X = jnp.asarray(X, dtp)
    bc = _bc(cfg)
    DT = cfg.DT

    def forcing(t):
        """Pulse wind (qg.c:69-75): time-periodic, x-localized."""
        return -(cfg.tau0 / cfg.dh[0] * 1.5 * jnp.pi / cfg.L0
                 * jnp.cos(2 * jnp.pi * t / 5.0)
                 * jnp.exp(-((X - cfg.L0 / 2) ** 2) / 5.0))

    spec = None
    if cfg.solver == "spectral":
        # layers are uncoupled with a constant per-layer Helmholtz
        # coefficient -> the direct solve applies verbatim
        from msom_tpu.solvers import spectral as spectral_mod
        spec = spectral_mod.build_spectral(
            nl=cfg.nl, N=cfg.N, L0=cfg.L0, lam=lam_per_layer(cfg),
            periodic=(cfg.sbc == -1), dtype=dtp)

    def update(q, psi_guess, prev, t):
        if spec is not None:
            psi = spectral_mod.solve_spectral(spec, q)
        else:
            psi, st = mg.solve_layered(psi_guess, q, L0=cfg.L0, s=None,
                                       lam=lam, bc=bc,
                                       tolerance=cfg.TOLERANCE, levels=levels)
        psi_pad = pad(psi, bc)
        zeta = laplacian(psi_pad, cfg.delta)
        if cfg.sbc == -1:
            zeta_pad = pad(zeta, BC.PERIODIC)
        else:
            zeta_pad = pad_zeta_slip(zeta, psi_pad, cfg.sbc, cfg.delta)
        # rhs = -J(psi, zeta) - beta*v + nu*lap(zeta) - hEkb*f0/(2 dh)*zeta + F
        # (the newqg macro is +J, so -J = +arakawa_mjac of the msqg macro)
        dq = arakawa_mjac(psi_pad, zeta_pad, cfg.delta)
        dq = dq - cfg.beta * (shift(psi_pad, 0, 1)
                              - shift(psi_pad, 0, -1)) / (2 * cfg.delta)
        dq = dq + cfg.nu * laplacian(zeta_pad, cfg.delta)
        dq = dq - cfg.hEkb * cfg.f0 / (2 * cfg.dh[cfg.nl - 1]) * zeta
        dq = dq + forcing(t)
        # inline CFL (qg.h:202-219)
        from msom_tpu.ops.stencil import face_velocities
        ufx, ufy = face_velocities(psi_pad, cfg.delta)
        umax = jnp.maximum(jnp.max(jnp.abs(ufx)), jnp.max(jnp.abs(ufy)))
        big = jnp.asarray(jnp.finfo(dtp).max / 4, dtp)
        dtm = jnp.minimum(DT, jnp.where(umax > 0, cfg.CFL * cfg.delta / umax,
                                        big))
        dtm = jnp.where(dtm > prev, (prev + 0.1 * dtm) / 1.1, dtm)
        return dq, psi, dtm, dtm

    def step(state: NewQGState, tnext):
        dq, psi1, dtm, prev = update(state.q, state.psi, state.dt_prev,
                                     state.t)
        dt = dtnext(state.t, tnext, dtm)
        q_half = state.q + dq * (dt / 2)
        dq2, psi2, _, prev = update(q_half, psi1, prev, state.t)
        q_new = state.q + dq2 * dt
        p0 = psi2[0]
        ke = -jnp.sum(0.5 * p0 * laplacian(pad(p0, bc), cfg.delta)) \
            * cfg.delta ** 2
        new = NewQGState(q=q_new, psi=psi2, t=state.t + dt, dt_prev=prev,
                         i=state.i + 1)
        return new, NewQGDiag(dt=dt, ke=ke)

    return step
