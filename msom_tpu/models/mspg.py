"""Planetary-geostrophic large-scale ocean model (mspg).

TPU-native re-implementation of /root/reference/mspg/pg.h + pg.c: buoyancy
and momentum on nl sigma-layers with a one-time barotropic vorticity solve
(pseudo-SOR multigrid with the perimeter circulation BC), flux-form 3-D
advection with diagnostic vertical velocity, implicit vertical diffusion,
explicit horizontal diffusion, convective adjustment, implicit surface
buoyancy relaxation, Gent-McWilliams eddy-induced advection, and the QG eddy
buoyancy forcing hook — stepped with the same predictor-corrector as msqg.

Layout: buoyancy b is (nl, N, N) (the reference's nl+2 ghost layers 0 and
nl+1 — vertbc, pg.h:374-387 — are applied functionally); face velocities are
ux (nl, N, N+1) and uy (nl, N+1, N); layer 0 is the SURFACE (reference index
1), layer nl-1 the bottom (reference index nl).

Coordinate note: the reference writes face-rotated code (foreach_face) whose
literal qcc rotation would swap the x/y coordinates inside the Coriolis
metric terms (e.g. bt_velocity, pg.h:353-364). Here the physically-intended
form is implemented — the Coriolis parameter is always the latitude y — which
matches the cell-centered definitions the reference itself uses for the
elliptic coefficients (ronh/fonh, pg.h:846-852).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from msom_tpu.ops.bc import BC, pad
from msom_tpu.ops import tridiag
from msom_tpu.params import PGConfig
from msom_tpu.solvers import mg


# ---------------------------------------------------------------------------
# state / constants
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PGState:
    b: jnp.ndarray      # (nl, N, N) buoyancy, layer 0 = surface
    ux: jnp.ndarray     # (nl, N, N+1) x-face velocity
    uy: jnp.ndarray     # (nl, N+1, N) y-face velocity
    t: jnp.ndarray
    dt_prev: jnp.ndarray
    i: jnp.ndarray
    b_me: jnp.ndarray   # running means (comp_output, pg.c:179-203)
    ux_me: jnp.ndarray
    uy_me: jnp.ndarray
    nme: jnp.ndarray


jax.tree_util.register_dataclass(
    PGState,
    data_fields=["b", "ux", "uy", "t", "dt_prev", "i", "b_me", "ux_me",
                 "uy_me", "nme"],
    meta_fields=[])


@dataclasses.dataclass(frozen=True)
class PGConstants:
    psibt: jnp.ndarray       # (N, N) barotropic streamfunction (init solve)
    ubtx: jnp.ndarray        # (N, N+1) barotropic velocities
    ubty: jnp.ndarray        # (N+1, N)
    b_surf: jnp.ndarray      # (N, N) surface restoring profile
    b_forc: jnp.ndarray | None   # (nl, N, N) QG eddy forcing
    kx_face: jnp.ndarray     # (nl, N, N+1) kh*k at x-faces (sc levels)
    ky_face: jnp.ndarray     # (nl, N+1, N)
    kv_prof: jnp.ndarray     # (nl+1, N, N) kv*k at sigma-faces sf[0..nl]
    yc: jnp.ndarray          # (N, N) cell y
    sc: tuple                # sigma centers (meta)
    sf: tuple                # sigma faces


jax.tree_util.register_dataclass(
    PGConstants,
    data_fields=["psibt", "ubtx", "ubty", "b_surf", "b_forc", "kx_face",
                 "ky_face", "kv_prof", "yc"],
    meta_fields=["sc", "sf"])


class PGStepDiag(NamedTuple):
    dt: jnp.ndarray


def _dtype(cfg):
    return jnp.dtype(cfg.dtype)


# ---------------------------------------------------------------------------
# circulation boundary condition (circ_bc, pg.h:78-163)
# ---------------------------------------------------------------------------

def circ_bc_pad(psi: jnp.ndarray, r: float, ys: float, L0: float):
    """Ghost pad of the barotropic streamfunction under the circulation BC.

    The perimeter path (bottom L->R, right B->T, top R->L, left T->B) carries
    a tridiagonal system sol with sub/super-diagonals -/+ y/(4r) and unit
    diagonal, rhs = boundary-cell psi; ghosts are 2*sol - interior, corners
    ghost_x + ghost_y - cell (pg.h:78-163)."""
    N = psi.shape[-1]
    delta = L0 / N
    yc = ys + (jnp.arange(N, dtype=psi.dtype) + 0.5) * delta
    y_bot = jnp.full((N,), yc[0], psi.dtype)
    y_top = jnp.full((N,), yc[-1], psi.dtype)
    # path order and y-coordinates
    rhs = jnp.concatenate([
        psi[0, :],            # bottom, x ascending
        psi[:, -1],           # right, y ascending
        psi[-1, ::-1],        # top, x descending
        psi[::-1, 0],         # left, y descending
    ])
    ypath = jnp.concatenate([y_bot, yc, y_top, yc[::-1]])
    ad = -ypath / (4.0 * r)
    sol = tridiag.thomas_scan(ad, jnp.ones_like(ad), -ad, rhs)
    g_bot = 2 * sol[0:N] - psi[0, :]
    g_right = 2 * sol[N:2 * N] - psi[:, -1]
    g_top = 2 * sol[2 * N:3 * N][::-1] - psi[-1, :]
    g_left = 2 * sol[3 * N:4 * N][::-1] - psi[:, 0]
    # corners: ghost_x + ghost_y - cell (pg.h:143-157). The padded array is
    # assembled with concatenations, NOT .at[].set scatters: the XLA SPMD
    # partitioner miscompiles the scatter form inside a while_loop on
    # mesh-sharded operands (silently wrong ghost values; jax 0.9.0,
    # reproduced in tests/test_mspg.py::test_mspg_btsolver_sharded...),
    # while the concat form partitions correctly — and concat also lowers
    # better on TPU than scatter.
    c00 = g_left[0] + g_bot[0] - psi[0, 0]
    c01 = g_right[0] + g_bot[-1] - psi[0, -1]
    c10 = g_left[-1] + g_top[0] - psi[-1, 0]
    c11 = g_right[-1] + g_top[-1] - psi[-1, -1]
    row_b = jnp.concatenate([c00[None], g_bot, c01[None]])
    row_t = jnp.concatenate([c10[None], g_top, c11[None]])
    mid = jnp.concatenate([g_left[:, None], psi, g_right[:, None]], axis=1)
    return jnp.concatenate([row_b[None, :], mid, row_t[None, :]], axis=0)


# ---------------------------------------------------------------------------
# constants / init
# ---------------------------------------------------------------------------

def build_constants(cfg: PGConfig, *, b_forc=None, wind_fn=None, k_fn=None,
                    b_surf_fn=None) -> PGConstants:
    """One-time setup incl. the barotropic solve (event init, pg.h:921-927).

    wind_fn(x, y) -> wind_effect field default tau0*2*pi*y*cos(2*(y-ys)*pi)
    (pg.c:38 taux_y scaled at pg.h:855); k_fn(x, y, s) -> diffusivity shape
    (pg.c:26, default 1); b_surf_fn default 6*cos(pi*(y-ys)) (pg.c:159-161).
    """
    dt = _dtype(cfg)
    N, nl = cfg.N, cfg.nl
    delta = cfg.L0 / N
    x = (np.arange(N) + 0.5) * delta
    y = cfg.ys + (np.arange(N) + 0.5) * delta
    X, Y = np.meshgrid(x, y, indexing="xy")
    yf = cfg.ys + np.arange(N + 1) * delta     # y-face y-coords

    ds = 1.0 / nl
    sf = -1.0 + np.arange(nl + 1) * ds          # sigma faces, sf[0] = -1 (pg.h:836-838)
    sc = -1.0 + (np.arange(nl) + 0.5) * ds

    if k_fn is None:
        k_fn = lambda x_, y_, s_: np.ones_like(x_ * y_)
    if wind_fn is None:
        wind_fn = lambda x_, y_: cfg.tau0 * (2 * np.pi * y_
                                             * np.cos(2 * (y_ - cfg.ys) * np.pi))
    if b_surf_fn is None:
        b_surf_fn = lambda x_, y_: 6.0 * np.cos(np.pi * (y_ - cfg.ys))

    wind = wind_fn(X, Y)
    b_surf = b_surf_fn(X, Y)

    # elliptic coefficient fields (pg.h:846-856): alpha = r/(r^2+y^2) on
    # faces, beta-vector fonh = (0, -(r^2-y^2)/(r^2+y^2)^2) at cells
    r = cfg.r
    ax = np.broadcast_to(r / (r**2 + Y[:, :1]**2), (N, N + 1)).copy()
    ax[:, :] = (r / (r**2 + Y[:, 0]**2))[:, None]
    ay = np.broadcast_to(r / (r**2 + yf[:, None]**2), (N + 1, N)).copy()
    by = -(r**2 - Y**2) / (r**2 + Y**2)**2
    bx = np.zeros((N, N))

    pad_fn = lambda a: circ_bc_pad(a, cfg.r, cfg.ys, cfg.L0)
    psibt, st = mg.solve_bt(
        jnp.zeros((N, N), dt), jnp.asarray(wind, dt), L0=cfg.L0,
        alpha_x=jnp.asarray(ax, dt), alpha_y=jnp.asarray(ay, dt),
        beta_x=jnp.asarray(bx, dt), beta_y=jnp.asarray(by, dt),
        omega=cfg.omega, tolerance=cfg.tol, pad_fn=pad_fn)

    # barotropic velocity (bt_velocity, pg.h:353-364): physical form with
    # f = y everywhere: u = (-r dpsi/dx - y dpsi/dy)/(r^2+y^2) on x-faces,
    # v = (-r dpsi/dy + y dpsi/dx)/(r^2+y^2) on y-faces.
    P = pad_fn(psibt)
    yx = jnp.asarray(Y[:, 0], dt)[:, None]                 # x-faces: cell y
    dpsidx = (P[1:-1, 1:] - P[1:-1, :-1]) / delta          # (N, N+1)
    dpsidy_x = 0.25 * (P[2:, 1:] - P[:-2, 1:]
                       + P[2:, :-1] - P[:-2, :-1]) / delta
    ubtx = (-r * dpsidx - yx * dpsidy_x) / (r**2 + yx**2)
    yy = jnp.asarray(yf, dt)[:, None]                      # y-faces: face y
    dpsidy = (P[1:, 1:-1] - P[:-1, 1:-1]) / delta          # (N+1, N)
    dpsidx_y = 0.25 * (P[1:, 2:] - P[1:, :-2]
                       + P[:-1, 2:] - P[:-1, :-2]) / delta
    ubty = (-r * dpsidy + yy * dpsidx_y) / (r**2 + yy**2)
    # no normal flow through walls (ubt.n = 0, pg.h:905-908)
    ubtx = ubtx.at[:, 0].set(0.0).at[:, -1].set(0.0)
    ubty = ubty.at[0, :].set(0.0).at[-1, :].set(0.0)

    # diffusivities: kh*k at cell-level faces, kv*k at sigma faces
    xfx = np.arange(N + 1) * delta                         # x-face x coords
    Xf, Yfx = np.meshgrid(xfx, y, indexing="xy")
    kx = np.stack([cfg.kh * k_fn(Xf, Yfx, sc[l]) for l in range(nl)])
    Xfy, Yf = np.meshgrid(x, yf, indexing="xy")
    ky = np.stack([cfg.kh * k_fn(Xfy, Yf, sc[l]) for l in range(nl)])
    kv = np.stack([cfg.kv * k_fn(X, Y, sf[l]) for l in range(nl + 1)])

    return PGConstants(
        psibt=psibt, ubtx=ubtx, ubty=ubty,
        b_surf=jnp.asarray(b_surf, dt),
        b_forc=None if b_forc is None else jnp.asarray(b_forc, dt),
        kx_face=jnp.asarray(kx, dt), ky_face=jnp.asarray(ky, dt),
        kv_prof=jnp.asarray(kv, dt), yc=jnp.asarray(Y, dt),
        sc=tuple(sc), sf=tuple(sf))


def init_state(cfg: PGConfig, const: PGConstants, *, b0=None, u0=None) -> PGState:
    dt = _dtype(cfg)
    N, nl = cfg.N, cfg.nl
    b = jnp.zeros((nl, N, N), dt) if b0 is None else jnp.asarray(b0, dt)
    ux = jnp.zeros((nl, N, N + 1), dt)
    uy = jnp.zeros((nl, N + 1, N), dt)
    if u0 is not None:
        ux, uy = jnp.asarray(u0[0], dt), jnp.asarray(u0[1], dt)
    return PGState(b=b, ux=ux, uy=uy, t=jnp.asarray(0.0, dt),
                   dt_prev=jnp.asarray(0.0, dt), i=jnp.asarray(0, jnp.int32),
                   b_me=jnp.zeros_like(b), ux_me=jnp.zeros_like(ux),
                   uy_me=jnp.zeros_like(uy), nme=jnp.asarray(0, jnp.int32))


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

def _vert_ghost(b):
    """vertbc (pg.h:374-387): zero-gradient vertical ghost layers."""
    return jnp.concatenate([b[:1], b, b[-1:]], axis=0)


def _pad_b(b):
    """Horizontal ghost pad for buoyancy: default symmetry (no-flux walls)."""
    return pad(b, BC.NEUMANN)


def advection(cfg: PGConfig, const: PGConstants, b, ux, uy):
    """Flux-form 3-D advection with diagnostic w from continuity integrated
    bottom-up (pg.h:397-439). Returns db (nl, N, N) and w at the top faces
    of each layer (for diagnostics)."""
    nl = cfg.nl
    delta = cfg.L0 / cfg.N
    ds = 1.0 / nl
    bp = _pad_b(b)
    bC = bp[:, 1:-1, 1:-1]
    bE, bW = bp[:, 1:-1, 2:], bp[:, 1:-1, :-2]
    bN, bS = bp[:, 2:, 1:-1], bp[:, :-2, 1:-1]
    # horizontal flux convergence (pg.h:420-424)
    dbh = ((bC + bW) * ux[:, :, :-1] - (bC + bE) * ux[:, :, 1:]
           + (bC + bS) * uy[:, :-1, :] - (bC + bN) * uy[:, 1:, :]) / (2 * delta)
    # diagnostic w: w[k] at TOP face of layer k, integrated from the bottom
    # (w=0 at the sea floor); div of layer k reduces w upward (pg.h:418)
    div = (ux[:, :, 1:] - ux[:, :, :-1] + uy[:, 1:, :] - uy[:, :-1, :]) \
        * ds / delta
    # cumulative from bottom: w_top[k] = -(sum_{l>=k} div[l])
    w_top = -jnp.cumsum(div[::-1], axis=0)[::-1]
    w_bot = jnp.concatenate([w_top[1:], jnp.zeros_like(w_top[:1])], axis=0)
    bg = _vert_ghost(b)
    b_below, b_above = bg[2:], bg[:-2]
    dbv = ((bC + b_below) * w_bot - (bC + b_above) * w_top) / (2 * ds)
    return dbh + dbv, w_top


def hdiffusion(cfg: PGConfig, const: PGConstants, b):
    """Explicit horizontal diffusion, face-flux form (pg.h:514-542)."""
    delta = cfg.L0 / cfg.N
    bp = _pad_b(b)
    fx = const.kx_face * (bp[:, 1:-1, 1:] - bp[:, 1:-1, :-1]) / delta
    fy = const.ky_face * (bp[:, 1:, 1:-1] - bp[:, :-1, 1:-1]) / delta
    return (fx[:, :, 1:] - fx[:, :, :-1] + fy[:, 1:, :] - fy[:, :-1, :]) / delta


def vdiff_implicit(cfg: PGConfig, const: PGConstants, b, dt):
    """Implicit vertical diffusion with surface-flux injection
    (pg.h:450-508). kv_prof[l] = kv*k at sigma face sf[l]; the surface flux
    uses 2*K0 (half-cell) and the bottom flux vanishes."""
    nl = cfg.nl
    ds = 1.0 / nl
    K = const.kv_prof  # (nl+1, N, N); K[0] surface, K[nl] bottom (unused)
    b = b.at[0].add(dt * 2.0 * K[0] / (ds * ds) * const.b_surf)
    # coefficients (pg.h:470-490): layer 0 (surface): ad=0,
    # cd=-dt*K[1]/ds^2, bd=1+dt*K[1]/ds^2+2*dt*K[0]/ds^2
    # interior l: ad=-dt*K[l]/ds^2, cd=-dt*K[l+1]/ds^2, bd=1-ad-cd
    # bottom: ad=-dt*K[nl-1]/ds^2, cd=0, bd=1-ad
    c = dt / (ds * ds)
    ad = jnp.concatenate([jnp.zeros_like(K[:1]), -c * K[1:nl]], axis=0)
    cd = jnp.concatenate([-c * K[1:nl], jnp.zeros_like(K[:1])], axis=0)
    bd = 1.0 - ad - cd
    bd = bd.at[0].add(2.0 * c * K[0])
    return tridiag.thomas(ad, bd, cd, b)


def convection(b):
    """Convective adjustment: single top-down sweep mixing unstable pairs
    (pg.h:548-579; deeper layer lighter -> average the pair)."""
    nl = b.shape[0]
    for l in range(nl - 1):
        unstable = b[l + 1] > b[l]
        avg = 0.5 * (b[l] + b[l + 1])
        b = b.at[l].set(jnp.where(unstable, avg, b[l]))
        b = b.at[l + 1].set(jnp.where(unstable, avg, b[l + 1]))
    return b


def forcing_implicit(cfg: PGConfig, const: PGConstants, b, dt):
    """Implicit surface relaxation b1 = (b_surf*dt + b1*tau_s)/(dt+tau_s)
    (pg.h:586-592)."""
    return b.at[0].set((const.b_surf * dt + b[0] * cfg.tau_s)
                       / (dt + cfg.tau_s))


def momentum(cfg: PGConfig, const: PGConstants, b, ux, uy):
    """Hydrostatic pressure + momentum tendency du = -grad p - f u^perp - r u
    + nu lap u on faces (pg.h:612-646), f = y."""
    nl = cfg.nl
    N = cfg.N
    delta = cfg.L0 / N
    ds = 1.0 / nl
    # hydrostatic: p[0] = -b[0]*ds/2; p[l] = p[l-1] - (b[l-1]+b[l])*ds/2
    incr = jnp.concatenate([-b[:1] * 0.5 * ds,
                            -0.5 * (b[:-1] + b[1:]) * ds], axis=0)
    p = jnp.cumsum(incr, axis=0)
    pp = _pad_b(p)
    dpdx = (pp[:, 1:-1, 1:] - pp[:, 1:-1, :-1]) / delta      # (nl, N, N+1)
    dpdy = (pp[:, 1:, 1:-1] - pp[:, :-1, 1:-1]) / delta      # (nl, N+1, N)

    # v averaged to x-faces: the 4 y-faces of the two cells flanking the
    # x-face (pg.h:641); needs x-ghost columns of uy (mirror)
    uyg = jnp.concatenate([uy[:, :, :1], uy, uy[:, :, -1:]], axis=-1)
    vbar = 0.25 * (uyg[:, :-1, :-1] + uyg[:, :-1, 1:]
                   + uyg[:, 1:, :-1] + uyg[:, 1:, 1:])       # (nl, N, N+1)
    uxg = jnp.concatenate([ux[:, :1, :], ux, ux[:, -1:, :]], axis=-2)
    ubar = 0.25 * (uxg[:, :-1, :-1] + uxg[:, :-1, 1:]
                   + uxg[:, 1:, :-1] + uxg[:, 1:, 1:])       # (nl, N+1, N)
    yx = const.yc[:, :1]                                     # (N,1) cell y
    yf = jnp.asarray(
        cfg.ys + np.arange(N + 1) * (cfg.L0 / N), ux.dtype)[:, None]
    lap_ux = _lap_face_x(ux, delta)
    lap_uy = _lap_face_y(uy, delta)
    dux = -dpdx + yx * vbar - cfg.r * ux + cfg.nu * lap_ux
    duy = -dpdy - yf * ubar - cfg.r * uy + cfg.nu * lap_uy
    return dux, duy


def _pad_face_x(ux):
    """Ghost pad of an x-face field: one ghost in each direction; normal
    ghost faces mirror (the wall face itself carries u.n = 0), tangential
    ghost rows mirror (default symmetry)."""
    g = jnp.concatenate([ux[:, :, :1], ux, ux[:, :, -1:]], axis=-1)
    return jnp.concatenate([g[:, :1], g, g[:, -1:]], axis=-2)


def _pad_face_y(uy):
    g = jnp.concatenate([uy[:, :1, :], uy, uy[:, -1:, :]], axis=-2)
    return jnp.concatenate([g[:, :, :1], g, g[:, :, -1:]], axis=-1)


def _lap_face_x(ux, delta):
    P = _pad_face_x(ux)
    return (P[:, 1:-1, 2:] + P[:, 1:-1, :-2] + P[:, 2:, 1:-1]
            + P[:, :-2, 1:-1] - 4 * ux) / (delta * delta)


def _lap_face_y(uy, delta):
    P = _pad_face_y(uy)
    return (P[:, 1:-1, 2:] + P[:, 1:-1, :-2] + P[:, 2:, 1:-1]
            + P[:, :-2, 1:-1] - 4 * uy) / (delta * delta)


def adjust_bt_velocity(cfg: PGConfig, const: PGConstants, ux, uy, btfac):
    """Remove the vertical mean and add btfac*ubt (pg.h:649-672)."""
    ds = 1.0 / cfg.nl
    ux_me = jnp.sum(ux * ds, axis=0, keepdims=True)
    uy_me = jnp.sum(uy * ds, axis=0, keepdims=True)
    ux = ux + btfac * const.ubtx[None] - ux_me
    uy = uy + btfac * const.ubty[None] - uy_me
    return ux, uy


def comp_gm(cfg: PGConfig, const: PGConstants, b):
    """Gent-McWilliams eddy-induced face velocities (pg.h:682-724): per face,
    solve the Ferrari et al. 2010 Eq. 16 tridiagonal for upsilon at the nl-1
    interior interfaces with c1 = max(cmin, sqrt|b_surf - b_bot|)/... then
    u_gm = d upsilon/dz."""
    nl = cfg.nl
    if nl < 2:
        return jnp.zeros_like(b[:, :, :1]), jnp.zeros_like(b[:, :1, :])
    delta = cfg.L0 / cfg.N
    ds = 1.0 / nl

    def gm_for(bp, axis):
        # bp: padded b; compute at faces along `axis` using left/right cells
        if axis == "x":
            bL = bp[:, 1:-1, :-1]
            bR = bp[:, 1:-1, 1:]
        else:
            bL = bp[:, :-1, 1:-1]
            bR = bp[:, 1:, 1:-1]
        c_bc1 = jnp.sqrt(jnp.abs(bR[0] - bR[nl - 1])) / jnp.pi
        c2 = jnp.maximum(cfg.cmin, c_bc1) ** 2
        # interfaces l = 0..nl-2 between layers l and l+1
        dbdx = 0.5 * (bR[:-1] - bL[:-1] + bR[1:] - bL[1:]) / delta
        rhs = -cfg.k_gm * dbdx
        N2 = jnp.maximum(cfg.N2min,
                         0.5 * ((bR[:-1] - bR[1:]) + (bL[:-1] - bL[1:])) / ds)
        ad = jnp.broadcast_to(c2 / (ds * ds), rhs.shape)
        bd = -2.0 * c2 / (ds * ds) - N2
        ad0 = ad.at[0].set(0.0)
        cd0 = ad.at[-1].set(0.0)
        ups = tridiag.thomas(ad0, bd, cd0, rhs)   # upsilon at interfaces
        # u_gm[l] = (ups[l-1] - ups[l])/ds with ups[-1] = ups[nl-1] = 0
        z = jnp.zeros_like(ups[:1])
        ups_above = jnp.concatenate([z, ups], axis=0)   # interface above layer l
        ups_below = jnp.concatenate([ups, z], axis=0)   # interface below
        return (ups_above - ups_below) / ds

    bp = _pad_b(b)
    ugm_x = gm_for(bp, "x")
    ugm_y = gm_for(bp, "y")
    # no normal flow at walls
    ugm_x = ugm_x.at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
    ugm_y = ugm_y.at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
    return ugm_x, ugm_y


def _zero_walls(ux, uy):
    ux = ux.at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
    uy = uy.at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
    return ux, uy


def cfl_dtmax(cfg, ux, uy, dtmax0, prev):
    """timestep(u) per layer bottom-up (pg.h:432-436), shared `previous`."""
    delta = cfg.L0 / cfg.N
    dtm = dtmax0
    big = jnp.asarray(jnp.finfo(ux.dtype).max / 4, ux.dtype)
    for l in range(cfg.nl - 1, -1, -1):
        umax = jnp.maximum(jnp.max(jnp.abs(ux[l])), jnp.max(jnp.abs(uy[l])))
        dt_cfl = jnp.where(umax > 0, cfg.CFL * delta / umax, big)
        dtm = jnp.minimum(dtm, dt_cfl)
        dtm = jnp.where(dtm > prev, (prev + 0.1 * dtm) / 1.1, dtm)
        prev = dtm
    return dtm, prev


# ---------------------------------------------------------------------------
# update / advance / step (predictor-corrector, pg.h:733-800)
# ---------------------------------------------------------------------------

def update_pg(cfg: PGConfig, const: PGConstants, b, ux, uy, prev, dtmax0):
    db, _ = advection(cfg, const, b, ux, uy)
    dtm, prev = cfl_dtmax(cfg, ux, uy, dtmax0, prev)
    if cfg.k_gm > 0:
        gx, gy = comp_gm(cfg, const, b)
        db_gm, _ = advection(cfg, const, b, gx, gy)
        db = db + db_gm
        dtm, prev = cfl_dtmax(cfg, gx, gy, dtm, prev)
    db = db + hdiffusion(cfg, const, b)
    if const.b_forc is not None:
        db = db + const.b_forc
    dux, duy = momentum(cfg, const, b, ux, uy)
    return db, dux, duy, dtm, prev


def advance_pg(cfg: PGConfig, const: PGConstants, b, ux, uy, db, dux, duy,
               dt):
    b = b + db * dt
    ux = ux + dux * dt
    uy = uy + duy * dt
    b = forcing_implicit(cfg, const, b, dt)
    b = vdiff_implicit(cfg, const, b, dt)
    b = convection(b)
    ux, uy = adjust_bt_velocity(cfg, const, ux, uy, 1.0)
    ux, uy = _zero_walls(ux, uy)
    return b, ux, uy


def make_step(cfg: PGConfig):
    from msom_tpu.models.qg import dtnext
    DT = cfg.DT

    def step(state: PGState, const: PGConstants, tnext):
        db, dux, duy, dtm, prev = update_pg(cfg, const, state.b, state.ux,
                                            state.uy, state.dt_prev, DT)
        dt = dtnext(state.t, tnext, dtm)
        # predictor (half step)
        bh, uxh, uyh = advance_pg(cfg, const, state.b, state.ux, state.uy,
                                  db, dux, duy, dt / 2)
        db2, dux2, duy2, _, prev = update_pg(cfg, const, bh, uxh, uyh, prev,
                                             DT)
        b, ux, uy = advance_pg(cfg, const, state.b, state.ux, state.uy,
                               db2, dux2, duy2, dt)
        new = PGState(b=b, ux=ux, uy=uy, t=state.t + dt, dt_prev=prev,
                      i=state.i + 1, b_me=state.b_me, ux_me=state.ux_me,
                      uy_me=state.uy_me, nme=state.nme)
        return new, PGStepDiag(dt=dt)

    return step


def accumulate_means(state: PGState) -> PGState:
    """comp_output running means every 10 steps (pg.c:179-203; note the
    reference averages u_gm into u_mel — reproduced faithfully would need
    u_gm; here the resolved u is averaged, documented deviation)."""
    nme = state.nme
    b_me = (state.b_me * nme + state.b) / (nme + 1)
    ux_me = (state.ux_me * nme + state.ux) / (nme + 1)
    uy_me = (state.uy_me * nme + state.uy) / (nme + 1)
    return dataclasses.replace(state, b_me=b_me, ux_me=ux_me, uy_me=uy_me,
                               nme=nme + 1)
