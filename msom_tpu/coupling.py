"""The offline mspg <-> msqg multiple-scale coupling pipeline.

This is the workflow the reference exists for (README.org:12): the
large-scale PG thermocline state conditions the small-scale QG eddy model,
and the QG wavelet-filtered eddy flux feeds back as PG buoyancy forcing.
The reference runs it as a chain of scripts; this module is the native
equivalent, one function per stage:

    run mspg -> mean state (b, u, v)
      pg_to_qg_inputs      <- mspg/scripts/modes.py (stratification floors,
                              layer aggregation, gp/Fr/Rd, per-column modes,
                              psi from the velocity curl) + regrid.py
                              (bicubic PG grid -> QG grid)
    run msqg with psipg/frpg/rdpg, wavelet filter accumulating qof
      qg_feedback_forcing  <- mspg/scripts/pgforcing.py (dimensionalize the
                              filtered flux, vertical derivative -> buoyancy,
                              QG-modal -> PG-modal projection, adim Ts/Bs)
    run mspg with b_forc (qg_forcing, /root/reference/mspg/pg.h:598-606)

Dimensional scale conventions follow modes.py:36-53 (PG: L, H, beta, N2
-> Ts/Us/Bs; QG: u_qg, l_qg) — the unit conversions are exactly where
such a pipeline breaks, so tests/test_coupling_workflow.py runs the whole
loop end-to-end and checks the PG budget responds to the feedback.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class PGScales:
    """Dimensional PG scales (mspg/scripts/modes.py:36-47) and the QG eddy
    scales (modes.py:52-53, pgforcing.py:14-15)."""
    L: float = 5000e3        # basin width (m)
    H: float = 5000.0        # depth (m)
    beta: float = 2.0e-11    # 1/m/s
    N2: float = 1e-6         # background stratification (1/s^2)
    u_qg: float = 0.1        # QG velocity scale (m/s)
    l_qg: float = 50e3       # QG length scale (m)

    @property
    def Bs(self):            # buoyancy scale
        return self.N2 * self.H

    @property
    def Ts(self):            # PG time scale
        return self.beta * self.L ** 3 / (self.N2 * self.H ** 2)

    @property
    def Us(self):            # PG velocity scale
        return self.N2 * self.H ** 2 / (self.beta * self.L ** 2)


def _aggregate_layers(x, il, axis=0):
    """Mean over PG sigma-layer bands il[k]:il[k+1] (modes.py:142-146)."""
    x = np.asarray(x)
    return np.stack([np.take(x, range(il[k], il[k + 1]), axis=axis)
                     .mean(axis=axis) for k in range(len(il) - 1)],
                    axis=axis)


def pg_to_qg_inputs(pg_cfg, b, u, v, *, il, N_qg, scales: PGScales = None,
                    N2_min: float = 2e-7, adjust_psi_coef: float = 1.0):
    """PG mean state -> msqg input fields (the modes.py + regrid.py stage).

    b: (nl_pg, N, N) nondim PG buoyancy (interior layers); u, v: (nl_pg,
    N, N) nondim velocities at cell centers; il: QG layer-interface index
    list into the sigma layers (modes.py:129-134), len(il)-1 = nl_qg.

    Returns dict(psipg, frpg, rdpg, dh, Rom) on the (N_qg, N_qg) grid —
    build msqg constants as build_constants(cfg, psipg=..., frpg=...,
    rdpg=...) with cfg.dh = dh."""
    from msom_tpu.analysis import regrid_bicubic
    from msom_tpu.ops import modes as modes_mod
    from msom_tpu.solvers import spectral as spectral_mod

    sc = scales or PGScales()
    b = np.asarray(b, np.float64)
    nl_pg, N, _ = b.shape
    dz = sc.H / nl_pg
    z = 0.5 * dz - dz * np.arange(1, nl_pg + 1)

    # stratification floor above the mixed layer (modes.py:100-110): raise
    # b below any interface whose N^2 < N2_min so every gp is positive
    bb = b.copy()
    for nz in range(nl_pg - 1):
        N2_l = sc.Bs * (bb[nz] - bb[nz + 1]) / dz
        lift = np.maximum(N2_min - N2_l, 0.0)
        bb[nz + 1:] -= (lift * dz) / sc.Bs

    # y-dependent Coriolis + Rossby number (modes.py:122-127)
    ys = float(getattr(pg_cfg, "ys", 0.0))
    yy = ys + (np.arange(N) + 0.5) / N
    f0 = yy * sc.L * sc.beta                            # (N,)
    Ro = sc.u_qg / (f0 * sc.l_qg)
    # the msqg Rom convention evaluates 1/f at the MEAN latitude
    # (modes.py uses f0 = yc.mean()*L*beta for the uniform-strat case);
    # mean(1/f) would overshoot by ~(spread/2)^2
    Rom = float(sc.u_qg / (f0.mean() * sc.l_qg))

    # QG layer aggregation (modes.py:136-158)
    il = list(il)
    nl_qg = len(il) - 1
    bt = _aggregate_layers(bb, il)
    ut = _aggregate_layers(np.asarray(u, np.float64), il)
    vt = _aggregate_layers(np.asarray(v, np.float64), il)
    dzt = np.array([dz * (il[k + 1] - il[k]) for k in range(nl_qg)])
    dzi = 0.5 * (dzt[:-1] + dzt[1:])
    gpt = -sc.Bs * np.diff(bt, axis=0)                  # (nl_qg-1, N, N)
    gpt = np.maximum(gpt, 1e-8)
    N2lt = gpt / dzi[:, None, None]
    Fr = sc.u_qg / (np.sqrt(N2lt) * sc.H)               # (nl_qg-1, N, N)

    # deformation radii from the aggregated stratification: batched
    # per-column eigmod (the reference's def_radius.cal_rad loop,
    # modes.py:168-175) with s = f0^2/N^2 at interfaces
    s_cols = (f0[:, None] ** 2)[None] / N2lt            # (nl-1, N, N)
    vm = modes_mod.eigmod(dzt, np.moveaxis(s_cols, 0, -1), htotal=sc.H)
    lam1 = -vm.iBu[..., 1]                              # (N, N)
    rd = 1.0 / np.sqrt(np.maximum(lam1, 1e-30))         # meters
    rd_a = rd / sc.l_qg                                 # QG nondim

    # large-scale streamfunction from the velocity curl (modes.py:204-210):
    # dimensional zeta -> Poisson solve per layer -> psi, adim /(l u)
    Dd = sc.L / N
    fu, fv = sc.Us * ut, sc.Us * vt
    zeta = ((np.roll(fv, -1, axis=2) - fv)
            - (np.roll(fu, -1, axis=1) - fu)) / Dd
    zeta[:, -1, :] = 0.0
    zeta[:, :, -1] = 0.0
    sd = spectral_mod.build_spectral(nl=1, N=N, L0=N * Dd, periodic=False,
                                     dtype=np.float64, transform="matmul")
    import jax.numpy as jnp
    psi = np.stack([np.asarray(spectral_mod.solve_spectral(
        sd, jnp.asarray(zeta[k][None])))[0] for k in range(nl_qg)])
    psi_a = adjust_psi_coef * psi / (sc.l_qg * sc.u_qg)

    # bicubic regrid PG grid -> QG grid (regrid.py; our regrid_bicubic
    # handles stacked layers and the edge extrapolation)
    psipg = regrid_bicubic(psi_a, 1.0, N_qg)
    frpg = np.concatenate([regrid_bicubic(Fr, 1.0, N_qg),
                           np.zeros((1, N_qg, N_qg))], axis=0)
    rdpg = regrid_bicubic(rd_a, 1.0, N_qg)[0]
    return dict(psipg=psipg, frpg=frpg, rdpg=rdpg,
                dh=tuple(dzt / sc.H), Rom=Rom)


def qg_feedback_forcing(pf_qg, dh_qg, Fr_prof, Rom, nl_pg,
                        scales: PGScales = None, mode_cut=None):
    """QG filtered-flux accumulator -> PG buoyancy forcing b_forc (the
    pgforcing.py stage): dimensionalize psi-flux (u^2 u / l,
    pgforcing.py:14-25), vertical derivative -> interface buoyancy flux
    centered on layers (:74-79), QG-modal -> PG-modal projection through
    the vertical modes (:94-105), nondimensionalize with Ts/Bs (:119).

    pf_qg: (nl_qg, N, N) filtered streamfunction flux (psi_f or the
    qof-inverted accumulator mean); Fr_prof: (nl_qg-1,) uniform Fr values
    (to form the modes); returns (nl_pg, N, N) nondim b_forc on the SAME
    horizontal grid (regrid separately if PG runs coarser)."""
    from msom_tpu.analysis import qg_flux_to_pg_forcing

    sc = scales or PGScales()
    pf = np.asarray(pf_qg, np.float64) * sc.u_qg ** 2 * sc.u_qg / sc.l_qg
    dh_qg = np.asarray(dh_qg, np.float64)
    dh2 = 0.5 * (dh_qg[1:] + dh_qg[:-1])
    bf = np.diff(pf, axis=0) / dh2[:, None, None]
    bf2 = np.empty_like(pf)
    bf2[0] = bf[0]
    bf2[-1] = bf[-1]
    if pf.shape[0] > 2:
        bf2[1:-1] = 0.5 * (bf[:-1] + bf[1:])
    s_prof = (np.asarray(Fr_prof, np.float64) / Rom) ** 2
    bf_pg = qg_flux_to_pg_forcing(bf2, dh_qg, s_prof, nl_pg,
                                  mode_cut=mode_cut)
    return bf_pg * sc.Ts / sc.Bs
