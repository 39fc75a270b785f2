"""qg-node vertex-grid model tests: nodal MG inversion, BC machinery,
barotropic + baroclinic paths, time-varying forcing, masked filter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msom_tpu.models import qg_node as qn
from msom_tpu.ops import vertex
from msom_tpu.solvers import vmg

RNG = np.random.default_rng(9)


def bt_cfg(**kw):
    base = dict(N=64, nl=1, L0=100.0, tau0=1e-3, nu=5.0, beta=0.5,
                dh=(1.0,), bc_fac=0.0, DT=5e-2, tend=200.0, dtout=10.0,
                CFL=0.2, TOLERANCE=1e-5, dtype="float64")
    base.update(kw)
    return qn.NodeQGConfig(**base)


def bc_cfg(**kw):
    base = dict(N=32, nl=3, L0=100.0, tau0=1e-3, nu=5.0, beta=0.5,
                dh=(0.2, 0.3, 0.5), N2=(1.0, 1.0), bc_fac=0.0, DT=5e-2,
                tend=10.0, dtout=10.0, CFL=0.2, TOLERANCE=1e-6,
                noise_init=1e-2, dtype="float64")
    base.update(kw)
    return qn.NodeQGConfig(**base)


def test_load_reference_deck():
    cfg = qn.load_node_config("/root/reference/qg-node/params.in",
                              dtype="float64")
    assert cfg.N > 0 and cfg.TOLERANCE > 0


def test_vertex_transfer_ops():
    c = jnp.asarray(RNG.standard_normal((5, 5)))
    f = vertex.vprolong(c)
    assert f.shape == (9, 9)
    # injection at co-located nodes, exact midpoint averages
    np.testing.assert_allclose(np.asarray(f)[::2, ::2], np.asarray(c))
    np.testing.assert_allclose(
        np.asarray(f)[0, 1], 0.5 * (np.asarray(c)[0, 0] + np.asarray(c)[0, 1]))
    # weighted restriction of a constant away from edges is the constant
    g = vertex.vrestrict_weighted(jnp.ones((9, 9)))
    np.testing.assert_allclose(np.asarray(g)[1:-1, 1:-1], 1.0)


def test_nodal_inversion_roundtrip():
    cfg = bc_cfg()
    const = qn.build_constants(cfg)
    psi = jnp.asarray(RNG.standard_normal((3, 33, 33)))
    psi = vertex.bc_psi(psi)
    q = qn.comp_q(cfg, const, psi)
    psi2, st = qn.invert_q(cfg, const, jnp.zeros_like(psi), q)
    q2 = qn.comp_q(cfg, const, psi2)
    m = np.asarray(const.mask)
    err = np.abs(np.asarray(q2 - q)) * m
    assert err.max() < 5e-6  # TOLERANCE 1e-6 in q units
    assert int(st.iters) < vmg.NITERMAX


def test_barotropic_helmholtz_inversion():
    cfg = bt_cfg(N=32, gp_low=2.0, TOLERANCE=1e-8)
    assert cfg.iRd2_low == pytest.approx(1.0 / 2.0)
    const = qn.build_constants(cfg)
    psi = vertex.bc_psi(jnp.asarray(RNG.standard_normal((1, 33, 33))))
    q = qn.comp_q(cfg, const, psi)
    psi2, st = qn.invert_q(cfg, const, jnp.zeros_like(psi), q)
    m = np.asarray(const.mask)
    assert (np.abs(np.asarray(psi2 - psi)) * m).max() < 1e-5


def test_bc_fac_noslip_vorticity():
    """bc_fac=1 (no slip): wall zeta = 2*(psi_in - 0)/Delta^2."""
    cfg = bc_cfg(bc_fac=1.0)
    const = qn.build_constants(cfg)
    psi = vertex.bc_psi(jnp.asarray(RNG.standard_normal((3, 33, 33))))
    q = qn.comp_q(cfg, const, psi)
    c = 2.0 / cfg.delta**2
    np.testing.assert_allclose(np.asarray(q)[:, 5, 0],
                               c * np.asarray(psi)[:, 5, 1], rtol=1e-12)


def test_double_gyre_barotropic_spinup():
    cfg = bt_cfg(tend=1.0)
    const = qn.build_constants(cfg)
    state = qn.init_state(cfg, const, seed=0)
    step = jax.jit(qn.make_step(cfg))
    kes = []
    for _ in range(8):
        state, d = step(state, const, jnp.asarray(1e9))
        kes.append(float(d.ke))
    assert np.isfinite(np.asarray(state.q)).all()
    assert kes[-1] > 0 and kes[-1] > kes[0]
    # boundary nodes stay masked
    assert np.allclose(np.asarray(state.q)[:, 0, :], 0.0)


def test_time_varying_forcing():
    cfg = bt_cfg(tau1=0.5, tf1=2.0)
    const = qn.build_constants(cfg)
    f0 = np.asarray(qn.q_forcing_field(cfg, const, jnp.asarray(0.0)))
    f1 = np.asarray(qn.q_forcing_field(cfg, const, jnp.asarray(0.5)))
    assert np.abs(f0 - f1).max() > 0  # wind varies in time
    # amplitude at t=0: -(tau0+tau1)*forc_mode*pi/L0 envelope
    assert np.abs(f0).max() <= (cfg.tau0 + cfg.tau1) * 2 * np.pi / cfg.L0 + 1e-12


def test_baroclinic_multilayer_step():
    cfg = bc_cfg()
    const = qn.build_constants(cfg)
    state = qn.init_state(cfg, const, seed=2)
    step = jax.jit(qn.make_step(cfg))
    for _ in range(5):
        state, d = step(state, const, jnp.asarray(1e9))
    assert np.isfinite(np.asarray(state.q)).all()
    assert np.isfinite(float(d.ke)) and float(d.ke) > 0


def test_masked_wavelet_filter():
    cfg = bc_cfg(dtflt=1.0, Lfmax=50.0, Lfmin=50.0)
    const = qn.build_constants(cfg)
    state = qn.init_state(cfg, const, seed=3)
    assert state.psi_f is not None
    s2 = qn.wavelet_filter(cfg, const, state)
    assert int(s2.nbar) == 1
    assert np.isfinite(np.asarray(s2.psi)).all()
    # filter splits: psi_new + dtflt*psi_f*1 ~ original inverted psi interior
    psi_inv, _ = qn.invert_q(cfg, const, state.psi, state.q)
    recon = np.asarray(s2.psi) + np.asarray(s2.psi_f) * cfg.dtflt
    m = np.asarray(const.mask)
    np.testing.assert_allclose(recon * m, np.asarray(psi_inv) * m,
                               atol=1e-10)


def test_stochastic_noise_masked():
    cfg = bc_cfg(stochastic=True, amp_stoch=0.1, L_filt_stoch=10.0)
    const = qn.build_constants(cfg)
    key = jax.random.PRNGKey(0)
    n = qn.generate_noise(cfg, const, key, (3, 33, 33))
    n = np.asarray(n)
    assert n.std() > 0
    assert np.allclose(n[:, 0, :], 0.0)  # masked at boundary


# ---------------------------------------------------------------------------
# periodic (bc_fac = -1, the reference's experimental option qg-node/qg.c:117)
# ---------------------------------------------------------------------------

def _pcfg(nl, **kw):
    base = dict(N=32, nl=nl, L0=100.0, f0=46.5, beta=0.5, hEkb=1e-3,
                tau0=1e-3, nu=5.0, dh=tuple([1.0 / nl] * nl),
                N2=tuple([1.0] * max(nl - 1, 1)), noise_init=1e-3,
                bc_fac=-1.0, DT=5e-2, tend=1.0, dtout=1.0, CFL=0.2,
                TOLERANCE=1e-10, dtype="float64")
    base.update(kw)
    return qn.NodeQGConfig(**base)


@pytest.mark.parametrize("nl", [1, 3])
def test_periodic_inversion_roundtrip(nl):
    """invert_q(comp_q(psi)) recovers psi on the periodic N-node grid
    (nullspace-projected gauge)."""
    cfg = _pcfg(nl)
    const = qn.build_constants(cfg)
    rng = np.random.default_rng(4)
    psi0 = jnp.asarray(rng.standard_normal((nl, cfg.N, cfg.N)))
    psi0 = qn._project_nullspace(cfg, psi0)
    q = qn.comp_q(cfg, const, psi0)
    psi, st = qn.invert_q(cfg, const, jnp.zeros_like(psi0), q)
    scale = float(jnp.max(jnp.abs(psi0)))
    assert float(jnp.max(jnp.abs(psi - psi0))) < 1e-6 * scale
    assert int(st.iters) < 100


def test_periodic_rhs_conserves_integrals():
    """On the unforced inviscid periodic domain the RHS integrates to zero
    (Arakawa telescoping + periodic laplacian) layer-thickness-weighted."""
    cfg = _pcfg(2, nu=0.0, hEkb=0.0, tau0=0.0, beta=0.5)
    const = qn.build_constants(cfg)
    state = qn.init_state(cfg, const, seed=5)
    psi, _ = qn.invert_q(cfg, const, state.psi, state.q)
    dq = qn.rhs_pv(cfg, const, state.q, psi, jnp.asarray(0.0))
    w = np.asarray(cfg.dh)
    tot = float(sum(w[l] * float(jnp.sum(dq[l])) for l in range(cfg.nl)))
    scale = float(jnp.max(jnp.abs(dq))) * cfg.N ** 2
    assert abs(tot) < 1e-10 * max(scale, 1e-30)


def test_periodic_node_driver_end_to_end(tmp_path):
    """run_node on a periodic config: vars.nc stores the wrapped (N+1)^2
    vertex view, the filter and stochastic branches run, diag rows are
    finite."""
    import os
    from msom_tpu.driver_node import run_node
    from msom_tpu.io.netcdf import read_nc

    cfg = _pcfg(2, N=32, tend=0.6, dtout=0.3, dtdiag=0.3, dtflt=0.4,
                Lfmax=30.0, Lfmin=10.0, stochastic=True, amp_stoch=1e-5,
                L_filt_stoch=12.5, TOLERANCE=1e-6)
    out = str(tmp_path / "p")
    st, _ = run_node(cfg, outdir=out, restart=None)
    fields, _ = read_nc(os.path.join(out, "vars.nc"), ["psi", "q"],
                        time_index=None)
    assert fields["psi"].shape[-2:] == (33, 33)
    assert np.all(np.isfinite(fields["psi"]))
    np.testing.assert_array_equal(fields["psi"][..., -1, :-1],
                                  fields["psi"][..., 0, :-1])
    np.testing.assert_array_equal(fields["psi"][..., :-1, -1],
                                  fields["psi"][..., :-1, 0])
    lines = open(os.path.join(out, "diag_1d.dat")).read().strip().split("\n")
    rows = np.array([[float(v) for v in ln.split(",")] for ln in lines[1:]])
    assert np.all(np.isfinite(rows))
    assert float(st.t) == pytest.approx(0.6, abs=1e-9)


def test_nodal_spectral_inversion_exact_and_matches_vmg():
    """The direct nodal spectral inversion (DST-I x vertical modes on the
    interior vertices with zero ring, solvers/spectral.build_spectral_node)
    must satisfy the masked nodal residual at roundoff — far below the
    multigrid's TOLERANCE — and agree with the vmg solution within the
    multigrid's own tolerance, baroclinic AND barotropic (iRd2_low)."""
    for cfg in (bc_cfg(), bt_cfg(gp_low=4.0, dh=(0.5,))):
        const = qn.build_constants(cfg)
        assert const.nspec is not None
        state = qn.init_state(cfg, const, seed=3)
        psi0 = state.psi + 0.01 * jax.random.normal(
            jax.random.PRNGKey(5), state.psi.shape, state.psi.dtype)
        psi0 = vertex.bc_psi(psi0)
        q = qn.comp_q(cfg, const, psi0)

        psi_sp, st_sp = qn.invert_q(cfg, const, jnp.zeros_like(q), q)
        # masked residual of the spectral solution: machine precision
        qm = q * const.mask
        _, res_sp = vmg.residual_v(psi_sp, qm, const.vlevels[0],
                                   const.idh0, const.idh1)
        assert float(res_sp) < 1e-10 * float(jnp.abs(qm).max())

        import dataclasses as dc
        cfg_v = dc.replace(cfg, solver="vmg")
        psi_mg, st_mg = qn.invert_q(cfg_v, const, jnp.zeros_like(q), q)
        # the mg solution error = A^-1(residual): amplified by ~1/lam_min
        # ~ (L0/pi)^2/2 over the residual tolerance — a sanity band, the
        # exactness claim is the roundoff residual above
        scale = float(jnp.abs(psi_sp).max())
        assert float(jnp.abs(psi_mg - psi_sp).max()) < 1e3 * cfg.TOLERANCE \
            * max(scale, 1.0)


def test_nodal_spectral_not_applicable_cases():
    """Non-default masks and y-varying S2 (flag_ms) must fall back to the
    multigrid (auto) or raise (explicit spectral)."""
    import dataclasses as dc

    cfg = bc_cfg(flag_ms=1)
    const = qn.build_constants(cfg)
    assert const.nspec is None          # S2 varies in y
    with pytest.raises(ValueError):
        qn.build_constants(dc.replace(cfg, solver="spectral"))
    cfg2 = bc_cfg()
    m = np.array(vertex.default_mask(cfg2.N))
    m[10:14, 10:14] = 0.0               # island
    const2 = qn.build_constants(cfg2, mask=m)
    assert const2.nspec is None
