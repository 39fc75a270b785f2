"""Fused Pallas RHS kernel vs models.qg.rhs (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msom_tpu.models import pallas_rhs
from msom_tpu.models import qg as m
from msom_tpu.ops.ghost import ghosted, laplacian_g
from msom_tpu.params import QGConfig


@pytest.mark.parametrize("N,nl,Re", [(128, 3, 0), (64, 1, 0), (128, 4, 1000),
                                     (256, 2, 0)])
def test_rhs_fused_matches_xla(N, nl, Re):
    cfg = QGConfig(N=N, nl=nl, L0=80, Rom=0.025, Ekb=0.002, Eks=0.001,
                   tau0=1e-4, Re4=391, Re=Re, beta=0.5,
                   Fr=(0.0023669,) * (nl - 1) if nl > 1 else (),
                   dh=tuple([1.0 / nl] * nl), DT=5e-2, tend=500.0,
                   dtout=1.0, CFL=0.6, dtype="float64").validate()
    const = m.build_constants(cfg)
    assert pallas_rhs.applicable(cfg, const)
    state = m.init_state(cfg, const, seed=1)
    psi = state.psi + 0.1 * jax.random.normal(
        jax.random.PRNGKey(2), state.psi.shape, state.psi.dtype)
    psi_g = ghosted(psi, m._bc_psi(cfg))
    zeta = laplacian_g(psi_g, cfg.delta)
    zeta_g = m._ghost_deriv(cfg, zeta, psi_g)
    dq_ref, _ = m.rhs(cfg, const, state.q, psi, psi_g, zeta, zeta_g, None)
    dq_k, umax_k = pallas_rhs.rhs_fused(cfg, const, psi, interpret=True)
    np.testing.assert_allclose(np.asarray(dq_k), np.asarray(dq_ref),
                               atol=1e-12)
    # the fused CFL face maxima must equal the XLA lowering's, per layer
    from msom_tpu.ops.ghost import max_face_speed_layers
    umax_ref = max_face_speed_layers(psi_g, cfg.delta)
    np.testing.assert_allclose(np.asarray(umax_k), np.asarray(umax_ref),
                               rtol=1e-13, atol=0)


def _base_kw(N=128, nl=3, **kw):
    base = dict(N=N, nl=nl, L0=80, Rom=0.025, Ekb=0.002, Eks=0.001,
                tau0=1e-4, Re4=391, beta=0.5,
                Fr=(0.0023669,) * (nl - 1) if nl > 1 else (),
                dh=tuple([1.0 / nl] * nl), DT=5e-2, tend=500.0,
                dtout=1.0, CFL=0.6, dtype="float64")
    base.update(kw)
    return base


def _compare_rhs(cfg, const, seed=2, atol=1e-12):
    """Kernel (interpret) vs models.qg.rhs on the same random psi/q, incl.
    the fused CFL face maxima and (when nptr > 0) the tracer tendencies."""
    state = m.init_state(cfg, const, seed=1)
    psi = state.psi + 0.1 * jax.random.normal(
        jax.random.PRNGKey(seed), state.psi.shape, state.psi.dtype)
    q = m.comp_q(cfg, const, psi)
    psi_g = ghosted(psi, m._bc_psi(cfg))
    zeta = laplacian_g(psi_g, cfg.delta)
    zeta_g = m._ghost_deriv(cfg, zeta, psi_g)
    tracers = state.tracers
    dq_ref, dtr_ref = m.rhs(cfg, const, q, psi, psi_g, zeta, zeta_g,
                            tracers)
    need_q = cfg.stochastic or cfg.energy_conserv
    dq_k, umax_k = pallas_rhs.rhs_fused(cfg, const, psi,
                                        q if need_q else None,
                                        interpret=True)
    scale = np.abs(np.asarray(dq_ref)).max()
    np.testing.assert_allclose(np.asarray(dq_k), np.asarray(dq_ref),
                               rtol=0, atol=atol * max(scale, 1.0))
    from msom_tpu.ops.ghost import max_face_speed_layers
    umax_ref = max_face_speed_layers(psi_g, cfg.delta)
    np.testing.assert_allclose(np.asarray(umax_k), np.asarray(umax_ref),
                               rtol=1e-13, atol=0)
    if const.rhsk.umax_pp is not None:
        from msom_tpu.ops.ghost import ghosted_from_padded
        upp_ref = max_face_speed_layers(ghosted_from_padded(const.pp_pad),
                                        cfg.delta)
        np.testing.assert_allclose(np.asarray(const.rhsk.umax_pp),
                                   np.asarray(upp_ref), rtol=1e-13, atol=0)
    if tracers is not None:
        dtr_k = pallas_rhs.tracer_fused(cfg, const, psi, tracers,
                                        interpret=True)
        tscale = np.abs(np.asarray(dtr_ref)).max()
        np.testing.assert_allclose(np.asarray(dtr_k), np.asarray(dtr_ref),
                                   rtol=0, atol=atol * max(tscale, 1.0))


def _smooth(rng, shape, N):
    """Smooth random field (superposition of a few low modes + noise)."""
    x = (np.arange(N) + 0.5) / N
    X, Y = np.meshgrid(x, x, indexing="xy")
    out = np.zeros(shape)
    flat = out.reshape(-1, N, N)
    for k in range(flat.shape[0]):
        flat[k] = (np.sin(np.pi * (k % 3 + 1) * Y) * np.cos(np.pi * X)
                   + 0.3 * np.cos(2 * np.pi * X) * np.sin(2 * np.pi * Y))
    return out + 0.05 * rng.standard_normal(shape)


def test_rhs_fused_pg_coupling():
    """J(pp, zeta) + the pp cross terms of the stretching cascade + the
    precomputed pp CFL maxima (/root/reference/msqg/qg.h:287-340)."""
    rng = np.random.default_rng(0)
    cfg = QGConfig(**_base_kw()).validate()
    const = m.build_constants(cfg, psipg=_smooth(rng, (3, 128, 128), 128))
    assert pallas_rhs.applicable(cfg, const)
    _compare_rhs(cfg, const)


def test_rhs_fused_pg_flsrv():
    """_LS_RV: large-scale relative-vorticity advection J(psi, zetap) with
    zetap = lap(pp) recomputed in-kernel (/root/reference/msqg/qg.h:302)."""
    rng = np.random.default_rng(1)
    cfg = QGConfig(**_base_kw(flsrv=1)).validate()
    const = m.build_constants(cfg, psipg=_smooth(rng, (3, 128, 128), 128))
    assert const.zetap_pad is not None
    _compare_rhs(cfg, const)


def test_rhs_fused_topography():
    """Bottom topography J(psi_bot, topo)/(Ro dh) with Neumann topo ghosts
    and the y-profile 1/Ro stream (/root/reference/msqg/qg.h:480-488),
    including a y-varying Rossby number (varRo)."""
    rng = np.random.default_rng(2)
    topo = _smooth(rng, (128, 128), 128)
    for varRo in (0, 1):
        cfg = QGConfig(**_base_kw(varRo=varRo)).validate()
        const = m.build_constants(cfg, topo=topo)
        assert pallas_rhs.applicable(cfg, const)
        _compare_rhs(cfg, const)


def test_rhs_fused_qforc():
    """3-D forcing field addition (/root/reference/msqg/qg.h:465-474)."""
    rng = np.random.default_rng(3)
    cfg = QGConfig(**_base_kw()).validate()
    const = m.build_constants(cfg, qforc=rng.standard_normal((3, 128, 128)))
    _compare_rhs(cfg, const)


def test_rhs_fused_stochastic():
    """Stochastic advection variant: top-layer self-advection dropped, the
    self part of the cascade dropped, -q/tr_stoch damping
    (/root/reference/msqg/qg_stochastic.h:17-111). The noise kick itself
    happens in the advance, outside the kernel."""
    cfg = QGConfig(**_base_kw(stochastic=True, tr_stoch=50.0)).validate()
    const = m.build_constants(cfg)
    assert pallas_rhs.applicable(cfg, const)
    _compare_rhs(cfg, const)
    # with PG coupling on top
    rng = np.random.default_rng(4)
    const_pg = m.build_constants(cfg, psipg=_smooth(rng, (3, 128, 128), 128))
    _compare_rhs(cfg, const_pg)


def test_rhs_fused_energy_conserv():
    """ENERGY_CONSERV advection split (/root/reference/msqg/qg.h:310-340):
    the kernel advects the streamed full PV q."""
    cfg = QGConfig(**_base_kw(energy_conserv=True)).validate()
    const = m.build_constants(cfg)
    assert pallas_rhs.applicable(cfg, const)
    _compare_rhs(cfg, const)


def test_rhs_fused_partial_slip():
    """Partial-slip walls (sbc > 0): the slip ghost law on zeta (edges
    2c*psi, Dirichlet corner fill) and on the biharmonic intermediate
    (/root/reference/msqg/qg.h:185-198), with both Re and Re4 active."""
    cfg = QGConfig(**_base_kw(sbc=1.0, Re=1000)).validate()
    const = m.build_constants(cfg)
    assert pallas_rhs.applicable(cfg, const)
    _compare_rhs(cfg, const)


def test_rhs_fused_tracers():
    """Fused ptr_rhs (/root/reference/msqg/qg.h:573-588): Arakawa advection
    + diffusion /Pe + relaxation, with and without a relaxation target."""
    cfg = QGConfig(**_base_kw(nptr=2, Pe=(1e3, 2e3),
                              ptr_r=(100.0, 0.0))).validate()
    const = m.build_constants(cfg)
    assert const.rhsk.Ttr > 0
    _compare_rhs(cfg, const)
    rng = np.random.default_rng(5)
    const_rx = m.build_constants(
        cfg, ptr_relax=rng.standard_normal((3, 2, 128, 128)))
    _compare_rhs(cfg, const_rx)


def test_rhs_fused_coupled_everything():
    """The coupled 'multiple-scale' configuration all at once: PG coupling
    + _LS_RV + topography + 3-D forcing + 2 tracers + partial slip — the
    configuration class the msqg family exists for
    (/root/reference/msqg/qg.h:287-393, README.org coupling)."""
    rng = np.random.default_rng(6)
    cfg = QGConfig(**_base_kw(flsrv=1, sbc=0.5, Re=2000, nptr=2,
                              Pe=(1e3, 2e3), ptr_r=(100.0, 0.0))).validate()
    const = m.build_constants(
        cfg, psipg=_smooth(rng, (3, 128, 128), 128),
        topo=_smooth(rng, (128, 128), 128),
        qforc=0.01 * rng.standard_normal((3, 128, 128)))
    assert pallas_rhs.applicable(cfg, const)
    _compare_rhs(cfg, const)


def test_step_coupled_with_kernel_matches_xla_path(monkeypatch):
    """Full predictor-corrector steps of the COUPLED config routed through
    the fused kernels (MSOM_PALLAS=interpret) vs the pure-XLA step."""
    rng = np.random.default_rng(7)
    cfg = QGConfig(**_base_kw(N=64, nptr=1, Pe=(1e3,),
                              ptr_r=(100.0,))).validate()
    const = m.build_constants(
        cfg, psipg=_smooth(rng, (3, 64, 64), 64),
        topo=0.1 * _smooth(rng, (64, 64), 64))
    state0 = m.init_state(cfg, const, seed=0)
    step = m.make_step(cfg)
    tnext = jnp.asarray(1e9, state0.t.dtype)

    monkeypatch.setenv("MSOM_PALLAS", "0")
    s_x = state0
    for _ in range(3):
        s_x, _ = step(s_x, const, tnext)
    monkeypatch.setenv("MSOM_PALLAS", "interpret")
    s_p = state0
    for _ in range(3):
        s_p, _ = step(s_p, const, tnext)
    np.testing.assert_allclose(np.asarray(s_p.q), np.asarray(s_x.q),
                               atol=1e-11 * np.abs(np.asarray(s_x.q)).max())
    np.testing.assert_allclose(np.asarray(s_p.tracers),
                               np.asarray(s_x.tracers), atol=1e-11)
    np.testing.assert_allclose(float(s_p.t), float(s_x.t), rtol=1e-12)


def test_step_with_kernel_matches_xla_path(monkeypatch):
    """A full predictor-corrector step routed through the fused kernel
    (MSOM_PALLAS=interpret) must reproduce the pure-XLA step."""
    cfg = QGConfig(N=64, nl=3, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                   Re4=391, beta=0.5, Fr=(0.0023669, 0.0076173),
                   dh=(0.06, 0.14, 0.8), DT=5e-2, tend=500.0, dtout=1.0,
                   CFL=0.6, dtype="float64").validate()
    const = m.build_constants(cfg)
    state0 = m.init_state(cfg, const, seed=0)
    step = m.make_step(cfg)
    tnext = jnp.asarray(1e9, state0.t.dtype)

    monkeypatch.setenv("MSOM_PALLAS", "0")
    s_x = state0
    for _ in range(3):
        s_x, _ = step(s_x, const, tnext)
    monkeypatch.setenv("MSOM_PALLAS", "interpret")
    s_p = state0
    for _ in range(3):
        s_p, _ = step(s_p, const, tnext)
    np.testing.assert_allclose(np.asarray(s_p.q), np.asarray(s_x.q),
                               atol=1e-11)
    np.testing.assert_allclose(float(s_p.t), float(s_x.t), rtol=1e-12)


def test_rhs_fused_periodic():
    """The plain doubly-periodic case (sbc = -1, no PG coupling): wrap
    ghosts via modular halo slabs — uncoupled, stochastic and tracer
    variants, with topography keeping its Neumann pad."""
    rng = np.random.default_rng(9)
    base = _base_kw(sbc=-1.0)

    cfg = QGConfig(**base).validate()
    const = m.build_constants(cfg)
    assert pallas_rhs.applicable(cfg, const)
    _compare_rhs(cfg, const)

    cfg_st = QGConfig(**_base_kw(sbc=-1.0, stochastic=True,
                                 tr_stoch=50.0)).validate()
    const_st = m.build_constants(cfg_st)
    _compare_rhs(cfg_st, const_st)

    cfg_tr = QGConfig(**_base_kw(sbc=-1.0, nptr=2, Pe=(1e3, 2e3),
                                 ptr_r=(100.0, 0.0))).validate()
    const_tr = m.build_constants(cfg_tr,
                                 topo=_smooth(rng, (128, 128), 128))
    assert const_tr.rhsk.Ttr > 0
    _compare_rhs(cfg_tr, const_tr)

    # periodic + PG coupling is covered too since r5 (pre-tiled padded
    # pp views; test_rhs_fused_periodic_coupled exercises it)
    cfg_pg = QGConfig(**_base_kw(sbc=-1.0, upg=(0.1, 0.0, 0.0))).validate()
    const_pg = m.build_constants(cfg_pg)
    assert pallas_rhs.applicable(cfg_pg, const_pg)
    assert const_pg.rhsk.pp_t is not None


def test_rhs_fused_periodic_coupled():
    """Doubly-periodic WITH large-scale coupling (the _LS_RV periodic-
    channel class, msqg/qg.h:5,1105-1114; VERDICT r5 #9): pp/zetap stream
    as pre-tiled padded views with the custom non-wrap ghost law baked in
    at build; topography + 3-D forcing ride along."""
    rng = np.random.default_rng(9)
    N = 128
    cfg = QGConfig(**_base_kw(
        sbc=-1.0, flsrv=1, Re=500.0,
        upg=(0.02, 0.01, 0.0), vpg=(0.01, -0.005, 0.0))).validate()
    tp = 0.05 * np.sin(np.linspace(0, 2 * np.pi, N))[:, None] \
        * np.ones((N, N))
    qf = 1e-4 * rng.standard_normal((cfg.nl, N, N))
    const = m.build_constants(cfg, topo=tp, qforc=qf)
    assert const.rhsk is not None and const.rhsk.pp_t is not None
    assert const.rhsk.zetap_t is not None
    _compare_rhs(cfg, const)


def test_rhs_fused_periodic_coupled_ec():
    """Periodic + pp + ENERGY_CONSERV advection through the kernel."""
    cfg = QGConfig(**_base_kw(
        sbc=-1.0, energy_conserv=True,
        upg=(0.02, 0.0, 0.0), vpg=(0.0, -0.005, 0.0))).validate()
    const = m.build_constants(cfg)
    assert const.rhsk is not None and const.rhsk.pp_t is not None
    _compare_rhs(cfg, const)
