"""Tests for the direct spectral PV inversion (solvers/spectral.py).

Validates the DST-II construction against the explicit sine matrix, checks
that the transform diagonalizes the model's discrete Dirichlet Laplacian,
verifies the layered solve leaves machine-precision residuals in the SAME
discrete system the multigrid solves, and checks trajectory equivalence of
solver="spectral" vs solver="mg" on the msqg model.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from msom_tpu.ops.bc import BC
from msom_tpu.ops.ghost import ghosted, laplacian_g
from msom_tpu.ops.stretch import layer_metrics, stretch
from msom_tpu.solvers import spectral as sp


def test_dst2_matches_sine_matrix():
    N = 16
    rng = np.random.default_rng(0)
    x = rng.standard_normal(N)
    out = np.asarray(sp.dst2(jnp.asarray(x), -1))
    k = np.arange(1, N + 1)
    i = np.arange(N)
    M = np.sin(np.pi * np.outer(k, i + 0.5) / N)
    ref = M @ x
    # per-mode normalization differs (ortho DCT scaling); direction must match
    ratio = out / ref
    assert np.allclose(ratio[:-1], ratio[0])          # uniform for k<N
    assert np.allclose(np.asarray(sp.idst2(sp.dst2(jnp.asarray(x), -1), -1)),
                       x, atol=1e-12)


def test_dst2_diagonalizes_dirichlet_laplacian():
    N, L0 = 32, 2.0
    h = L0 / N
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((1, N, N)))
    lap = laplacian_g(ghosted(a, BC.DIRICHLET), h)
    A = sp.dst2(sp.dst2(a, -1), -2)
    LapA = sp.dst2(sp.dst2(lap, -1), -2)
    k = np.arange(1, N + 1)
    lam = -(4.0 / h ** 2) * np.sin(np.pi * k / (2 * N)) ** 2
    expect = (lam[None, :, None] + lam[None, None, :]) * np.asarray(A)
    assert np.allclose(np.asarray(LapA), expect, atol=1e-9 / h ** 2)


@pytest.mark.parametrize("bc", [BC.DIRICHLET, BC.PERIODIC])
@pytest.mark.parametrize("nl", [1, 3])
def test_solve_layered_exact(bc, nl):
    N, L0 = 32, 3.0
    h = L0 / N
    dh = np.array([0.2, 0.3, 0.5])[:nl] if nl > 1 else np.array([1.0])
    dh = dh / dh.sum()
    s_profile = np.array([12.0, 30.0])[:nl - 1] if nl > 1 else None
    _, idh0, idh1 = layer_metrics(dh)
    data = sp.build_spectral(nl=nl, N=N, L0=L0, dh=dh, s_profile=s_profile,
                             periodic=(bc is BC.PERIODIC), dtype=jnp.float64)
    rng = np.random.default_rng(2)
    # manufacture q = L(psi_true) so q is in the operator's range
    psi_true = jnp.asarray(rng.standard_normal((nl, N, N)))
    q = laplacian_g(ghosted(psi_true, bc), h)
    if nl > 1:
        strl = jnp.asarray(np.broadcast_to(
            s_profile[:, None, None], (nl - 1, N, N)))
        q = q + stretch(psi_true, strl, idh0, idh1)
    psi = sp.solve_spectral(data, q)
    # residual of the solve in the SAME discrete operator
    res = laplacian_g(ghosted(psi, bc), h)
    if nl > 1:
        res = res + stretch(psi, strl, idh0, idh1)
    assert np.allclose(np.asarray(res), np.asarray(q), atol=1e-8 / h ** 2)
    # solution matches up to the operator's null space (periodic: uniform
    # barotropic shift)
    p, pt = np.asarray(psi), np.asarray(psi_true)
    if bc is BC.PERIODIC:
        p, pt = p - p.mean(), pt - pt.mean()
    assert np.allclose(p, pt, atol=1e-9)


def test_spectral_agrees_with_multigrid():
    from msom_tpu.solvers import mg
    N, L0, nl = 32, 3.0, 3
    dh = np.array([0.2, 0.3, 0.5])
    s_profile = np.array([12.0, 30.0])
    _, idh0, idh1 = layer_metrics(dh)
    strl = jnp.asarray(np.broadcast_to(s_profile[:, None, None],
                                       (nl - 1, N, N)))
    rng = np.random.default_rng(3)
    psi_true = jnp.asarray(rng.standard_normal((nl, N, N)))
    q = laplacian_g(ghosted(psi_true, BC.DIRICHLET), L0 / N) \
        + stretch(psi_true, strl, idh0, idh1)
    data = sp.build_spectral(nl=nl, N=N, L0=L0, dh=dh, s_profile=s_profile,
                             periodic=False, dtype=jnp.float64)
    p_spec = sp.solve_spectral(data, q)
    p_mg, st = mg.solve_layered(jnp.zeros_like(q), q, L0=L0, s=strl,
                                idh0=idh0, idh1=idh1, bc=BC.DIRICHLET,
                                tolerance=1e-10)
    assert np.allclose(np.asarray(p_spec), np.asarray(p_mg), atol=1e-7)


@pytest.mark.parametrize("sbc", [0.0, -1.0])
def test_model_trajectory_spectral_vs_mg(sbc):
    from msom_tpu.models import qg as m
    from msom_tpu.params import QGConfig

    base = dict(N=32, nl=3, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                Re4=1563, beta=0.5, Fr=(0.0023669, 0.0076173),
                dh=(0.06, 0.14, 0.8), DT=5e-2, tend=500.0, dtout=1.0,
                CFL=0.6, sbc=sbc, dtype="float64")
    traj = {}
    for solver, tol in (("mg", 1e-11), ("spectral", 1e-3)):
        cfg = QGConfig(solver=solver, tol=tol, **base).validate()
        const = m.build_constants(cfg)
        state = m.init_state(cfg, const, seed=0)
        step = m.make_step(cfg)
        for _ in range(10):
            state, diag = step(state, const, jnp.asarray(1e18, state.t.dtype))
        traj[solver] = (np.asarray(state.q), np.asarray(state.psi),
                        float(diag.ke))
    assert np.allclose(traj["mg"][0], traj["spectral"][0], rtol=1e-6,
                       atol=1e-9)
    assert np.allclose(traj["mg"][2], traj["spectral"][2], rtol=1e-6)


def test_newqg_spectral_vs_mg():
    import dataclasses
    from msom_tpu.models import newqg as nm

    base = nm.NewQGConfig(N=32, nl=2, L0=1.0, f0=10.0, beta=2.0, hEkb=1e-3,
                          tau0=1e-3, nu=1e-5, gp_low=0.1, dh=(0.5, 0.5),
                          DT=1e-2, CFL=0.5, TOLERANCE=1e-12, dtype="float64")
    traj = {}
    for solver in ("mg", "spectral"):
        cfg = dataclasses.replace(base, solver=solver)
        _, lam = nm.build_levels(cfg)
        state = nm.init_state(cfg, lam, seed=1)
        step = nm.make_step(cfg)
        for _ in range(10):
            state, diag = step(state, jnp.asarray(1e18, state.t.dtype))
        traj[solver] = np.asarray(state.q)
    assert np.allclose(traj["mg"], traj["spectral"], rtol=1e-7, atol=1e-12)


def test_spectral_varying_stratification_exact():
    """varRo (y-varying strl): solver='spectral' now takes the FACR-style
    DST-in-x + block-Thomas-in-y direct solve (solvers/vary.py, VERDICT r5
    #4). The solve must satisfy lap(psi) + Gamma(psi) = q to roundoff —
    tighter than the mg path it unchains these configs from."""
    from msom_tpu.models import qg as m
    from msom_tpu.ops.bc import BC
    from msom_tpu.ops.ghost import ghosted, laplacian_g
    from msom_tpu.ops.stretch import stretch
    from msom_tpu.params import QGConfig
    from msom_tpu.solvers import vary as vary_mod

    cfg = QGConfig(N=32, nl=3, L0=80, Rom=0.025, beta=0.5, varRo=1,
                   Fr=(0.003, 0.005), dh=(0.2, 0.3, 0.5),
                   solver="spectral", dtype="float64").validate()
    const = m.build_constants(cfg)
    assert isinstance(const.spec, vary_mod.VarySpectralData)
    # strl really varies in y (else the test is vacuous)
    s = np.asarray(const.strl)
    assert not np.allclose(s, s[:, :1, :])

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((cfg.nl, cfg.N, cfg.N)))
    psi, st = m.invert_q(cfg, const, jnp.zeros_like(q), q)
    lhs = laplacian_g(ghosted(psi, BC.DIRICHLET), cfg.delta) \
        + stretch(psi, const.strl, const.idh0, const.idh1)
    rel = float(jnp.abs(lhs - q).max() / jnp.abs(q).max())
    assert rel < 1e-11, rel

    # every sweep implementation reproduces the sequential Thomas sweeps
    psi_scan = vary_mod.solve_spectral_vary(const.spec, q, method="scan")
    for meth in ("assoc", "blocked"):
        psi_m = vary_mod.solve_spectral_vary(const.spec, q, method=meth)
        assert float(jnp.abs(psi_m - psi_scan).max()) < 1e-13, meth

    # x-varying stretching still has no direct solve
    from msom_tpu.params import QGConfig as _QC
    cfgx = _QC(N=16, nl=2, L0=80, Rom=0.025, Fr=(0.003,), dh=(0.5, 0.5),
               solver="spectral", dtype="float64").validate()
    frx = 0.003 * (1.0 + 0.1 * np.random.default_rng(0)
                   .standard_normal((1, 16, 16)))
    with pytest.raises(ValueError, match="spectral"):
        m.build_constants(cfgx, frpg=frx)


def test_spectral_vary_trajectory_matches_mg():
    """varRo full-step trajectory: spectral(vary) vs mg over 10 steps."""
    import dataclasses as dc

    import jax

    from msom_tpu.models import qg as m
    from msom_tpu.params import QGConfig

    base = QGConfig(N=32, nl=3, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                    Re4=1563, beta=0.5, varRo=1,
                    Fr=(0.0023669, 0.0076173), dh=(0.06, 0.14, 0.8),
                    DT=5e-2, tend=1.0, dtout=1.0, CFL=0.6, tol=1e-9,
                    dtype="float64")
    traj = {}
    for solver in ("mg", "spectral"):
        cfg = dc.replace(base, solver=solver).validate()
        const = m.build_constants(cfg)
        state = m.init_state(cfg, const, seed=0)
        step = jax.jit(m.make_step(cfg))
        for _ in range(10):
            state, diag = step(state, const, jnp.asarray(1e18,
                                                         state.t.dtype))
        traj[solver] = np.asarray(state.q)
    assert np.allclose(traj["mg"], traj["spectral"], rtol=1e-6, atol=1e-10)


def test_matmul_transform_matches_fft():
    """The MXU matmul-DST path (SpectralData.S) and the FFT lowering share
    inv_den and must agree: f64 to roundoff, f32 to MXU-HIGH precision."""
    from msom_tpu.solvers import spectral as sp

    N, nl = 64, 3
    rng = np.random.default_rng(1)
    q = rng.standard_normal((nl, N, N))
    kw = dict(nl=nl, N=N, L0=80.0, dh=[0.06, 0.14, 0.8],
              s_profile=[(0.0023669 / 0.025) ** 2, (0.0076173 / 0.025) ** 2],
              periodic=False)
    for dtype, tol in ((jnp.float64, 1e-13), (jnp.float32, 5e-6)):
        d_fft = sp.build_spectral(**kw, dtype=dtype, transform="fft")
        d_mm = sp.build_spectral(**kw, dtype=dtype, transform="matmul")
        assert d_fft.S is None and d_mm.S is not None
        qj = jnp.asarray(q, dtype)
        p1 = np.asarray(sp.solve_spectral(d_fft, qj), np.float64)
        p2 = np.asarray(sp.solve_spectral(d_mm, qj), np.float64)
        assert np.max(np.abs(p1 - p2)) <= tol * np.max(np.abs(p1))


def test_transform_auto_selection():
    from msom_tpu.solvers import spectral as sp
    kw = dict(nl=1, N=32, L0=1.0, periodic=False)
    assert sp.build_spectral(**kw, dtype=jnp.float32).S is not None
    assert sp.build_spectral(**kw, dtype=jnp.float64).S is None  # f64 -> fft
    per = sp.build_spectral(nl=1, N=32, L0=1.0, periodic=True,
                            dtype=jnp.float32)
    assert per.S is None  # periodic auto keeps the rfft2 basis
    # force_matmul (the sharded path) builds a basis for either BC/dtype
    assert sp.build_spectral(**kw, dtype=jnp.float64,
                             force_matmul=True).S is not None
    assert sp.build_spectral(nl=1, N=32, L0=1.0, periodic=True,
                             dtype=jnp.float64, force_matmul=True).S is not None


def test_periodic_matmul_basis_matches_rfft():
    """The real cos/sin eigenbasis (fourier_matrix) and the rfft2 lowering
    share the same inverse operator: solves must agree to roundoff."""
    N, nl = 32, 3
    kw = dict(nl=nl, N=N, L0=3.0, dh=[0.2, 0.3, 0.5],
              s_profile=[12.0, 30.0], periodic=True, dtype=jnp.float64)
    d_fft = sp.build_spectral(**kw)
    d_mm = sp.build_spectral(**kw, force_matmul=True)
    assert d_fft.S is None and d_mm.S is not None
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((nl, N, N)))
    p1 = np.asarray(sp.solve_spectral(d_fft, q))
    p2 = np.asarray(sp.solve_spectral(d_mm, q))
    np.testing.assert_allclose(p1, p2, atol=1e-12)


@pytest.mark.parametrize("periodic", [False, True])
def test_refine_pass_accuracy(periodic):
    """bf16+refinement mode: one DEFAULT-precision solve + one f32
    refinement must solve the same discrete system. On CPU DEFAULT f32 is
    true f32 so this checks the refinement ALGEBRA (residual/correction in
    modal space under both BCs); the bf16 error budget is measured on TPU
    (PERF.md)."""
    import dataclasses
    N, nl, L0 = 32, 3, 3.0
    from msom_tpu.ops.stretch import layer_metrics, stretch as stretch_op
    dh = np.array([0.2, 0.3, 0.5])
    s_profile = np.array([12.0, 30.0])
    _, idh0, idh1 = layer_metrics(dh)
    bc = BC.PERIODIC if periodic else BC.DIRICHLET
    data = sp.build_spectral(nl=nl, N=N, L0=L0, dh=dh, s_profile=s_profile,
                             periodic=periodic, dtype=jnp.float64,
                             force_matmul=True, refine=True)
    assert data.refine
    rng = np.random.default_rng(11)
    psi_true = jnp.asarray(rng.standard_normal((nl, N, N)))
    h = L0 / N
    strl = jnp.asarray(np.broadcast_to(s_profile[:, None, None],
                                       (nl - 1, N, N)))
    q = laplacian_g(ghosted(psi_true, bc), h) \
        + stretch_op(psi_true, strl, idh0, idh1)
    psi = np.asarray(sp.solve_spectral(data, q))
    pt = np.asarray(psi_true)
    if periodic:
        psi, pt = psi - psi.mean(), pt - pt.mean()
    np.testing.assert_allclose(psi, pt, atol=1e-9)
    # refine=False result agrees (same operator, f64)
    d0 = dataclasses.replace(data, refine=False)
    psi0 = np.asarray(sp.solve_spectral(d0, q))
    if periodic:
        psi0 = psi0 - psi0.mean()
    np.testing.assert_allclose(psi, psi0, atol=1e-9)


def test_pallas_fused_mm_solve_matches_xla():
    """The fused Pallas spectral kernel (solvers/pallas_spectral.py,
    interpret mode on CPU) reproduces the XLA _mm_solve chain and solves
    the discrete system (residual at f32 roundoff x conditioning)."""
    import jax

    from msom_tpu.solvers import pallas_spectral

    N, nl, L0 = 128, 3, 80.0
    dh = np.full(nl, 1.0 / nl)
    sprof = np.full(nl - 1, (0.003 / 0.025) ** 2)
    data = sp.build_spectral(nl=nl, N=N, L0=L0, dh=dh, s_profile=sprof,
                             periodic=False, dtype=jnp.float32,
                             transform="matmul", refine=False)
    rng = np.random.default_rng(2)
    qm = jnp.asarray(rng.standard_normal((nl, N, N)), jnp.float32)

    want = sp._mm_solve(data, qm, jax.lax.Precision.HIGH)
    got = pallas_spectral.fused_mm_solve(np.asarray(data.S),
                                         np.asarray(data.inv_den), qm,
                                         interpret=True)
    scale = float(jnp.max(jnp.abs(want)))
    # on CPU the XLA reference is exact f32 (precision flags are no-ops)
    # while the kernel spells out the 3-pass bf16 decomposition Mosaic
    # needs, so the diff IS the HIGH-precision error class (~1e-5 rel at
    # N=128; on TPU both paths share it)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-4 * scale

    # and through the public solve with the kernel forced on
    import os
    os.environ["MSOM_PALLAS"] = "interpret"
    try:
        psi_k = sp.solve_spectral(data, qm)
    finally:
        os.environ.pop("MSOM_PALLAS")
    psi_x = sp.solve_spectral(data, qm)
    scale = float(jnp.max(jnp.abs(psi_x)))
    assert float(jnp.max(jnp.abs(psi_k - psi_x))) < 1e-4 * scale


def test_factored_dst_matches_matrix():
    """ctdst folded DST vs the explicit orthonormal DST matrix (with the
    build-time output permutation applied), both axes, forward and inverse
    (adjoint) — machine precision, at every level count."""
    from msom_tpu.solvers import ctdst
    from msom_tpu.solvers.spectral import dst_matrix

    for N, L in ((64, 1), (128, 2), (256, 3), (1024, None)):
        f, perm = ctdst.build_fold(N, jnp.float64, L)
        S = np.asarray(dst_matrix(N))
        rng = np.random.default_rng(N)
        x = jnp.asarray(rng.standard_normal((3, 4, N)))
        y_ref = np.einsum("ki,lyi->lyk", S, np.asarray(x))[..., perm]
        np.testing.assert_allclose(np.asarray(ctdst.fdst_x(f, x)), y_ref,
                                   atol=1e-11)
        np.testing.assert_allclose(
            np.asarray(ctdst.ifdst_x(f, jnp.asarray(y_ref))),
            np.asarray(x), atol=1e-11)
        xy = jnp.asarray(rng.standard_normal((3, N, 4)))
        y_ref2 = np.einsum("kj,ljx->lkx", S, np.asarray(xy))[..., perm, :]
        np.testing.assert_allclose(np.asarray(ctdst.fdst_y(f, xy)), y_ref2,
                                   atol=1e-11)
        np.testing.assert_allclose(
            np.asarray(ctdst.ifdst_y(f, jnp.asarray(y_ref2))),
            np.asarray(xy), atol=1e-11)


def test_factored_solve_matches_matmul_solve():
    """solve_spectral with transform='factored' vs 'matmul' (same discrete
    system, same inv_den ordering) at machine precision in f64."""
    from msom_tpu.solvers import spectral as sp

    N, nl, L0 = 128, 3, 80.0
    dh = np.array([0.2, 0.3, 0.5])
    sprof = np.array([0.3, 0.4])
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((nl, N, N)))
    d_mm = sp.build_spectral(nl=nl, N=N, L0=L0, dh=dh, s_profile=sprof,
                             periodic=False, dtype=jnp.float64,
                             transform="matmul")
    d_fc = sp.build_spectral(nl=nl, N=N, L0=L0, dh=dh, s_profile=sprof,
                             periodic=False, dtype=jnp.float64,
                             transform="factored")
    p_mm = np.asarray(sp.solve_spectral(d_mm, q))
    p_fc = np.asarray(sp.solve_spectral(d_fc, q))
    np.testing.assert_allclose(p_fc, p_mm, rtol=0,
                               atol=1e-11 * np.abs(p_mm).max())


def test_folded_dst1_matches_matrix():
    """ctdst folded DST-I (odd lengths N-1, middle-column handling) vs the
    explicit orthonormal DST-I matrix, both axes, forward and adjoint."""
    from msom_tpu.solvers import ctdst
    from msom_tpu.solvers.spectral import dst1_matrix

    for N, L in ((64, 2), (128, 3), (512, None)):
        f, perm = ctdst.build_fold1(N, jnp.float64, L)
        S = np.asarray(dst1_matrix(N))
        rng = np.random.default_rng(N)
        x = jnp.asarray(rng.standard_normal((3, 4, N - 1)))
        y_ref = np.einsum("ki,lyi->lyk", S, np.asarray(x))[..., perm]
        np.testing.assert_allclose(np.asarray(ctdst.fdst1_x(f, x)), y_ref,
                                   atol=1e-11)
        np.testing.assert_allclose(
            np.asarray(ctdst.ifdst1_x(f, jnp.asarray(y_ref))),
            np.asarray(x), atol=1e-11)
        xy = jnp.asarray(rng.standard_normal((3, N - 1, 4)))
        y2 = np.einsum("kj,ljx->lkx", S, np.asarray(xy))[..., perm, :]
        np.testing.assert_allclose(np.asarray(ctdst.fdst1_y(f, xy)), y2,
                                   atol=1e-11)
        np.testing.assert_allclose(
            np.asarray(ctdst.ifdst1_y(f, jnp.asarray(y2))),
            np.asarray(xy), atol=1e-11)
