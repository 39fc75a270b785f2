"""Kernel-keeping rows-sharded step (parallel/step.py v3) on the virtual
8-device CPU mesh: the distributed mode that keeps the fused Pallas RHS /
tracer kernels (rows layout, interpret mode here) and the folded-DST
spectral inversion (pencil decomposition). Pins:

* the rows-mode kernel is BITWISE identical to the unsharded kernel
  (same kernel, global-row-keyed wall rules, halo slabs fed externally);
* the full rows step is BITWISE shard-invariant (1-device vs 8-device
  rows mesh — every collective is layout-moving only);
* the rows step matches the unsharded kernel step to machine precision
  (the only difference is the pencil transform's axis order);
* pencil spectral solve == unsharded spectral solve (both BCs).

The reference's distributed hot loop IS its fast loop
(/root/reference/msqg/qg.c:13-14 mpirun); these tests pin the same
property for the TPU-native rebuild.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from msom_tpu.models import qg as m, pallas_rhs
from msom_tpu.params import QGConfig
from msom_tpu.parallel.step import make_qg_step_sharded


def rows_mesh(n):
    assert jax.device_count() >= n
    return Mesh(np.array(jax.devices()[:n]).reshape(n, 1), ("y", "x"))


N, NL = 64, 3
_yy = np.linspace(0.0, 80.0, N)
_PP = 1e-3 * np.stack([np.sin(np.pi * _yy / 80.0)[None, :]
                       * np.ones((N, N)) for _ in range(NL)])
_TOPO = 0.05 * np.outer(np.sin(np.pi * _yy / 80.0),
                        np.sin(2 * np.pi * _yy / 80.0))


def coupled_cfg(**kw):
    base = dict(N=N, nl=NL, L0=80, Rom=0.025, Ekb=0.002, Eks=1e-3,
                tau0=1e-4, Re=500.0, Re4=1563, beta=0.5, sbc=0.0,
                Fr=(0.0023669, 0.0076173), dh=(0.06, 0.14, 0.8),
                DT=5e-2, tend=1.0, dtout=1.0, CFL=0.6, flsrv=1,
                solver="spectral", dtype="float64")
    base.update(kw)
    return QGConfig(**base).validate()


@pytest.mark.parametrize("sbc", [0.0, 2.0])
def test_rows_kernel_bitwise_vs_unsharded(sbc):
    """rows-mode rhs_fused (manual per-shard slicing, as shard_map hands
    it) is bitwise identical to the unsharded kernel, coupled config."""
    ndev = 2   # n_loc = 32 keeps T identical to the unsharded pick
    n_loc = N // ndev
    cfg = coupled_cfg(sbc=sbc)
    qf = 1e-4 * np.random.default_rng(3).standard_normal((NL, N, N))
    const = m.build_constants(cfg, psipg=_PP, topo=_TOPO, qforc=qf)
    s_np = np.asarray(const.strl)
    kw = dict(Ro=np.asarray(const.Ro), pp_pad=const.pp_pad,
              topo_pad=const.topo_pad, has_qforc=True)
    kd0 = pallas_rhs.build_kernel_data(cfg, np.asarray(const.wind),
                                       s_np[..., 0], **kw)
    kdr = pallas_rhs.build_kernel_data(cfg, np.asarray(const.wind),
                                       s_np[..., 0], rows=ndev, **kw)
    assert kd0 is not None and kdr is not None and kd0.T == kdr.T

    psi = jnp.asarray(np.random.default_rng(0).standard_normal((NL, N, N)))
    const0 = dataclasses.replace(const, rhsk=kd0)
    dq_ref, umax_ref = pallas_rhs.rhs_fused(cfg, const0, psi,
                                            interpret=True)

    T = kdr.T
    ntl = n_loc // T
    pad8 = jnp.zeros((NL, 8, N), psi.dtype)
    psi_pad = jnp.concatenate([pad8, psi, pad8], axis=1)
    E = n_loc + 16
    dqs, ums = [], []
    for d in range(ndev):
        kd_loc = dataclasses.replace(
            kdr, strl=kdr.strl[d * ntl:(d + 1) * ntl],
            wind=kdr.wind[d * ntl:(d + 1) * ntl],
            iro=kdr.iro[d * ntl:(d + 1) * ntl],
            pp=kdr.pp[:, d * n_loc:(d + 1) * n_loc],
            topo=kdr.topo[:, d * n_loc:(d + 1) * n_loc],
            pp_ext=kdr.pp_ext[:, d * E:(d + 1) * E],
            topo_ext=kdr.topo_ext[:, d * E:(d + 1) * E])
        const_loc = dataclasses.replace(
            const, rhsk=kd_loc,
            qforc=const.qforc[:, d * n_loc:(d + 1) * n_loc])
        dq_d, um_d = pallas_rhs.rhs_fused(
            cfg, const_loc, psi[:, d * n_loc:(d + 1) * n_loc],
            interpret=True,
            psi_ext=psi_pad[:, d * n_loc:d * n_loc + E],
            row0=d * n_loc)
        dqs.append(dq_d)
        ums.append(um_d)
    dq_rows = jnp.concatenate(dqs, axis=1)
    umax_rows = jnp.max(jnp.stack(ums), axis=0)
    assert bool(jnp.all(dq_rows == dq_ref))
    assert bool(jnp.all(umax_rows == umax_ref))


def _run_steps(step, place, state0, const, n=4):
    sp, cp = place(state0), place(const)
    dp = None
    for _ in range(n):
        sp, dp = step(sp, cp, jnp.asarray(1e9, jnp.float64))
    return sp, dp


def test_rows_step_shard_invariance_and_matches_single(monkeypatch):
    """Coupled config with tracers: rows step is bitwise 1-dev vs 8-dev
    and matches the unsharded fused-kernel step to ~1e-13."""
    cfg = coupled_cfg(nptr=1, Pe=(1e3,), ptr_r=(100.0,))
    const = m.build_constants(cfg, psipg=_PP, topo=_TOPO)
    state0 = m.init_state(cfg, const, seed=0)

    monkeypatch.setenv("MSOM_PALLAS", "interpret")
    step_ref = jax.jit(m.make_step(cfg))
    s = state0
    for _ in range(4):
        s, d = step_ref(s, const, jnp.asarray(1e9, jnp.float64))

    out = {}
    for ndev in (1, 8):
        mesh = rows_mesh(ndev)
        step_sh, place = make_qg_step_sharded(cfg, mesh, state0, const)
        assert step_sh.uses_kernels and step_sh.uses_pencil
        sp, dp = _run_steps(step_sh, place, state0, const)
        out[ndev] = (np.asarray(sp.q), np.asarray(sp.tracers),
                     np.asarray(sp.psi), float(dp.ke), float(dp.dt))
    q1, tr1, psi1, ke1, dt1 = out[1]
    q8, tr8, psi8, ke8, dt8 = out[8]
    assert (q1 == q8).all() and (tr1 == tr8).all() and (psi1 == psi8).all()
    assert dt1 == dt8
    # KE is a psum of per-device partials: association differs with the
    # device count, so the diagnostic (and only it) is 1-ulp, not bitwise
    np.testing.assert_allclose(ke1, ke8, rtol=1e-12)
    scale = np.abs(np.asarray(s.q)).max()
    assert np.abs(q8 - np.asarray(s.q)).max() / scale < 1e-12
    np.testing.assert_allclose(ke8, float(d.ke), rtol=1e-12)


def test_rows_step_periodic_plain(monkeypatch):
    """Plain doubly-periodic case (kernel-covered): rows step vs the
    unsharded kernel step; halo slabs wrap through ppermute."""
    cfg = coupled_cfg(sbc=-1, flsrv=0, Eks=0.0)
    const = m.build_constants(cfg)
    state0 = m.init_state(cfg, const, seed=1)

    monkeypatch.setenv("MSOM_PALLAS", "interpret")
    step_ref = jax.jit(m.make_step(cfg))
    s = state0
    for _ in range(4):
        s, d = step_ref(s, const, jnp.asarray(1e9, jnp.float64))

    mesh = rows_mesh(8)
    step_sh, place = make_qg_step_sharded(cfg, mesh, state0, const)
    assert step_sh.uses_kernels
    sp, dp = _run_steps(step_sh, place, state0, const)
    scale = np.abs(np.asarray(s.q)).max()
    assert np.abs(np.asarray(sp.q) - np.asarray(s.q)).max() / scale < 1e-12


def test_rows_step_mg_solver(monkeypatch):
    """solver='mg' on the rows mesh: the sharded multigrid inversion with
    the fused RHS kernel — matches the unsharded mg+kernel step within the
    mg tolerance class."""
    cfg = coupled_cfg(solver="mg")
    const = m.build_constants(cfg, psipg=_PP)
    state0 = m.init_state(cfg, const, seed=0)

    monkeypatch.setenv("MSOM_PALLAS", "interpret")
    step_ref = jax.jit(m.make_step(cfg))
    s = state0
    for _ in range(3):
        s, d = step_ref(s, const, jnp.asarray(1e9, jnp.float64))

    mesh = rows_mesh(8)
    step_sh, place = make_qg_step_sharded(cfg, mesh, state0, const)
    assert step_sh.uses_kernels and not step_sh.uses_pencil
    sp, dp = _run_steps(step_sh, place, state0, const, n=3)
    scale = np.abs(np.asarray(s.q)).max()
    # mg iterates to tol=1e-3 class; sharded and single mg share the same
    # Jacobi-class sweeps but the Pallas vs XLA relax orderings differ at
    # roundoff, amplified over V-cycles
    assert np.abs(np.asarray(sp.q) - np.asarray(s.q)).max() / scale < 1e-8


def test_run_qg_rows_matches_single(tmp_path, monkeypatch):
    """Driver-level kernel-keeping sharded entry: run_qg(sharded='rows')
    on the 8-device rows mesh reproduces the single-device outputs —
    wavelet-filter event, energy accumulation and OutputWriter gather
    included — and reports sharded_mode == 'rows'."""
    from msom_tpu import driver
    from msom_tpu.io.bas import read_bas

    monkeypatch.setenv("MSOM_PALLAS", "interpret")
    cfg = coupled_cfg(tend=0.6, dtout=0.3, dtflt=0.2, ediag=0)

    outs = {}
    for mode in ("single", "rows"):
        d = tmp_path / mode
        const = m.build_constants(cfg, psipg=_PP, topo=_TOPO)
        state = m.init_state(cfg, const, seed=0)
        hooks = driver.RunHooks()
        hooks.on_output = driver.OutputWriter(cfg, const, outdir=str(d))
        driver.run_qg(cfg, const=const, state=state, hooks=hooks,
                      sharded="rows" if mode == "rows" else False)
        if mode == "rows":
            assert driver.run_qg.sharded_mode == "rows"
        outs[mode] = d

    import os
    names = sorted(os.listdir(outs["single"]))
    assert any(n.startswith("po") for n in names)
    assert any(n.startswith("pf") for n in names)       # filter event ran
    assert any(n.startswith("de_j1") for n in names)    # energy event ran
    for n in names:
        if not n.endswith(".bas"):
            continue
        a, _, _ = read_bas(str(outs["single"] / n))
        b, _, _ = read_bas(str(outs["rows"] / n))
        np.testing.assert_allclose(
            b, a, rtol=0, atol=5e-7 * max(np.abs(a).max(), 1e-30),
            err_msg=n)


def test_run_qg_auto_falls_back_to_gspmd():
    """sharded='auto' with a config the rows kernels cannot cover (N not
    tiling the mesh rows) silently takes the GSPMD path with stripped
    kernel data."""
    from msom_tpu import driver

    # N=32 on 8 devices: 32/8 = 4 local rows < the 8-row kernel slab, so
    # the rows path cannot engage and auto must fall back
    cfg = coupled_cfg(solver="mg", N=32)
    const = m.build_constants(cfg)
    state = m.init_state(cfg, const, seed=0)
    driver.run_qg(cfg, const=const, state=state, max_steps=2,
                  sharded="auto")
    assert driver.run_qg.sharded_mode == "gspmd"


@pytest.mark.parametrize("periodic", [False, True])
@pytest.mark.parametrize("nl", [1, 3])
def test_pencil_solve_matches_single(periodic, nl):
    """solve_spectral_pencil on the 8-device rows mesh == unsharded
    solve_spectral (machine precision; only the transform axis order
    differs)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from msom_tpu.parallel import spectral_shard
    from msom_tpu.solvers import spectral

    mesh = rows_mesh(8)
    kw = dict(nl=nl, N=N, L0=80.0, periodic=periodic, dtype=jnp.float64)
    if nl > 1:
        kw.update(dh=np.array([0.06, 0.14, 0.8]),
                  s_profile=np.array([8.96, 0.97]))
    sd = spectral.build_spectral(transform="matmul", **kw)
    q = jnp.asarray(np.random.default_rng(2).standard_normal((nl, N, N)))
    psi_ref = spectral.solve_spectral(sd, q)

    sp_specs = spectral_shard.pencil_specs(sd, 8)
    f = shard_map(spectral_shard.solve_spectral_pencil, mesh=mesh,
                  in_specs=(sp_specs, P(None, "y", None)),
                  out_specs=P(None, "y", None), check_vma=False)
    psi_sh = f(sd, q)
    scale = float(jnp.abs(psi_ref).max())
    assert float(jnp.abs(psi_sh - psi_ref).max()) / scale < 1e-13


def test_run_qg_auto_varro_routes_gspmd():
    """varRo + spectral has no pencil decomposition: auto must route to
    GSPMD and the block-Thomas vary solve must execute partitioned on the
    8-device mesh (finite state, a few steps)."""
    from msom_tpu import driver

    cfg = coupled_cfg(varRo=1, flsrv=0)
    const = m.build_constants(cfg)
    state = m.init_state(cfg, const, seed=0)
    s = driver.run_qg(cfg, const=const, state=state, max_steps=3,
                      sharded="auto")
    assert driver.run_qg.sharded_mode == "gspmd"
    assert np.isfinite(np.asarray(s.q)).all()


def test_rows_step_stochastic_runs():
    """Stochastic rows path (per-device noise streams differ from the
    unsharded draw by design): kernels engage, state stays finite."""
    cfg = coupled_cfg(stochastic=True, tr_stoch=50.0, amp_stoch=1e-6,
                      flsrv=0)
    const = m.build_constants(cfg, psipg=_PP)
    state0 = m.init_state(cfg, const, seed=0)
    mesh = rows_mesh(8)
    step_sh, place = make_qg_step_sharded(cfg, mesh, state0, const)
    assert step_sh.uses_kernels
    sp, dp = _run_steps(step_sh, place, state0, const)
    assert np.isfinite(np.asarray(sp.q)).all() and np.isfinite(float(dp.ke))
