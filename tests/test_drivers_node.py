"""End-to-end driver runs for the qg-node / newqg / sqg families
(VERDICT round-1 item 5): event-scheduled loops with NetCDF output every
dtout, diag_1d.dat at dtdiag, restart.nc pickup, and the params.in CLI."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from msom_tpu.driver_node import run_newqg, run_node, run_sqg
from msom_tpu.io.netcdf import read_nc
from msom_tpu.models.qg_node import NodeQGConfig, load_node_config

NODE_PARAMS = """
N  = 32
L0 = 100
f0 = 46.5
hEkb = 1e-3
tau0 = 1e-3
nu = 5
beta = 0.5
dh   = [1.0]
noise_init = 1e-3
DT    = 5.e-2
tend  = 1.0
dtout = 0.5
dtdiag = 0.25
CFL   = 0.2
TOLERANCE = 1e-5
dtype = float64
"""


def test_run_node_events(tmp_path):
    cfg = load_node_config(NODE_PARAMS)
    out = str(tmp_path / "out")
    state, writer = run_node(cfg, outdir=out, restart=None,
                             params_text=NODE_PARAMS)
    assert float(state.t) == pytest.approx(1.0, abs=1e-9)
    # output event fired at t = 0, 0.5, 1.0
    fields, t_last = read_nc(os.path.join(out, "vars.nc"), ["psi", "q"],
                             time_index=None)
    assert fields["psi"].shape == (3, 33, 33)
    assert np.all(np.isfinite(fields["psi"]))
    # diag_1d.dat: header + rows at 0.25, 0.5, 0.75, 1.0
    lines = open(os.path.join(out, "diag_1d.dat")).read().strip().split("\n")
    assert lines[0].startswith("#")
    rows = np.array([[float(v) for v in ln.split(",")] for ln in lines[1:]])
    assert rows.shape[0] == 4
    np.testing.assert_allclose(rows[:, 0], [0.25, 0.5, 0.75, 1.0], atol=1e-9)
    assert np.all(np.isfinite(rows))
    # config was backed up
    assert open(os.path.join(out, "params.in")).read() == NODE_PARAMS


def test_run_node_restart_continues_trajectory(tmp_path):
    """A run split by a restart must continue the physical trajectory: the
    restart stores psi as float32 NetCDF (like the reference's ncks-produced
    restart.nc) and the CFL `previous` state resets (the reference's static
    `previous` is also lost on restart, qg-node/qg.h:259), so the match is
    close-but-not-bitwise by design."""
    cfg = load_node_config(NODE_PARAMS, tend=0.5)
    out1 = str(tmp_path / "a")
    st1, _ = run_node(cfg, outdir=out1, restart=None)
    rp = str(tmp_path / "restart.nc")
    import shutil
    shutil.copy(os.path.join(out1, "vars.nc"), rp)

    cfg2 = load_node_config(NODE_PARAMS, tend=1.0)
    out2 = str(tmp_path / "b")
    st2, _ = run_node(cfg2, outdir=out2, restart=rp)
    assert float(st2.t) == pytest.approx(1.0, abs=1e-9)
    assert os.path.exists(os.path.join(out2, "restart.nc.bak"))

    # uninterrupted reference run
    st_full, _ = run_node(load_node_config(NODE_PARAMS, tend=1.0),
                          outdir=str(tmp_path / "c"), restart=None)
    # the f32 restart quantization (~1e-7 relative) plus the reset CFL
    # `previous` (a different dt sequence) drift over the continued half of
    # the run; require the trajectories to stay within a small fraction of
    # the signal (measured ~0.8% at these settings)
    q_r = np.asarray(st2.q)
    q_f = np.asarray(st_full.q)
    scale = np.max(np.abs(q_f))
    assert np.max(np.abs(q_r - q_f)) < 0.05 * scale


def test_run_newqg_driver(tmp_path):
    from msom_tpu.models.newqg import NewQGConfig
    cfg = NewQGConfig(N=32, nl=1, L0=1.0, f0=10.0, beta=2.0, hEkb=1e-3,
                      tau0=1e-3, nu=1e-5, gp_low=0.1, dh=(1.0,), DT=1e-2,
                      tend=0.5, dtout=0.25, CFL=0.5, TOLERANCE=1e-6,
                      dtype="float64")
    out = str(tmp_path / "out")
    state, _ = run_newqg(cfg, outdir=out, restart=None)
    assert float(state.t) == pytest.approx(0.5, abs=1e-9)
    fields, _ = read_nc(os.path.join(out, "vars.nc"), ["psi"],
                        time_index=None)
    assert fields["psi"].shape == (3, 32, 32)   # t = 0, 0.25, 0.5
    assert np.all(np.isfinite(fields["psi"]))

    # restart pickup
    rp = str(tmp_path / "restart.nc")
    import shutil
    shutil.copy(os.path.join(out, "vars.nc"), rp)
    import dataclasses
    st2, _ = run_newqg(dataclasses.replace(cfg, tend=0.75),
                       outdir=str(tmp_path / "o2"), restart=rp)
    assert float(st2.t) == pytest.approx(0.75, abs=1e-9)


def test_run_sqg_driver_with_restart(tmp_path):
    cfg = NodeQGConfig(N=16, nl=2, L0=1.0, f0=5.0, beta=0.1, nu=1e-4,
                       dh=(0.5, 0.5), N2=(1.0, 1.0), noise_init=1e-2,
                       DT=5e-3, tend=0.1, dtout=0.05, CFL=0.4,
                       TOLERANCE=1e-8, dtype="float64")
    out = str(tmp_path / "out")
    st, _ = run_sqg(cfg, outdir=out, restart=None)
    fields, t_last = read_nc(os.path.join(out, "vars.nc"), ["psi", "bs"])
    assert fields["psi"].shape == (2, 17, 17)
    assert fields["bs"].shape == (17, 17)
    rp = str(tmp_path / "restart.nc")
    import shutil
    shutil.copy(os.path.join(out, "vars.nc"), rp)
    import dataclasses
    st2, _ = run_sqg(dataclasses.replace(cfg, tend=0.15),
                     outdir=str(tmp_path / "o2"), restart=rp)
    assert float(st2.t) == pytest.approx(0.15, abs=1e-9)
    assert np.all(np.isfinite(np.asarray(st2.q)))


def test_node_cli(tmp_path, monkeypatch, capfd):
    # capfd (not capsys): driver.stdout_hooks binds sys.stdout at def time
    from msom_tpu import driver_node
    cfgf = tmp_path / "params.in"
    cfgf.write_text(NODE_PARAMS.replace("tend  = 1.0", "tend  = 0.2"))
    monkeypatch.chdir(tmp_path)
    driver_node.main(["--model", "node", "--config", str(cfgf),
                      "--outdir", str(tmp_path / "o"), "--restart", "none"])
    heartbeat = capfd.readouterr().out
    assert "ke_1 =" in heartbeat and "dt =" in heartbeat
    assert os.path.exists(tmp_path / "o" / "vars.nc")


def test_run_node_sharded_matches_unsharded(tmp_path):
    """run_node(sharded=True) over the 8-device mesh reproduces the
    unsharded driver's trajectory and output files (VERDICT r2 item 4:
    the vertex-sharded path is reachable from the driver), including an
    in-loop wavelet-filter event."""
    params = NODE_PARAMS + "\nnl = 2\nN2 = [1.0]\ndh = [0.5, 0.5]\n" \
        "dtflt = 0.4\nLfmax = 30.0\nLfmin = 10.0\nbc_fac = 1.0\n"
    # the vertex-sharded step runs the multigrid; the unsharded reference
    # must use the same algorithm for trajectory equality (the default
    # "auto" solver picks the exact nodal spectral solve instead)
    cfg = load_node_config(params, solver="vmg")
    out_u = str(tmp_path / "u")
    st_u, _ = run_node(cfg, outdir=out_u, restart=None, params_text=params)
    out_s = str(tmp_path / "s")
    st_s, _ = run_node(cfg, outdir=out_s, restart=None, params_text=params,
                       sharded=True)
    f_u, _ = read_nc(os.path.join(out_u, "vars.nc"), ["psi", "q"],
                     time_index=None)
    f_s, _ = read_nc(os.path.join(out_s, "vars.nc"), ["psi", "q"],
                     time_index=None)
    assert f_s["psi"].shape == f_u["psi"].shape
    scale = np.abs(f_u["q"]).max()
    assert np.abs(f_s["q"] - f_u["q"]).max() < 1e-5 * scale  # f32 NetCDF
    d_u = open(os.path.join(out_u, "diag_1d.dat")).read().strip().split("\n")
    d_s = open(os.path.join(out_s, "diag_1d.dat")).read().strip().split("\n")
    assert len(d_s) == len(d_u)
    ru = np.array([[float(v) for v in ln.split(",")] for ln in d_u[1:]])
    rs = np.array([[float(v) for v in ln.split(",")] for ln in d_s[1:]])
    np.testing.assert_allclose(rs, ru, rtol=1e-8, atol=1e-14)
