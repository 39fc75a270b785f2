"""Turnkey reference-deck ingestion (io/deck.py + CLI wiring): build a deck
directory the way a reference user would (params.in + input fields), run
each family's CLI on it in-process, and check the produced outputs and
backups — the `./qg.e params.in` / `./pg.e params.in` contract
(/root/reference/msqg/qg.c:34-92, mspg/pg.c:47-162, qg-node/qg.c:68-130)."""

import glob
import os

import numpy as np
import pytest

from msom_tpu.io.bas import read_bas, write_bas
from msom_tpu.io.deck import load_node_deck, load_pg_deck, load_qg_deck


QG_PARAMS = """\
# msqg deck test
N  = 16
nl = 2
L0 = 80
Rom = 0.025
Ekb = 0.002
tau0 = 1e-4
beta = 0.5
Fr = [0.003]
dh = [0.5,0.5]
DT = 5e-2
tend = 0.1
dtout = 0.05
CFL = 0.6
dtype = float64
"""


def _write_qg_deck(d, N=16, nl=2, L0=80.0):
    rng = np.random.default_rng(0)
    with open(os.path.join(d, "params.in"), "w") as f:
        f.write(QG_PARAMS)
    p0 = 1e-3 * rng.standard_normal((nl, N, N))
    write_bas(os.path.join(d, "p0.bas"), p0, L0)
    psipg = 1e-4 * rng.standard_normal((nl, N, N))
    write_bas(os.path.join(d, f"psipg_{nl}l_N{N}.bas"), psipg, L0)
    frpg = np.full((nl - 1, N, N), 0.003)
    write_bas(os.path.join(d, f"frpg_{nl}l_N{N}.bas"), frpg, L0)
    write_bas(os.path.join(d, f"rdpg_{nl}l_N{N}.bas"), np.ones((N, N)), L0)
    write_bas(os.path.join(d, "topo.bas"),
              1e-3 * rng.standard_normal((N, N)), L0)
    write_bas(os.path.join(d, f"qforc_{nl}l_N{N}.bas"),
              1e-6 * rng.standard_normal((nl, N, N)), L0)
    np.asarray([0.5, 0.5], np.float32).tofile(os.path.join(d, f"dh_{nl}l.bin"))
    return p0


def test_load_qg_deck_roundtrip(tmp_path):
    from msom_tpu.params import load_qg_config
    d = str(tmp_path)
    p0 = _write_qg_deck(d)
    cfg = load_qg_config(os.path.join(d, "params.in"))
    deck = load_qg_deck(cfg, d)
    assert sorted(deck["found"]) == sorted([
        "p0.bas", "psipg_2l_N16.bas", "frpg_2l_N16.bas", "rdpg_2l_N16.bas",
        "topo.bas", "qforc_2l_N16.bas", "dh_2l.bin"])
    np.testing.assert_allclose(deck["init"]["psi0"], p0, atol=1e-6)
    np.testing.assert_allclose(deck["const"]["dh"], [0.5, 0.5])
    assert deck["const"]["rdpg"].shape == (16, 16)
    assert deck["const"]["topo"].shape == (16, 16)
    assert deck["const"]["frpg"].shape == (1, 16, 16)


def test_qg_cli_runs_deck_turnkey(tmp_path, monkeypatch):
    from msom_tpu import driver
    d = str(tmp_path / "deck")
    os.makedirs(d)
    p0 = _write_qg_deck(d)
    outdir = str(tmp_path / "out")
    monkeypatch.chdir(tmp_path)
    driver.main(["--config", os.path.join(d, "params.in"),
                 "--outdir", outdir])
    # outputs: po/qo at i=0 (t=0 event) and at the dtout events
    pos = sorted(glob.glob(os.path.join(outdir, "po*.bas")))
    qos = sorted(glob.glob(os.path.join(outdir, "qo*.bas")))
    assert len(pos) >= 2 and len(qos) >= 2
    # config + derived-field backup (backup_config parity)
    assert os.path.exists(os.path.join(outdir, "params.in"))
    assert os.path.exists(os.path.join(outdir, "psipg_2l_N16.bas"))
    assert os.path.exists(os.path.join(outdir, "frpg_2l_N16.bas"))
    # the p0.bas IC actually drove the run: first snapshot == p0 - mean(p0)
    first, _, _ = read_bas(pos[0], 2)
    expect = p0 - p0.mean(axis=(-2, -1), keepdims=True)
    np.testing.assert_allclose(first, expect, atol=1e-5)
    # the backed-up psipg round-trips the ingested field
    pp, _, _ = read_bas(os.path.join(outdir, "psipg_2l_N16.bas"), 2)
    src, _, _ = read_bas(os.path.join(d, "psipg_2l_N16.bas"), 2)
    np.testing.assert_allclose(pp, src, atol=1e-6)


PG_PARAMS = """\
N = 16
nl = 3
L0 = 1
ys = 0.3
r = 0.02
tau_s = 3e-2
tau0 = 0.12
kv = 3e-4
kh = 3e-4
DT = 1e-3
tend = 5e-3
dtout = 2.5e-3
omega = 0.2
dtype = float64
"""


def _write_pg_deck(d, N=16, nl=3, L0=1.0):
    rng = np.random.default_rng(1)
    with open(os.path.join(d, "params.in"), "w") as f:
        f.write(PG_PARAMS)
    # state dumps include the 2 vertical ghost layers -> nl+2 blocks
    b0 = rng.standard_normal((nl, N, N)) * 0.1
    b0g = np.concatenate([b0[:1], b0, b0[-1:]], axis=0)
    write_bas(os.path.join(d, "b0.bas"), b0g, L0, y0=0.3)
    u0 = 1e-3 * rng.standard_normal((nl + 2, 2, N, N))
    write_bas(os.path.join(d, "u0.bas"), u0.reshape(-1, N, N), L0, y0=0.3)
    bf = 1e-4 * rng.standard_normal((nl, N, N))
    write_bas(os.path.join(d, "bf_pg.bas"), bf, L0, y0=0.3)
    return b0, u0, bf


def test_load_pg_deck(tmp_path):
    from msom_tpu.params import load_pg_config
    d = str(tmp_path)
    b0, u0, bf = _write_pg_deck(d)
    cfg = load_pg_config(os.path.join(d, "params.in"))
    deck = load_pg_deck(cfg, d)
    assert sorted(deck["found"]) == ["b0.bas", "bf_pg.bas", "u0.bas"]
    np.testing.assert_allclose(deck["init"]["b0"], b0, atol=1e-6)
    ux, uy = deck["init"]["u0"]
    assert ux.shape == (3, 16, 17) and uy.shape == (3, 17, 16)
    np.testing.assert_allclose(ux[:, :, :-1], u0[1:-1, 0], atol=1e-8)
    np.testing.assert_allclose(uy[:, :-1, :], u0[1:-1, 1], atol=1e-8)
    assert np.all(ux[:, :, -1] == 0) and np.all(uy[:, -1, :] == 0)
    np.testing.assert_allclose(deck["const"]["b_forc"], bf, atol=1e-8)


def test_pg_cli_runs_deck_turnkey(tmp_path, monkeypatch):
    from msom_tpu import driver
    d = str(tmp_path / "deck")
    os.makedirs(d)
    b0, _, _ = _write_pg_deck(d)
    outdir = str(tmp_path / "out")
    monkeypatch.chdir(tmp_path)
    driver.main(["--config", os.path.join(d, "params.in"), "--model", "pg",
                 "--outdir", outdir])
    assert os.path.exists(os.path.join(outdir, "psibt.bas"))
    bs = sorted(glob.glob(os.path.join(outdir, "b0*.bas")))
    us = sorted(glob.glob(os.path.join(outdir, "u0*.bas")))
    assert bs and us
    # files round-trip through the deck loader (reference restart flow:
    # copy last b/u dump to b0/u0.bas)
    arr, _, _ = read_bas(bs[-1])
    assert arr.shape == (5, 16, 16)       # nl+2 ghost-layer blocks


def test_node_deck_nc(tmp_path, monkeypatch):
    """qg-node: input_vars_<nl>l_N<N>.nc ingested + backed up by the CLI."""
    from scipy.io import netcdf_file

    from msom_tpu import driver_node
    from msom_tpu.models.qg_node import load_node_config

    N, nl = 16, 2
    d = str(tmp_path / "deck")
    os.makedirs(d)
    params = ("N = 16\nnl = 2\nL0 = 100\nf0 = 46.5\nbeta = 0.5\n"
              "hEkb = 1e-3\ntau0 = 1e-3\nnu = 5.0\ndh = [0.5,0.5]\n"
              "N2 = [1.0]\nDT = 5e-2\ntend = 0.1\ndtout = 0.05\n"
              "CFL = 0.2\nTOLERANCE = 1e-6\ndtype = float64\n")
    cfgpath = os.path.join(d, "params.in")
    with open(cfgpath, "w") as f:
        f.write(params)

    rng = np.random.default_rng(2)
    psi_pg = 1e-3 * rng.standard_normal((nl, N + 1, N + 1))
    N2 = np.full((nl - 1, N + 1, N + 1), 2.0)
    with netcdf_file(os.path.join(d, f"input_vars_{nl}l_N{N}.nc"),
                     "w") as f:
        f.createDimension("level", nl)
        f.createDimension("levelm1", nl - 1)
        f.createDimension("y", N + 1)
        f.createDimension("x", N + 1)
        v = f.createVariable("psi_pg", "d", ("level", "y", "x"))
        v[:] = psi_pg
        v = f.createVariable("N2", "d", ("levelm1", "y", "x"))
        v[:] = N2

    cfg = load_node_config(params)
    deck = load_node_deck(cfg, d)
    np.testing.assert_allclose(deck["const"]["psi_pg"], psi_pg, atol=1e-12)
    np.testing.assert_allclose(deck["const"]["N2"], N2)

    outdir = str(tmp_path / "out")
    monkeypatch.chdir(tmp_path)
    driver_node.main(["--model", "node", "--config", cfgpath,
                      "--outdir", outdir, "--restart", "none"])
    assert os.path.exists(os.path.join(outdir, "vars.nc"))
    assert os.path.exists(os.path.join(outdir, f"input_vars_{nl}l_N{N}.nc"))
    # the ingested N2 changed the stretching: S2 = f_var^2 / N2
    from msom_tpu.models import qg_node as node
    const = node.build_constants(cfg, **deck["const"])
    const0 = node.build_constants(cfg)
    assert not np.allclose(np.asarray(const.S2), np.asarray(const0.S2))
