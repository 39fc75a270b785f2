"""Energy-budget identity tests + .bas round-trip tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from msom_tpu.io.bas import read_bas, write_bas
from msom_tpu.models import qg as m
from msom_tpu.models import qg_energy as en
from msom_tpu.params import QGConfig

RNG = np.random.default_rng(3)


def cfg3(**kw):
    base = dict(N=32, nl=3, L0=80, Rom=0.025, Ekb=0.002, Eks=0.001, tau0=0.0,
                Re4=1563, Re=500.0, beta=0.5, Fr=(0.0023669, 0.0076173),
                dh=(0.06, 0.14, 0.8), DT=5e-2, tend=1.0, dtout=1.0, CFL=0.6,
                ediag=1, dtype="float64")
    base.update(kw)
    return QGConfig(**base).validate()


def test_energy_sum_reproduces_rhs():
    """With ediag=1, dt=1 and no wind/topo, de_j1+j2+j3+vd+bf equals the full
    RHS (budget completeness: the jc cross-terms cancel and the ju/jd swap
    reassembles advection_pv exactly)."""
    cfg = cfg3()
    const = m.build_constants(cfg)
    psi = jnp.asarray(RNG.standard_normal((3, 32, 32)) * 0.1)
    q = m.comp_q(cfg, const, psi)

    # RHS via the model (tau0=0 so wind contributes nothing)
    from msom_tpu.ops.ghost import ghosted, laplacian_g
    psi_g = ghosted(psi, m._bc_psi(cfg))
    zeta = laplacian_g(psi_g, cfg.delta)
    zeta_g = m._ghost_deriv(cfg, zeta, psi_g)
    dq, _ = m.rhs(cfg, const, q, psi, psi_g, zeta, zeta_g, None)

    acc = en.init_energy(cfg)
    acc = en.energy_tend(cfg, const, acc, psi, dt=1.0)
    total = (np.asarray(acc.de_j1) + np.asarray(acc.de_j2)
             + np.asarray(acc.de_j3) + np.asarray(acc.de_vd)
             + np.asarray(acc.de_bf))
    np.testing.assert_allclose(total, np.asarray(dq), rtol=1e-9, atol=1e-12)


def test_energy_weight_ediag0():
    """ediag=0 weights every term by -psi (energy form)."""
    cfg = cfg3(ediag=0)
    const = m.build_constants(cfg)
    psi = jnp.asarray(RNG.standard_normal((3, 32, 32)) * 0.1)
    acc0 = en.init_energy(cfg)
    acc = en.energy_tend(cfg, const, acc0, psi, dt=1.0)
    cfg1 = cfg3(ediag=1)
    acc1 = en.energy_tend(cfg1, const, en.init_energy(cfg1), psi, dt=1.0)
    # bf term: ediag0 = -psi * ediag1 elementwise (friction is layer-local)
    np.testing.assert_allclose(np.asarray(acc.de_bf),
                               -np.asarray(psi) * np.asarray(acc1.de_bf),
                               rtol=1e-10, atol=1e-14)


def test_po_mft_running_mean():
    cfg = cfg3()
    const = m.build_constants(cfg)
    psis = [jnp.asarray(RNG.standard_normal((3, 32, 32))) for _ in range(3)]
    acc = en.init_energy(cfg)
    for p in psis:
        acc = en.energy_tend(cfg, const, acc, p, dt=0.1)
    want = np.mean([np.asarray(p) for p in psis], axis=0)
    np.testing.assert_allclose(np.asarray(acc.po_mft), want, rtol=1e-12)
    assert int(acc.nme_ft) == 3


def test_filter_de_resets_mean():
    cfg = cfg3(dtflt=0.5, afilt=0.05)
    const = m.build_constants(cfg)
    psi = jnp.asarray(RNG.standard_normal((3, 32, 32)) * 0.1)
    q = m.comp_q(cfg, const, psi)
    acc = en.energy_tend(cfg, const, en.init_energy(cfg), psi, dt=1.0)
    acc2 = en.filter_de(cfg, const, acc, q, psi)
    assert int(acc2.nme_ft) == 0
    assert np.all(np.asarray(acc2.po_mft) == 0)
    assert np.isfinite(np.asarray(acc2.de_ft)).all()


def test_bas_roundtrip(tmp_path):
    f = RNG.standard_normal((3, 16, 16)).astype(np.float32).astype(np.float64)
    p = str(tmp_path / "t.bas")
    write_bas(p, f, L0=80.0)
    g, x, y = read_bas(p)
    np.testing.assert_allclose(g, f, rtol=0, atol=0)
    np.testing.assert_allclose(x, (np.arange(16) + 0.5) * 5.0, rtol=1e-6)


def test_bas_reference_layout(tmp_path):
    """Byte-level layout: header N, y-coords, then x-major rows — so a value
    written at (y=j, x=i) lands at block offset (i+1)*(N+1) + (j+1)."""
    N = 4
    f = np.arange(N * N, dtype=np.float64).reshape(N, N)  # f[j, i]
    p = str(tmp_path / "t.bas")
    write_bas(p, f, L0=4.0)
    raw = np.fromfile(p, np.float32).reshape(N + 1, N + 1)
    assert raw[0, 0] == N
    # v[i][j] = f[j, i]
    for i in range(N):
        for j in range(N):
            assert raw[i + 1, j + 1] == f[j, i]


def test_bas_single_layer_2d(tmp_path):
    f = RNG.standard_normal((8, 8))
    p = str(tmp_path / "s.bas")
    write_bas(p, f, L0=1.0)
    g, _, _ = read_bas(p)
    assert g.shape == (1, 8, 8)
    np.testing.assert_allclose(g[0], f.astype(np.float32), rtol=1e-6)
