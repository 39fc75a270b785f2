"""newqg model + NetCDF + checkpoint/restart tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msom_tpu.io import checkpoint, netcdf
from msom_tpu.models import newqg

RNG = np.random.default_rng(21)


def cfg(**kw):
    base = dict(N=64, nl=1, L0=100.0, tau0=1e-3, nu=5.0, beta=0.5,
                dh=(1.0,), sbc=0.0, DT=5e-2, tend=200.0, dtout=10.0,
                CFL=0.2, TOLERANCE=1e-5, dtype="float64")
    base.update(kw)
    return newqg.NewQGConfig(**base)


def test_example_deck_from_docstring():
    c = newqg.load_newqg_config("""
N  = 64
L0 = 100
tau0 = 1e-3
nu = 5
beta = 0.5
dh   = [1.0]
sbc = 0
DT    = 5.e-2
tend  = 200.
dtout = 10
CFL   = 0.2
TOLERANCE = 1e-5
""")
    assert c.N == 64 and c.L0 == 100 and c.nu == 5 and c.TOLERANCE == 1e-5


def test_pulse_forced_run():
    c = cfg()
    step = jax.jit(newqg.make_step(c))
    _, lam = newqg.build_levels(c)
    state = newqg.init_state(c, lam, seed=0)
    kes = []
    for _ in range(6):
        state, d = step(state, jnp.asarray(1e9))
        kes.append(float(d.ke))
    assert np.isfinite(np.asarray(state.q)).all()
    assert kes[-1] > 0


def test_helmholtz_bottom_layer_only():
    c = cfg(nl=2, gp_low=2.0, dh=(0.5, 0.5))
    assert c.iRd2_low == pytest.approx(-1.0 / (2.0 * 0.5))
    _, lam = newqg.build_levels(c)
    lam = np.asarray(lam)
    assert np.all(lam[0] == 0.0)
    assert np.allclose(lam[1], c.iRd2_low)


def test_netcdf_roundtrip(tmp_path):
    path = str(tmp_path / "vars.nc")
    w = netcdf.NCWriter(path, ["psi", "q"], n=16, nl=2, L0=1.0, vertex=True)
    psi0 = RNG.standard_normal((2, 17, 17))
    q0 = RNG.standard_normal((2, 17, 17))
    w.append(0.0, psi=psi0, q=q0)
    psi1 = RNG.standard_normal((2, 17, 17))
    w.append(1.5, psi=psi1, q=q0)
    w.close()
    # restart convention: read the LAST record
    data, t = netcdf.read_nc(path, ["psi"])
    assert t == 1.5
    np.testing.assert_allclose(data["psi"], psi1.astype(np.float32),
                               rtol=1e-6)
    data0, t0 = netcdf.read_nc(path, ["psi", "q"], time_index=0)
    assert t0 == 0.0
    np.testing.assert_allclose(data0["q"], q0.astype(np.float32), rtol=1e-6)


def test_checkpoint_bit_exact_resume(tmp_path):
    """Unlike the reference (which loses the CFL controller state on restart,
    SURVEY.md §5.4), our checkpoint resume is bit-exact."""
    from msom_tpu.models import qg as m
    from msom_tpu.params import QGConfig

    c = QGConfig(N=32, nl=3, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                 Re4=1563, beta=0.5, Fr=(0.0023669, 0.0076173),
                 dh=(0.06, 0.14, 0.8), DT=5e-2, tend=1.0, dtout=1.0,
                 CFL=0.6, dtype="float64").validate()
    const = m.build_constants(c)
    state = m.init_state(c, const, seed=0)
    step = jax.jit(m.make_step(c))
    for _ in range(3):
        state, _ = step(state, const, jnp.asarray(1e9))

    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_state(path, state)
    restored = checkpoint.load_state(path, m.init_state(c, const, seed=5))

    s_a, s_b = state, restored
    for _ in range(3):
        s_a, _ = step(s_a, const, jnp.asarray(1e9))
        s_b, _ = step(s_b, const, jnp.asarray(1e9))
    np.testing.assert_array_equal(np.asarray(s_a.q), np.asarray(s_b.q))
    np.testing.assert_array_equal(np.asarray(s_a.t), np.asarray(s_b.t))


def test_restart_from_netcdf(tmp_path):
    """qg-node style restart: write psi records, rebuild state from the last
    one (read_nc + init_state(psi0=...), qg.h:486-499)."""
    from msom_tpu.models import qg_node as qn

    c = qn.NodeQGConfig(N=32, nl=1, L0=100.0, tau0=1e-3, nu=5.0,
                        dh=(1.0,), noise_init=1e-3, DT=5e-2, CFL=0.2,
                        dtype="float64")
    const = qn.build_constants(c)
    state = qn.init_state(c, const, seed=0)
    step = jax.jit(qn.make_step(c))
    for _ in range(3):
        state, _ = step(state, const, jnp.asarray(1e9))

    path = str(tmp_path / "restart.nc")
    w = netcdf.NCWriter(path, ["psi", "q"], n=32, nl=1, L0=100.0,
                        vertex=True)
    w.append(float(state.t), psi=np.asarray(state.psi),
             q=np.asarray(state.q))
    w.close()
    data, t = netcdf.read_nc(path, ["psi"])
    s2 = qn.init_state(c, const, psi0=data["psi"])
    # q recomputed from psi (comp_q at init) matches to f32 storage precision
    np.testing.assert_allclose(np.asarray(s2.q), np.asarray(state.q),
                               atol=1e-4)
