"""Fused masked vertex sweep kernel (solvers/pallas_vmg.py, interpret
mode) vs the XLA relax_v — bitwise, on a coastline-masked baroclinic
level (the qg-node headline mask configuration)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from msom_tpu.ops.stretch import layer_metrics
from msom_tpu.solvers import pallas_vmg, vmg


def coastline_mask(N):
    m = np.ones((N + 1, N + 1))
    y = np.linspace(0, 1, N + 1)
    coast = 0.15 + 0.08 * np.sin(3 * np.pi * y)
    for j in range(N + 1):
        m[j, : int(coast[j] * N)] = 0.0
    m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = 0.0
    return m


def test_vrb_sweep_bitwise_vs_relax_v():
    N, nl = 128, 3
    _, idh0, idh1 = layer_metrics(np.full(nl, 1.0 / nl))
    rng = np.random.default_rng(0)
    S2 = jnp.asarray(1.0 + 0.3 * rng.standard_normal(
        (nl - 1, N + 1, N + 1)) ** 2)
    levels = vmg.build_vlevels(nl=nl, N=N, L0=100.0, S2=S2, idh0=idh0,
                               idh1=idh1,
                               mask=jnp.asarray(coastline_mask(N)),
                               dtype=jnp.float64)
    lvl = levels[0]
    assert lvl.vsw is not None
    res = jnp.asarray(rng.standard_normal((nl, N + 1, N + 1))) * lvl.mask
    da = jnp.asarray(rng.standard_normal((nl, N + 1, N + 1))) * lvl.mask
    lvl_x = dataclasses.replace(lvl, vsw=None)
    ref = vmg.relax_v(da, res, lvl_x, 3)
    out = da
    for _ in range(3):
        out = pallas_vmg.vrb_sweep(out, res, lvl.vsw, d2=lvl.delta ** 2,
                                   interpret=True)
    assert bool(jnp.all(out == ref))


def test_vpoisson_with_kernel_sweeps(monkeypatch):
    """Full masked vpoisson solve routed through the kernels
    (MSOM_PALLAS=interpret) matches the XLA solver and converges."""
    monkeypatch.setenv("MSOM_PALLAS", "interpret")
    N, nl = 64, 2
    _, idh0, idh1 = layer_metrics(np.full(nl, 1.0 / nl))
    rng = np.random.default_rng(1)
    S2 = jnp.full((nl - 1, N + 1, N + 1), 2.0)
    mask = jnp.asarray(coastline_mask(N))
    levels = vmg.build_vlevels(nl=nl, N=N, L0=100.0, S2=S2, idh0=idh0,
                               idh1=idh1, mask=mask, dtype=jnp.float64)
    levels_x = [dataclasses.replace(l, vsw=None) for l in levels]
    b = jnp.asarray(rng.standard_normal((nl, N + 1, N + 1))) \
        * levels[0].mask
    a0 = jnp.zeros_like(b)
    kw = dict(idh0=tuple(idh0), idh1=tuple(idh1), tolerance=1e-8)
    a_k, st_k = vmg.vpoisson(a0, b, levels=levels, **kw)
    monkeypatch.setenv("MSOM_PALLAS", "0")
    a_x, st_x = vmg.vpoisson(a0, b, levels=levels_x, **kw)
    assert float(st_k.resa) < 1e-7
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_x),
                               rtol=1e-10, atol=1e-12)
