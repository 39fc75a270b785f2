"""Wavelet transform/filter tests: exact reconstruction, reference sig_lev
weight semantics, filter behavior on scale-separated fields, and the msqg
filter event (qof accumulation)."""

import numpy as np
import pytest

import jax.numpy as jnp

from msom_tpu.ops import wavelet as wv
from msom_tpu.ops.bc import BC

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("bc", [BC.DIRICHLET, BC.PERIODIC, BC.NEUMANN])
def test_roundtrip_exact(bc):
    s = jnp.asarray(RNG.standard_normal((2, 32, 32)))
    w = wv.wavelet(s, bc)
    s2 = wv.inverse_wavelet(w, bc)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s), atol=1e-12)
    # pyramid shapes
    assert [x.shape[-1] for x in w] == [1, 2, 4, 8, 16, 32]


def test_allpass_filter_is_identity():
    s = jnp.asarray(RNG.standard_normal((16, 16)))
    sig = tuple(np.ones((2**l, 2**l)) for l in range(5))
    out = wv.filter_field(s, sig, BC.DIRICHLET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(s), atol=1e-12)
    sig0 = tuple(np.zeros((2**l, 2**l)) for l in range(5))
    out0 = wv.filter_field(s, sig0, BC.DIRICHLET)
    np.testing.assert_allclose(np.asarray(out0), 0.0, atol=1e-14)


def test_sig_lev_uniform_cutoff():
    """Uniform sig_filt: levels with 2*Delta < sig_filt get low-pass 0 (high-
    pass 1 = keep detail); coarse levels with Delta >= sig_filt are killed."""
    N, L0 = 64, 64.0
    sig_filt = np.full((N, N), 8.0)  # cutoff scale 8 => Delta=1..64 levels
    sig = wv.sig_lev_pyramid(sig_filt, L0, highpass=True)
    # level 6: Delta=1, sig>2Delta -> low 0 -> high 1 (keep fine scales)
    np.testing.assert_allclose(sig[6], 1.0)
    np.testing.assert_allclose(sig[5], 1.0)  # Delta=2, 8>4
    # level 4: Delta=4, sig in (4,8] -> ramp 1-(8-4)/4=0 -> high 1
    np.testing.assert_allclose(sig[4], 1.0)
    # level 3: Delta=8, sig<=Delta -> low 1 -> high 0 (kill large scales)
    np.testing.assert_allclose(sig[3], 0.0)
    np.testing.assert_allclose(sig[0], 0.0)


def test_sig_lev_child_propagation():
    """A cell whose children have nonzero low-pass weight must get low-pass 1
    even if its own sig_filt says otherwise (msqg/qg.h:1068-1073)."""
    N, L0 = 8, 8.0
    # spatially varying cutoff: left half small scale, right half huge
    sig_filt = np.where(np.arange(N)[None, :] < N // 2, 0.5, 100.0) \
        * np.ones((N, N))
    low = [1.0 - h for h in wv.sig_lev_pyramid(sig_filt, L0, highpass=True)]
    # finest level: left half low-pass 1 (sig<=Delta), right half 0
    assert low[3][0, 0] == 1.0 and low[3][0, -1] == 0.0
    # its parents on the left get 1 by propagation
    assert low[2][0, 0] == 1.0
    assert low[0][0, 0] == 1.0  # root propagates too


def test_filter_separates_scales():
    """High-pass filter keeps a fine-scale sine, damps a coarse one."""
    N, L0 = 64, 1.0
    x = (np.arange(N) + 0.5) / N
    X, Y = np.meshgrid(x, x, indexing="xy")
    coarse = np.sin(2 * np.pi * X) * np.sin(2 * np.pi * Y)
    fine = np.sin(2 * np.pi * 16 * X) * np.sin(2 * np.pi * 16 * Y)
    sig_filt = np.full((N, N), 0.25)  # cutoff scale: kill > 0.25
    sig = wv.sig_lev_pyramid(sig_filt, L0)
    out_c = np.asarray(wv.filter_field(jnp.asarray(coarse), sig, BC.PERIODIC))
    out_f = np.asarray(wv.filter_field(jnp.asarray(fine), sig, BC.PERIODIC))
    # the bilinear-pyramid wavelet is not spectrally sharp: a smooth coarse
    # field keeps substantial fine-level detail (same in the reference); the
    # separation is relative.
    rc = np.linalg.norm(out_c) / np.linalg.norm(coarse)
    rf = np.linalg.norm(out_f) / np.linalg.norm(fine)
    assert rc < 0.7
    assert rf > 0.95
    assert rf > rc + 0.3


def test_filter_event_qof_accumulation():
    from msom_tpu.models import qg as m
    from msom_tpu.params import QGConfig

    cfg = QGConfig(N=32, nl=3, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                   Re4=1563, beta=0.5, Fr=(0.0023669, 0.0076173),
                   dh=(0.06, 0.14, 0.8), DT=5e-2, tend=1.0, dtout=1.0,
                   dtflt=0.5, afilt=0.2, CFL=0.6, dtype="float64").validate()
    const = m.build_constants(cfg)
    state = m.init_state(cfg, const, seed=0)
    assert state.qof is not None
    q_pre = np.asarray(state.q)
    s2 = wv.wavelet_filter_step(cfg, const, state)
    assert int(s2.nbar) == 1
    # qof = (q_pre - q_post)/dtflt on the first call
    np.testing.assert_allclose(np.asarray(s2.qof),
                               (q_pre - np.asarray(s2.q)) / cfg.dtflt,
                               rtol=1e-10, atol=1e-12)
    # filtering with afilt*Rd=0.2*1 << Delta(=2.5) kills nothing... actually
    # sig_filt < Delta at every level -> high-pass complement of lowpass=1
    # everywhere -> psi filtered to zero is NOT expected; just check finite
    assert np.isfinite(np.asarray(s2.q)).all()
