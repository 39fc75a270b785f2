"""QG linear stability (linearmode.py capability): Phillips 2-layer physics
oracles — supercritical shear unstable near k*Rd ~ 0.64, zero shear neutral,
beta-subcritical shear stable."""

import numpy as np

from msom_tpu.analysis import (qg_growth_rate, qg_linear_stability,
                               stretching_matrix_dim)


F0, G1, H = 1e-4, 0.02, 500.0
DH, GP = [H, H], [G1]
RD = np.sqrt(G1 * H / 2) / F0
BETA = 1.6e-11
KS = np.linspace(0.1 / RD, 2.0 / RD, 20)


def test_gamma_row_sums_zero():
    G = stretching_matrix_dim(DH, GP, F0)
    np.testing.assert_allclose(G.sum(axis=1), 0.0, atol=1e-20)
    # symmetric in the dh-weighted inner product
    W = np.diag(DH)
    np.testing.assert_allclose(W @ G, (W @ G).T, rtol=1e-12)


def test_phillips_supercritical_unstable():
    s, kb, lb = qg_growth_rate(DH, GP, F0, np.zeros(2),
                               np.array([-0.05, 0.0]), KS, [0.0], beta=BETA)
    assert s > 1e-8
    assert 0.4 < kb * RD < 1.0   # most unstable near 0.64/Rd


def test_no_shear_neutral():
    s, _, _ = qg_growth_rate(DH, GP, F0, np.zeros(2), np.zeros(2), KS, [0.0],
                             beta=BETA)
    assert abs(s) < 1e-14


def test_beta_stabilizes_subcritical():
    Uc = BETA * RD ** 2
    s, _, _ = qg_growth_rate(DH, GP, F0, np.zeros(2),
                             np.array([-0.2 * Uc, 0.0]), KS, [0.0],
                             beta=BETA)
    assert abs(s) < 1e-14


def test_rossby_wave_frequency_no_shear():
    """With no shear and no friction the frequencies are the neutral Rossby
    modes omega = -beta*k/(k^2 - lambda) with lambda the Gamma eigenvalues."""
    k = 0.5 / RD
    w = qg_linear_stability(DH, GP, F0, np.zeros(2), np.zeros(2), k, 0.0,
                            beta=BETA)
    lam = np.linalg.eigvalsh(
        np.diag(np.sqrt(DH)) @ stretching_matrix_dim(DH, GP, F0)
        @ np.diag(1.0 / np.sqrt(DH)))
    expect = np.sort(k * BETA / (lam - k ** 2))
    np.testing.assert_allclose(np.sort(w.real), expect, rtol=1e-10)
    np.testing.assert_allclose(w.imag, 0.0, atol=1e-14)
