"""Measure the f32 matmul-DST inversion error budget ON TPU (bf16 MXU).

Compares three spectral-solve modes at the flagship 2048^2 x 4-layer size
against a float64 host (NumPy) solve of the same discrete system:

  high     HIGH-precision matmuls (3-pass bf16), no refinement — round-2 mode
  default  DEFAULT-precision matmuls (1-pass bf16), no refinement
  refine   DEFAULT-precision matmuls + ONE f32 iterative-refinement pass —
           the round-3 production mode (2 cheap solves ~ 8 bf16 passes vs
           HIGH's 12)

Reports, per mode: max relative solution error vs the f64 host solve and the
max relative residual  ||q - L psi|| / ||q||  evaluated in f64 on host — the
number to compare against the reference's mg tolerance 1e-3
(/root/reference/msqg/qg.h:159). Results recorded in PERF.md.

Run: python tools/refine_error.py [--N 2048] [--nl 4]
"""

import argparse
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def host_solve_f64(data_np, q):
    """f64 modal DST solve with NumPy matmuls (exact reference)."""
    S, inv_den, l2m, m2l = data_np
    qm = q if l2m is None else np.einsum("ml,lyx->myx", l2m, q)
    Q = np.einsum("kj,mjx->mkx", S, np.einsum("ki,myi->myk", S, qm))
    # note index order: first y then x is irrelevant (independent axes)
    P = Q * inv_den
    pm = np.einsum("ik,myk->myi", S.T, np.einsum("jk,mkx->mjx", S.T, P))
    return pm if m2l is None else np.einsum("lm,myx->lyx", m2l, pm)


def host_residual_f64(psi, q, h, strl, idh0, idh1):
    """r = q - lap(psi) - stretch(psi), Dirichlet ghosts (= -interior)."""
    p = np.pad(psi, ((0, 0), (1, 1), (1, 1)))
    p[:, 0, 1:-1] = -psi[:, 0, :]
    p[:, -1, 1:-1] = -psi[:, -1, :]
    p[:, 1:-1, 0] = -psi[:, :, 0]
    p[:, 1:-1, -1] = -psi[:, :, -1]
    lap = (p[:, 1:-1, :-2] + p[:, 1:-1, 2:] + p[:, :-2, 1:-1]
           + p[:, 2:, 1:-1] - 4.0 * psi) / h ** 2
    nl = psi.shape[0]
    st = np.zeros_like(psi)
    if nl > 1:
        s = strl  # (nl-1,) uniform
        for l in range(nl):
            if l < nl - 1:
                st[l] += s[l] * (psi[l + 1] - psi[l]) * idh1[l]
            if l > 0:
                st[l] += s[l - 1] * (psi[l - 1] - psi[l]) * idh0[l]
    return q - lap - st


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=2048)
    ap.add_argument("--nl", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from msom_tpu.solvers import spectral as sp
    from msom_tpu.ops.stretch import layer_metrics

    N, nl, L0 = args.N, args.nl, 80.0
    dh = np.array([1.0 / nl] * nl)
    sprof = np.array([(0.003 / 0.025) ** 2] * (nl - 1))
    _, idh0, idh1 = layer_metrics(dh)
    h = L0 / N

    rng = np.random.default_rng(0)
    # smooth-ish field + noise, scaled like model PV
    psi_t = rng.standard_normal((nl, N, N))
    # q = L(psi_t): residual(psi_t, q=0) = -L(psi_t)
    q64 = -host_residual_f64(psi_t, np.zeros_like(psi_t), h, sprof, idh0,
                             idh1)

    data64 = sp.build_spectral(nl=nl, N=N, L0=L0, dh=dh, s_profile=sprof,
                               periodic=False, dtype=jnp.float64,
                               force_matmul=True, refine=False)
    S64 = np.asarray(sp.dst_matrix(N))
    dnp = (S64, np.asarray(data64.inv_den, np.float64),
           None if data64.l2m is None else np.asarray(data64.l2m, np.float64),
           None if data64.m2l is None else np.asarray(data64.m2l, np.float64))
    psi_ref = host_solve_f64(dnp, q64)
    ref_scale = np.max(np.abs(psi_ref))
    q_scale = np.max(np.abs(q64))

    base = sp.build_spectral(nl=nl, N=N, L0=L0, dh=dh, s_profile=sprof,
                             periodic=False, dtype=jnp.float32,
                             transform="matmul", refine=False)
    modes = {
        "high": base,
        "default": dataclasses.replace(base, refine=False),
        "refine": dataclasses.replace(base, refine=True),
        "fused": base,   # Pallas fused kernel (solvers/pallas_spectral.py)
    }
    q32 = jnp.asarray(q64, jnp.float32)

    import os
    for name, data in modes.items():
        # fresh jit per mode: a shared jax.jit(sp.solve_spectral) would hit
        # the "high" trace for "default" (same avals + static meta) and the
        # _MM_PRECISION patch would never enter a trace (r3 tool fix)
        if name == "fused":
            os.environ.pop("MSOM_PALLAS", None)   # earlier modes set "0"
            from msom_tpu.solvers import pallas_spectral as psx
            if not psx.enabled(jnp.float32, args.N):
                continue
            # wrap the fused kernel with the SAME l2m/m2l modal projections
            # solve_spectral applies, so the fused row measures the same
            # computation (and its error/wall are comparable to the others)
            def _fused_full(d, q):
                qm = q if d.l2m is None else jnp.einsum(
                    "ml,lyx->myx", d.l2m, q, precision=sp._MODE_PRECISION)
                pm = psx.fused_mm_solve(d.S, d.inv_den, qm)
                return pm if d.m2l is None else jnp.einsum(
                    "lm,myx->lyx", d.m2l, pm, precision=sp._MODE_PRECISION)
            solve_j = jax.jit(_fused_full)
        else:
            os.environ["MSOM_PALLAS"] = "0"   # keep xla einsums for these
            solve_j = jax.jit(lambda d, q: sp.solve_spectral(d, q))
        if name == "default":
            old = sp._MM_PRECISION
            sp._MM_PRECISION = jax.lax.Precision.DEFAULT
        try:
            psi = solve_j(data, q32)
            _ = float(psi[0, 0, 0])
            t0 = time.time()
            psi = solve_j(data, q32 * (1.0 + 1e-7))
            _ = float(psi[0, 0, 0])
            wall = time.time() - t0
        finally:
            if name == "default":
                sp._MM_PRECISION = old
        p = np.asarray(psi, np.float64)
        err = np.max(np.abs(p - psi_ref)) / ref_scale
        res = host_residual_f64(p, q64, h, sprof, idh0, idh1)
        rres = np.max(np.abs(res)) / q_scale
        print(f"{name:8s} sol_err={err:.3e} resid={rres:.3e} "
              f"wall={wall * 1e3:.2f} ms")
    os.environ.pop("MSOM_PALLAS", None)


if __name__ == "__main__":
    main()
