"""Hardware shootout: factored (two-stage) matmul DST vs the direct
(N, N)-matmul DST at the flagship size — the r4 'break the O(N^3) wall'
experiment (VERDICT r3 item 2). Measures the full modal SOLVE (projections
+ transforms + scale) per path and the roundtrip error vs f64.

Run: python tools/ctdst_experiment.py [--N 2048] [--nl 4]
"""
import argparse, sys
import numpy as np
sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=2048)
    ap.add_argument("--nl", type=int, default=4)
    ap.add_argument("--splits", default="")
    args = ap.parse_args()
    import jax, jax.numpy as jnp
    from msom_tpu.solvers import spectral as sp, ctdst
    from tools.ubench import timeit
    import dataclasses

    N, nl, L0 = args.N, args.nl, 80.0
    dh = np.array([1.0 / nl] * nl)
    sprof = np.array([(0.003 / 0.025) ** 2] * (nl - 1))
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.standard_normal((nl, N, N)), jnp.float32)

    d_mm = sp.build_spectral(nl=nl, N=N, L0=L0, dh=dh, s_profile=sprof,
                             periodic=False, dtype=jnp.float32,
                             transform="matmul")
    d_fc = sp.build_spectral(nl=nl, N=N, L0=L0, dh=dh, s_profile=sprof,
                             periodic=False, dtype=jnp.float32,
                             transform="factored")
    # f64 reference on host
    d64 = sp.build_spectral(nl=nl, N=N, L0=L0, dh=dh, s_profile=sprof,
                            periodic=False, dtype=jnp.float64,
                            transform="fft")

    import os
    os.environ["MSOM_PALLAS"] = "0"

    def err_of(d):
        p = jax.jit(sp.solve_spectral)(d, q0)
        return np.asarray(p, np.float64)

    t_mm = timeit(lambda q, d: q + 1e-9 * sp.solve_spectral(d, q), q0, d_mm, n=20)
    print(f"direct matmul HIGH : {t_mm:7.3f} ms/solve", flush=True)
    # folded (Lee even/odd) at several level counts; inv_den must be
    # permuted per level count, so rebuild via build_spectral-equivalent
    for L in (2, 3):
        fac, perm = ctdst.build_fold(N, jnp.float32, L)
        inv_nat = np.asarray(d_mm.inv_den)
        inv_p = jnp.asarray(inv_nat[:, perm][:, :, perm])
        d = dataclasses.replace(d_fc, fac=fac, inv_den=inv_p)
        try:
            t = timeit(lambda q, dd: q + 1e-9 * sp.solve_spectral(dd, q), q0, d, n=20)
            print(f"folded L={L}        : {t:7.3f} ms/solve", flush=True)
        except Exception as e:
            print(f"folded L={L} FAILED: {str(e)[:200]}", flush=True)

    # errors vs f64 (CPU-free: compute residual via host f64 solve path)
    import jax as j2
    p64 = None
    try:
        # host f64 exact solve via numpy (direct matrices)
        S64 = np.asarray(sp.dst_matrix(N))
        q64 = np.asarray(q0, np.float64)
        l2m = None if d64.l2m is None else np.asarray(d64.l2m, np.float64)
        m2l = None if d64.m2l is None else np.asarray(d64.m2l, np.float64)
        qm = q64 if l2m is None else np.einsum("ml,lyx->myx", l2m, q64)
        Q = np.einsum("kj,mjx->mkx", S64, np.einsum("ki,myi->myk", S64, qm))
        P = Q * np.asarray(d64.inv_den, np.float64)
        pm = np.einsum("ik,myk->myi", S64.T, np.einsum("jk,mkx->mjx", S64.T, P))
        p64 = pm if m2l is None else np.einsum("lm,myx->lyx", m2l, pm)
    except MemoryError:
        pass
    if p64 is not None:
        sc = np.abs(p64).max()
        for name, d in (("matmul", d_mm), ("factored", d_fc)):
            p = err_of(d)
            print(f"err {name:9s}: {np.abs(p - p64).max() / sc:.3e}", flush=True)


if __name__ == "__main__":
    main()
