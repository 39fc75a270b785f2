"""Time the fused coupled-RHS kernels on real TPU at the flagship size.

Uses tools.ubench (scan-chained, scalar fetch, tunnel-RTT subtracted).
Run: python tools/coupled_kernel_bench.py [--N 2048] [--nl 4] [--skip ...]
"""
import argparse, sys
import numpy as np
sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=2048)
    ap.add_argument("--nl", type=int, default=4)
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    import jax, jax.numpy as jnp
    from msom_tpu.models import qg as m, pallas_rhs
    from msom_tpu.params import QGConfig
    from tools.ubench import timeit
    N, nl = args.N, args.nl
    skip = set(args.skip.split(",")) if args.skip else set()
    base = dict(N=N, nl=nl, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                Re4=1563, beta=0.5, Fr=(0.0023669,) * (nl - 1),
                dh=tuple([1.0 / nl] * nl), DT=5e-2, tend=500.0, dtout=1.0,
                CFL=0.6, dtype="float32")
    rng = np.random.default_rng(0)
    y = (np.arange(N) + 0.5) / N
    pp = 1e-2 * np.sin(np.pi * y)[None, :, None] * np.ones((nl, N, N), np.float32)
    topo = (0.05 * np.outer(np.sin(np.pi * y), np.sin(2 * np.pi * y))).astype(np.float32)
    qforc = 1e-4 * rng.standard_normal((nl, N, N)).astype(np.float32)

    cfg_p = QGConfig(**base).validate()
    const_p = m.build_constants(cfg_p)
    cfg_c = QGConfig(**base, flsrv=1, nptr=2, Pe=(1e3, 2e3),
                     ptr_r=(100.0, 0.0)).validate()
    const_c = m.build_constants(cfg_c, psipg=pp, topo=topo, qforc=qforc)
    print("T plain:", const_p.rhsk.T, " T coupled:", const_c.rhsk.T,
          " Ttr:", const_c.rhsk.Ttr, flush=True)

    psi0 = jnp.asarray(0.1 * rng.standard_normal((nl, N, N)), jnp.float32)
    tr0 = jnp.asarray(1e-3 * rng.standard_normal((nl, 2, N, N)), jnp.float32)

    def run(name, fn, carry, *a, n=30):
        if name in skip:
            return
        try:
            t = timeit(fn, carry, *a, n=n)
            print(f"{name:12s}: {t:8.3f} ms", flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED: {str(e)[:400]}", flush=True)

    run("rhs_plain", lambda p, c: p + 1e-9 * pallas_rhs.rhs_fused(cfg_p, c, p)[0],
        psi0, const_p)
    run("rhs_coupled", lambda p, c: p + 1e-9 * pallas_rhs.rhs_fused(cfg_c, c, p)[0],
        psi0, const_c)
    run("tracers", lambda t, c, p: t + 1e-9 * pallas_rhs.tracer_fused(cfg_c, c, p, t),
        tr0, const_c, psi0)

    from msom_tpu.ops.ghost import ghosted, laplacian_g

    def xla_rhs(p, c, t):
        pg = ghosted(p, m._bc_psi(cfg_c))
        z = laplacian_g(pg, cfg_c.delta)
        zg = m._ghost_deriv(cfg_c, z, pg)
        q = m.comp_q(cfg_c, c, p)
        dq, dtr = m.rhs(cfg_c, c, q, p, pg, z, zg, t)
        return p + 1e-9 * dq
    run("rhs_xla", xla_rhs, psi0, const_c, tr0, n=10)


if __name__ == "__main__":
    main()
