"""Hardware timing of the varRo direct solve (solvers/vary.py) vs the mg
path it unchains (VERDICT r5 #4 'done' criterion). Runs on the TPU chip."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=2048)
    p.add_argument("--nl", type=int, default=4)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--spinup", type=int, default=60)
    p.add_argument("--solver", default="both",
                   choices=["spectral", "mg", "both"])
    args = p.parse_args()

    from msom_tpu.models import qg as m
    from msom_tpu.params import QGConfig

    def build(solver):
        cfg = QGConfig(N=args.N, nl=args.nl, L0=80, Rom=0.025, Ekb=0.002,
                       tau0=1e-4, Re4=1563 * (args.N / 256) ** 3, beta=0.5,
                       varRo=1, Fr=tuple([0.003] * (args.nl - 1)),
                       dh=tuple([1.0 / args.nl] * args.nl), DT=5e-2,
                       tend=1e9, dtout=1e9, CFL=0.6, dtype="float32",
                       tol=1e-3, solver=solver).validate()
        t0 = time.time()
        const = m.build_constants(cfg)
        print(f"{solver}: build_constants {time.time()-t0:.1f}s")
        state = m.init_state(cfg, const, seed=0)
        step = m.make_step(cfg)

        def chunk(s, c, n):
            def body(s, _):
                s, d = step(s, c, jnp.asarray(1e18, s.t.dtype))
                return s, (d.dt, d.mg_iters)
            return jax.lax.scan(body, s, None, length=n)

        return cfg, const, state, jax.jit(chunk, static_argnums=2)

    pts = args.N * args.N * args.nl
    solvers = ["spectral", "mg"] if args.solver == "both" else [args.solver]
    for solver in solvers:
        cfg, const, state, chunk = build(solver)
        state, _ = chunk(state, const, args.steps)
        for _ in range(max(args.spinup - args.steps, 0) // args.steps):
            state, _ = chunk(state, const, args.steps)
        _ = float(state.q[0, 0, 0])
        t0 = time.time()
        state, (dts, iters) = chunk(state, const, args.steps)
        _ = float(state.q[0, 0, 0])
        wall = (time.time() - t0) / args.steps
        vc = float(jnp.mean(jnp.asarray(iters, jnp.float32)))
        print(f"varRo step/{solver}: {wall*1e3:.2f} ms/step = "
              f"{pts/wall:.3e} pts/s (vcycles {vc:.1f})")

    # solve-only timing (scan-chained)
    from msom_tpu.solvers import vary as vary_mod
    cfg, const, state, _ = build("spectral")
    q0 = state.q

    def schunk(q, W, n):
        import dataclasses
        data = dataclasses.replace(const.spec, W=W)
        def body(q, _):
            psi = vary_mod.solve_spectral_vary(data, q)
            return psi + 1e-12 * q, ()
        return jax.lax.scan(body, q, None, length=n)

    sj = jax.jit(schunk, static_argnums=2)
    n = 10
    q1, _ = sj(q0, const.spec.W, n)
    _ = float(q1[0, 0, 0])
    t0 = time.time()
    q1, _ = sj(q0 * 1.000001, const.spec.W, n)
    _ = float(q1[0, 0, 0])
    print(f"vary solve alone: {(time.time()-t0)/n*1e3:.2f} ms/solve")


if __name__ == "__main__":
    main()
