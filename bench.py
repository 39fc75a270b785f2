"""Headline benchmark: msqg throughput in grid-points/s/chip.

Runs the flagship 2048^2 x 4-layer multi-layer QG configuration (BASELINE.md
north-star metric) as a lax.scan of full predictor-corrector steps (PV
inversion multigrid included) and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "grid-points/s/chip", "vs_baseline": r}

vs_baseline compares against BASELINE_PTS_PER_S, an estimate of the
reference's documented deployment scale (mpirun -np 16, msqg/qg.c:14): ~1e7
cell-updates/s/core for the ~10-Jacobian + multigrid workload x 16 ranks
= 1.6e8 pts/s. The reference publishes no numbers (BASELINE.md), so this
estimate is the documented stand-in.
"""

import argparse
import json
import os
import time

import jax

# Persistent compilation cache: compile of the 2048^2 scan through the remote
# TPU tunnel dominates wall time (~7 min measured for the 512^2 variant);
# cache it on disk so repeat runs (including the driver's) start instantly.
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

BASELINE_PTS_PER_S = 1.6e8


def build(N, nl, dtype, tol, solver="spectral"):
    from msom_tpu.models import qg as m
    from msom_tpu.params import QGConfig

    # 4-layer variant of the Verron double-gyre scaled to N. The PV inversion
    # defaults to the direct spectral solve (solvers/spectral.py): exact to
    # roundoff — strictly tighter than the reference's multigrid at tol=1e-3
    # (msqg/qg.h:159) — and faster; --solver mg benches the multigrid path.
    cfg = QGConfig(N=N, nl=nl, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                   Re4=1563 * (N / 256) ** 3, beta=0.5,
                   Fr=tuple([0.003] * (nl - 1)),
                   dh=tuple([1.0 / nl] * nl),
                   DT=5e-2, tend=1e9, dtout=1e9, CFL=0.6,
                   dtype=dtype, tol=tol, solver=solver).validate()
    const = m.build_constants(cfg)
    state = m.init_state(cfg, const, seed=0)
    step = m.make_step(cfg)

    def chunk(state, const, n):
        def body(s, _):
            s, d = step(s, const, jnp.asarray(1e18, s.t.dtype))
            return s, d.dt
        return jax.lax.scan(body, state, None, length=n)

    return cfg, const, state, jax.jit(chunk, static_argnums=2)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=2048)
    p.add_argument("--nl", type=int, default=4)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--dtype", default="float32")
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--solver", default="spectral", choices=["spectral", "mg"])
    args = p.parse_args()
    if args.quick:
        args.N, args.steps = 512, 10

    cfg, const, state, chunk = build(args.N, args.nl, args.dtype, args.tol,
                                     args.solver)

    # warmup + compile (same static step count as the timed call); the timed
    # call runs on the evolved state so no request is a byte-identical repeat
    # (the axon tunnel memoizes identical computations).
    state, _ = chunk(state, const, args.steps)
    _ = float(state.q[0, 0, 0])

    t0 = time.time()
    state, dts = chunk(state, const, args.steps)
    # force full materialization: block_until_ready on the axon tunnel can
    # return before remote completion, a scalar fetch cannot
    _ = float(state.q[0, 0, 0])
    wall = time.time() - t0

    pts = args.N * args.N * args.nl * args.steps
    value = pts / wall
    print(json.dumps({
        "metric": f"msqg {args.N}^2 x {args.nl}-layer grid-points/s/chip",
        "value": value,
        "unit": "grid-points/s/chip",
        "vs_baseline": value / BASELINE_PTS_PER_S,
        "wall_s_per_step": wall / args.steps,
        "solver": args.solver,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
