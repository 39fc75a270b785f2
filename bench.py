"""Headline benchmark: msqg throughput in grid-points/s/chip.

Runs the flagship 2048^2 x 4-layer multi-layer QG configuration (BASELINE.md
north-star metric) as a lax.scan of full predictor-corrector steps (PV
inversion included) and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "grid-points/s/chip", "vs_baseline": r}

Both production solvers are measured and recorded in the same line:
  * spectral — exact direct modal inversion, DST as MXU matmuls
    (solvers/spectral.py); the headline `value` (fastest path).
  * mg       — the reference-parity multigrid at tol=1e-3 with the fused
    Pallas kernels (wall_s_per_step_mg); trajectory-equivalent to the
    reference's poisson_layer solve. --all adds the pure-XLA mg lowering.

vs_baseline: the reference publishes NO numbers (BASELINE.md), so the
denominator BASELINE_PTS_PER_S = 1.6e8 is an ESTIMATE of its documented
deployment scale (mpirun -np 16, msqg/qg.c:14, at ~1e7 cell-updates/s/core
for the ~10-Jacobian + multigrid workload). `baseline_is_estimate: true` is
recorded in the JSON; the ratio must not be read as a measured speedup over
the reference binary. Per-phase device timings + roofline accounting live in
PERF.md (tools/perf_phases.py).
"""

import argparse
import json
import os
import time

import jax

# Persistent compilation cache: compile of the 2048^2 scan through the remote
# TPU tunnel dominates wall time (~minutes); cache it on disk so repeat runs
# (including the driver's) start instantly.
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

BASELINE_PTS_PER_S = 1.6e8   # ESTIMATE, see module docstring


def build(N, nl, dtype, tol, solver="spectral", coupled=False):
    import numpy as np

    from msom_tpu.models import qg as m
    from msom_tpu.params import QGConfig

    # 4-layer variant of the Verron double-gyre scaled to N. `coupled` is
    # the multiple-scale configuration the msqg family exists for
    # (/root/reference/msqg/qg.h:287-393): large-scale PG streamfunction
    # coupling + bottom topography + 2 passive tracers, all running through
    # the fused Pallas RHS/tracer kernels (models/pallas_rhs.py).
    kw = {}
    ckw = {}
    if coupled:
        kw = dict(nptr=2, Pe=(1e3, 2e3), ptr_r=(100.0, 0.0))
    cfg = QGConfig(N=N, nl=nl, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                   Re4=1563 * (N / 256) ** 3, beta=0.5,
                   Fr=tuple([0.003] * (nl - 1)),
                   dh=tuple([1.0 / nl] * nl),
                   DT=5e-2, tend=1e9, dtout=1e9, CFL=0.6,
                   dtype=dtype, tol=tol, solver=solver, **kw).validate()
    if coupled:
        y = (np.arange(N) + 0.5) * cfg.delta
        gyre = np.sin(np.pi * y / cfg.L0)
        ckw = dict(
            psipg=0.01 * gyre[None, :, None] * np.ones((nl, N, N)),
            topo=0.05 * np.outer(gyre, np.sin(2 * np.pi * y / cfg.L0)))
    const = m.build_constants(cfg, **ckw)
    state = m.init_state(cfg, const, seed=0)
    step = m.make_step(cfg)

    def chunk(state, const, n):
        def body(s, _):
            s, d = step(s, const, jnp.asarray(1e18, s.t.dtype))
            return s, (d.dt, d.mg_iters)
        return jax.lax.scan(body, state, None, length=n)

    return cfg, const, state, jax.jit(chunk, static_argnums=2)


def measure(N, nl, dtype, tol, solver, steps, pallas_env=None, spinup=200,
            coupled=False):
    """(wall seconds per step, mean V-cycles per step) for one solver.

    PINNED PROTOCOL (the mg V-cycle count — and so its wall time — depends
    on how evolved the state is, so the timing state must be fixed):
    noise IC -> `spinup` integration steps (default 200; also serves as the
    compile+warmup) -> ONE timed chunk of `steps` steps on the spun-up
    state. The mean multigrid V-cycles/step over the timed chunk is
    recorded next to the wall time (spectral reports 0 — it is a direct
    solve). The timed call never repeats a byte-identical request (the
    axon tunnel memoizes identical computations)."""
    saved_pallas = os.environ.get("MSOM_PALLAS")
    if pallas_env is not None:
        os.environ["MSOM_PALLAS"] = pallas_env
    try:
        cfg, const, state, chunk = build(N, nl, dtype, tol, solver,
                                         coupled=coupled)
        # compile once at the timed chunk length, then finish the spin-up
        state, _ = chunk(state, const, steps)
        for _ in range(max(spinup - steps, 0) // steps):
            state, _ = chunk(state, const, steps)
        _ = float(state.q[0, 0, 0])
        t0 = time.time()
        state, (dts, iters) = chunk(state, const, steps)
        # force full materialization: block_until_ready on the axon tunnel
        # can return before remote completion, a scalar fetch cannot
        _ = float(state.q[0, 0, 0])
        wall = (time.time() - t0) / steps
        return wall, float(jnp.mean(jnp.asarray(iters, jnp.float32)))
    finally:
        if pallas_env is not None:
            if saved_pallas is None:
                os.environ.pop("MSOM_PALLAS", None)
            else:
                os.environ["MSOM_PALLAS"] = saved_pallas


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=2048)
    p.add_argument("--nl", type=int, default=4)
    p.add_argument("--steps", type=int, default=40,
                   help="steps per timed chunk (one ~25 ms tunnel round-trip "
                        "is amortized across the chunk)")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--dtype", default="float32")
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--solver", default="both",
                   choices=["spectral", "mg", "both"])
    p.add_argument("--all", action="store_true",
                   help="also bench the pure-XLA mg lowering")
    args = p.parse_args()
    if args.quick:
        args.N, args.steps = 512, 10

    spinup = 40 if args.quick else 200
    walls, vcycles = {}, {}
    if args.solver in ("spectral", "both"):
        walls["spectral"], vcycles["spectral"] = measure(
            args.N, args.nl, args.dtype, args.tol, "spectral", args.steps,
            spinup=spinup)
    if args.solver in ("mg", "both"):
        walls["mg"], vcycles["mg"] = measure(
            args.N, args.nl, args.dtype, args.tol, "mg", args.steps,
            spinup=spinup)
    if args.solver in ("spectral", "both"):
        # the coupled multiple-scale config (psipg + topo + 2 tracers) on
        # the fused kernels — the configuration class msqg exists for
        walls["coupled"], vcycles["coupled"] = measure(
            args.N, args.nl, args.dtype, args.tol, "spectral", args.steps,
            spinup=spinup, coupled=True)
    if args.all:
        walls["mg_xla"], vcycles["mg_xla"] = measure(
            args.N, args.nl, args.dtype, args.tol, "mg", args.steps,
            pallas_env="0", spinup=spinup)

    best_solver = min((k for k in walls if k != "coupled"),
                      key=walls.get)
    pts = args.N * args.N * args.nl
    value = pts / walls[best_solver]
    out = {
        "metric": f"msqg {args.N}^2 x {args.nl}-layer grid-points/s/chip",
        "value": value,
        "unit": "grid-points/s/chip",
        "vs_baseline": value / BASELINE_PTS_PER_S,
        "baseline_is_estimate": True,
        "solver": best_solver,
        "device": str(jax.devices()[0]),
    }
    out["protocol"] = (f"noise IC + {spinup}-step spin-up, timed over the "
                       f"next {args.steps} steps (see measure() docstring)")
    for k, w in walls.items():
        out[f"wall_s_per_step_{k}"] = w
        out[f"pts_per_s_{k}"] = pts / w
        if k.startswith("mg"):
            out[f"vcycles_per_step_{k}"] = vcycles[k]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
