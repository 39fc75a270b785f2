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


def build(N, nl, dtype, tol, solver="spectral", coupled=False,
          stochastic=False):
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
    if stochastic:
        # deliverable 3: Euler-Maruyama eddy forcing (qg_stochastic.h)
        kw.update(stochastic=True, tr_stoch=50.0, amp_stoch=1e-6)
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
            coupled=False, stochastic=False):
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
                                         coupled=coupled,
                                         stochastic=stochastic)
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


def measure_rows(N, nl, dtype, tol, steps, spinup, coupled=False):
    """Wall s/step of the KERNEL-KEEPING sharded step (parallel/step.py
    rows fast path: fused Pallas kernels + pencil folded-DST) on a rows
    mesh over all local devices — 1x1 on the single bench chip, where
    every collective is the identity; the number quantifies the
    distribution-mode overhead relative to the unsharded step (VERDICT r5
    ask #1: must stay within ~1.3x)."""
    import numpy as np

    from msom_tpu.parallel.step import make_qg_step_sharded
    from jax.sharding import Mesh

    cfg, const, state, _ = build(N, nl, dtype, tol, "spectral",
                                 coupled=coupled)
    ndev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()).reshape(ndev, 1), ("y", "x"))
    step, place = make_qg_step_sharded(cfg, mesh, state, const)
    assert step.uses_kernels and step.uses_pencil, \
        "rows fast path did not engage"
    sp, cp = place(state), place(const)
    raw, sd = step.raw, step.sd

    def rchunk(s, c, sdl, n):
        def body(s, _):
            s, d = raw(s, c, sdl, jnp.asarray(1e18, s.t.dtype))
            return s, d.dt
        return jax.lax.scan(body, s, None, length=n)

    rj = jax.jit(rchunk, static_argnums=3)
    sp, _ = rj(sp, cp, sd, steps)
    for _ in range(max(spinup - steps, 0) // steps):
        sp, _ = rj(sp, cp, sd, steps)
    _ = float(sp.q[0, 0, 0])
    t0 = time.time()
    sp, _ = rj(sp, cp, sd, steps)
    _ = float(sp.q[0, 0, 0])
    return (time.time() - t0) / steps


def measure_node(N, nl, dtype, steps, spinup, masked=False):
    """(wall s/step, wall s/wavelet-filter) for the qg-node baroclinic
    family (BASELINE.json deliverable 5: nodal multi-layer at 2048^2 with
    wavelet diagnostics). Same pinned protocol as measure(). The wavelet
    filter is an EVENT (fires every dtflt, not every step) so it is timed
    separately. `masked`: a curved-coastline interior mask — the qg-node
    headline feature — routed through the fused masked vertex-sweep
    multigrid (solvers/pallas_vmg.py; VERDICT r5 #3)."""
    import numpy as np

    from msom_tpu.models import qg_node as node

    scale = N / 64
    cfg = node.NodeQGConfig(
        N=N, nl=nl, L0=100.0, f0=46.5, beta=0.5, hEkb=1e-3,
        tau0=1e-3, nu=5.0 / scale, dh=tuple([1.0 / nl] * nl),
        N2=tuple([1.0] * (nl - 1)), noise_init=1e-3, bc_fac=1.0,
        DT=5e-2, tend=1e18, dtout=1e18, CFL=0.2, TOLERANCE=1e-5,
        dtflt=1.0, Lfmax=30.0, Lfmin=10.0, dtype=dtype,
        **(dict(solver="vmg") if masked else {}))
    mask = None
    if masked:
        m = np.ones((N + 1, N + 1), np.float32)
        yv = np.linspace(0, 1, N + 1)
        coast = 0.15 + 0.08 * np.sin(3 * np.pi * yv) \
            + 0.05 * np.cos(7 * np.pi * yv)
        for j in range(N + 1):
            m[j, : int(coast[j] * N)] = 0.0
        m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = 0.0
        mask = m
    const = node.build_constants(cfg, mask=mask)
    state = node.init_state(cfg, const, seed=0)
    step = node.make_step(cfg)

    def chunk(state, const, n):
        def body(s, _):
            s, d = step(s, const, jnp.asarray(1e18, s.t.dtype))
            return s, d.dt
        return jax.lax.scan(body, state, None, length=n)

    chunk_j = jax.jit(chunk, static_argnums=2)
    state, _ = chunk_j(state, const, steps)
    for _ in range(max(spinup - steps, 0) // steps):
        state, _ = chunk_j(state, const, steps)
    _ = float(state.q[0, 0, 0])
    t0 = time.time()
    state, dts = chunk_j(state, const, steps)
    _ = float(state.q[0, 0, 0])
    wall = (time.time() - t0) / steps
    if masked:
        return wall, None

    # wavelet filter: scan-chained like the step (a single tunneled call
    # overstates by the ~25 ms RTT and per-call artifacts — a chained
    # measure reads 17.9 ms at 2048^2 where single calls read 70-400 ms)
    import dataclasses

    def filt_chunk(s, c, n):
        def body(s, _):
            s2 = node.wavelet_filter(cfg, c, s)
            return dataclasses.replace(s2, nbar=s.nbar), s2.t
        return jax.lax.scan(body, s, None, length=n)

    fj = jax.jit(filt_chunk, static_argnums=2)
    nf = 5
    s2, _ = fj(state, const, nf)
    _ = float(s2.psi_f[0, 0, 0])
    walls = []
    for rep in range(2):   # best-of-2: tunnel hiccups inflate single timings
        t0 = time.time()
        s2, _ = fj(dataclasses.replace(
            state, psi=state.psi * (1 + 1e-9 * (rep + 1))), const, nf)
        _ = float(s2.psi_f[0, 0, 0])
        walls.append((time.time() - t0) / nf)
    return wall, min(walls)


def measure_mspg(N, nl, dtype, steps, spinup):
    """Wall s/step for the mspg PG gyre (BASELINE.json deliverable 4) at
    the reference's canonical N=64 x nl=30 scale (mspg/params.in)."""
    from msom_tpu.models import mspg
    from msom_tpu.params import PGConfig

    cfg = PGConfig(N=N, nl=nl, ys=0.3, r=0.02, tau_s=3e-2, tau0=0.12,
                   kv=1e-4, kh=1e-4, omega=0.2, DT=1e-2, CFL=0.4,
                   tend=1e18, dtout=1e18, dtype=dtype)
    const = mspg.build_constants(cfg)
    state = mspg.init_state(cfg, const)
    step = mspg.make_step(cfg)

    def chunk(state, const, n):
        def body(s, _):
            s, d = step(s, const, jnp.asarray(1e18, s.t.dtype))
            return s, d.dt
        return jax.lax.scan(body, state, None, length=n)

    chunk_j = jax.jit(chunk, static_argnums=2)
    state, _ = chunk_j(state, const, steps)
    for _ in range(max(spinup - steps, 0) // steps):
        state, _ = chunk_j(state, const, steps)
    _ = float(state.b[0, 0, 0])
    t0 = time.time()
    state, dts = chunk_j(state, const, steps)
    _ = float(state.b[0, 0, 0])
    return (time.time() - t0) / steps


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
    p.add_argument("--no-families", action="store_true",
                   help="skip the qg-node / mspg / stochastic family rows")
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
    if args.solver in ("spectral", "both"):
        # the kernel-keeping SHARDED step on a rows mesh (1x1 here):
        # the distributed-mode cost of the same fast path
        walls["sharded_rows"] = measure_rows(
            args.N, args.nl, args.dtype, args.tol, args.steps,
            spinup=spinup)
        vcycles["sharded_rows"] = 0.0
    if args.all:
        walls["mg_xla"], vcycles["mg_xla"] = measure(
            args.N, args.nl, args.dtype, args.tol, "mg", args.steps,
            pallas_env="0", spinup=spinup)

    best_solver = min(
        (k for k in walls if k not in ("coupled", "sharded_rows")),
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

    if not args.no_families:
        # per-family hardware rows (BASELINE.json deliverables 3-5);
        # reduced step budgets keep the whole bench within the driver's
        # wall-time envelope
        node_N = 512 if args.quick else 2048
        w_node, w_flt = measure_node(node_N, 4, args.dtype,
                                     10 if args.quick else 20,
                                     20 if args.quick else 40)
        out["node_config"] = f"qg-node {node_N}^2 x 4-layer baroclinic"
        out["wall_s_per_step_node"] = w_node
        out["pts_per_s_node"] = node_N * node_N * 4 / w_node
        out["wall_s_per_filter_node"] = w_flt
        # masked coastline at the same scale (fused masked vertex sweeps)
        # warm trajectory (the V-cycle count is state-dependent: 100-step
        # spin-up settles it at 2.0/step, the PERF.md r5 protocol)
        w_nm, _ = measure_node(node_N, 4, args.dtype,
                               5 if args.quick else 10,
                               10 if args.quick else 100, masked=True)
        out["node_masked_config"] = (f"qg-node {node_N}^2 x 4 coastline-"
                                     "masked (vmg + fused masked sweeps)")
        out["wall_s_per_step_node_masked"] = w_nm
        out["pts_per_s_node_masked"] = node_N * node_N * 4 / w_nm
        w_pg = measure_mspg(64, 30, args.dtype, 20 if args.quick else 60,
                            40 if args.quick else 120)
        out["mspg_config"] = "mspg 64^2 x 30-sigma gyre (reference params.in)"
        out["wall_s_per_step_mspg"] = w_pg
        out["pts_per_s_mspg"] = 64 * 64 * 30 / w_pg
        st_N = 512 if args.quick else 1024
        w_st, _ = measure(st_N, 4, args.dtype, args.tol, "spectral",
                          10 if args.quick else 20,
                          spinup=20 if args.quick else 60, coupled=False,
                          stochastic=True)
        out["stoch_config"] = f"msqg {st_N}^2 x 4-layer stochastic"
        out["wall_s_per_step_stoch"] = w_st
        out["pts_per_s_stoch"] = st_N * st_N * 4 / w_st
    print(json.dumps(out))


if __name__ == "__main__":
    main()
