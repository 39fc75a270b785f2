"""Single-chip cost delta of the halo/compute overlap forms (PERF.md).

Runs the explicit shard_map msqg step (solver=mg) on a 1x1 mesh on the real
TPU chip with MSOM_HALO_OVERLAP=0 (bulk-synchronous neighbor sums) and =1
(interior from local rolls + ghost-rim patch, parallel/halo.py), and prints
the per-step wall time of each. On one chip the ppermutes are no-ops, so
the delta isolates the pure restructuring cost of the overlapped form (the
multi-chip transfer-hiding benefit needs real ICI and is deferred to
hardware — VERDICT r2 item 5 protocol).

Run: python tools/overlap_delta.py [--N 2048] [--steps 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def build(N, nl, solver):
    from msom_tpu.models import qg as m
    from msom_tpu.params import QGConfig

    cfg = QGConfig(N=N, nl=nl, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                   Re4=1563 * (N / 256) ** 3, beta=0.5,
                   Fr=tuple([0.003] * (nl - 1)), dh=tuple([1.0 / nl] * nl),
                   DT=5e-2, tend=1e9, dtout=1e9, CFL=0.6,
                   dtype="float32", tol=1e-3, solver=solver).validate()
    const = m.build_constants(cfg)
    state = m.init_state(cfg, const, seed=0)
    return cfg, const, state


def run(overlap, N, nl, steps, solver="mg"):
    os.environ["MSOM_HALO_OVERLAP"] = "1" if overlap else "0"
    from msom_tpu.parallel.step import make_qg_step_sharded

    cfg, const, state = build(N, nl, solver)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("y", "x"))
    step, place = make_qg_step_sharded(cfg, mesh, state, const)
    s, c = place(state), place(const)

    def chunk(s, c):
        def body(s, _):
            s, d = step(s, c, jnp.asarray(1e18, s.t.dtype))
            return s, d.dt
        return jax.lax.scan(body, s, None, length=steps)

    f = jax.jit(chunk)
    s, _ = f(s, c)                       # compile + warm/spin
    _ = float(s.q[0, 0, 0])
    s, _ = f(s, c)
    _ = float(s.q[0, 0, 0])
    t0 = time.time()
    s, _ = f(s, c)
    _ = float(s.q[0, 0, 0])
    return (time.time() - t0) / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=2048)
    p.add_argument("--nl", type=int, default=4)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--solver", default="mg",
                   choices=["mg", "spectral", "both"])
    args = p.parse_args()
    solvers = ["mg", "spectral"] if args.solver == "both" else [args.solver]
    for solver in solvers:
        w_sync = run(False, args.N, args.nl, args.steps, solver)
        w_over = run(True, args.N, args.nl, args.steps, solver)
        print(f"shard_map {solver} step {args.N}^2 x {args.nl}, 1x1 mesh:",
              flush=True)
        print(f"  bulk-synchronous: {w_sync * 1e3:.2f} ms/step", flush=True)
        print(f"  overlapped:       {w_over * 1e3:.2f} ms/step "
              f"(delta {100 * (w_over - w_sync) / w_sync:+.1f}%)",
              flush=True)


if __name__ == "__main__":
    main()
