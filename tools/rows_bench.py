"""Hardware measurement: kernel-keeping rows-sharded step on a 1x1 mesh vs
the unsharded step (VERDICT r5 ask #1 'done' criterion: within ~1.3x of the
unsharded fast step). Runs on the real TPU chip; scan-chained, pinned
protocol as bench.py."""

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
from jax.sharding import Mesh


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=2048)
    p.add_argument("--nl", type=int, default=4)
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--spinup", type=int, default=200)
    p.add_argument("--coupled", action="store_true")
    p.add_argument("--dtype", default="float32")
    args = p.parse_args()

    import bench
    from msom_tpu.parallel.step import make_qg_step_sharded

    cfg, const, state, chunk = bench.build(args.N, args.nl, args.dtype,
                                           1e-3, "spectral",
                                           coupled=args.coupled)
    ndev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()).reshape(ndev, 1), ("y", "x"))
    step, place = make_qg_step_sharded(cfg, mesh, state, const)
    print("uses_kernels:", step.uses_kernels, "pencil:", step.uses_pencil,
          "mesh:", mesh.devices.shape)
    assert step.uses_kernels and step.uses_pencil
    sp, cp = place(state), place(const)
    raw, sd = step.raw, step.sd

    def rchunk(s, c, sdl, n):
        def body(s, _):
            s, d = raw(s, c, sdl, jnp.asarray(1e18, s.t.dtype))
            return s, d.dt
        return jax.lax.scan(body, s, None, length=n)

    rj = jax.jit(rchunk, static_argnums=3)
    t0 = time.time()
    sp, _ = rj(sp, cp, sd, args.steps)
    _ = float(sp.q[0, 0, 0])
    print(f"compile+first chunk: {time.time()-t0:.1f}s")
    for _ in range(max(args.spinup - args.steps, 0) // args.steps):
        sp, _ = rj(sp, cp, sd, args.steps)
    _ = float(sp.q[0, 0, 0])
    t0 = time.time()
    sp, dts = rj(sp, cp, sd, args.steps)
    _ = float(sp.q[0, 0, 0])
    wall = (time.time() - t0) / args.steps
    pts = args.N * args.N * args.nl
    print(f"rows-sharded step ({mesh.devices.shape[0]}x1 mesh): "
          f"{wall*1e3:.2f} ms/step = {pts/wall:.3e} pts/s")

    # unsharded comparator (same protocol, same session)
    cfg2, const2, state2, chunk2 = bench.build(args.N, args.nl, args.dtype,
                                               1e-3, "spectral",
                                               coupled=args.coupled)
    state2, _ = chunk2(state2, const2, args.steps)
    for _ in range(max(args.spinup - args.steps, 0) // args.steps):
        state2, _ = chunk2(state2, const2, args.steps)
    _ = float(state2.q[0, 0, 0])
    t0 = time.time()
    state2, _ = chunk2(state2, const2, args.steps)
    _ = float(state2.q[0, 0, 0])
    wall2 = (time.time() - t0) / args.steps
    print(f"unsharded step: {wall2*1e3:.2f} ms/step = {pts/wall2:.3e} pts/s"
          f" | rows/unsharded = {wall/wall2:.3f}x")


if __name__ == "__main__":
    main()
