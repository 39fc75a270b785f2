"""Masked qg-node inversion at scale (VERDICT r5 #3): reproduce/fix the
vmg 2048^2 OOM and bench a masked coastline config."""

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


def coastline_mask(N):
    """Interior mask with a curved 'coastline' carved out of the west side
    (plus the standard zero boundary ring) — the qg-node headline feature
    (qg_baroclinic_ms.h mask machinery)."""
    m = np.ones((N + 1, N + 1), np.float32)
    y = np.linspace(0, 1, N + 1)
    coast = 0.15 + 0.08 * np.sin(3 * np.pi * y) + 0.05 * np.cos(7 * np.pi * y)
    for j in range(N + 1):
        m[j, : int(coast[j] * N)] = 0.0
    m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = 0.0
    return m


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=2048)
    p.add_argument("--nl", type=int, default=4)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--spinup", type=int, default=20)
    p.add_argument("--masked", action="store_true")
    args = p.parse_args()

    from msom_tpu.models import qg_node as node

    N, nl = args.N, args.nl
    scale = N / 64
    cfg = node.NodeQGConfig(
        N=N, nl=nl, L0=100.0, f0=46.5, beta=0.5, hEkb=1e-3,
        tau0=1e-3, nu=5.0 / scale, dh=tuple([1.0 / nl] * nl),
        N2=tuple([1.0] * (nl - 1)), noise_init=1e-3, bc_fac=1.0,
        DT=5e-2, tend=1e18, dtout=1e18, CFL=0.2, TOLERANCE=1e-5,
        solver="vmg", dtype="float32")
    mask = coastline_mask(N) if args.masked else None
    t0 = time.time()
    const = node.build_constants(cfg, mask=mask)
    state = node.init_state(cfg, const, seed=0)
    print(f"build: {time.time()-t0:.1f}s  masked={args.masked}")
    step = node.make_step(cfg)

    def chunk(s, c, n):
        def body(s, _):
            s, d = step(s, c, jnp.asarray(1e18, s.t.dtype))
            return s, (d.dt, d.mg_iters)
        return jax.lax.scan(body, s, None, length=n)

    cj = jax.jit(chunk, static_argnums=2)
    t0 = time.time()
    state, _ = cj(state, const, args.steps)
    _ = float(state.q[0, 0, 0])
    print(f"compile+first: {time.time()-t0:.1f}s")
    for _ in range(max(args.spinup - args.steps, 0) // args.steps):
        state, _ = cj(state, const, args.steps)
    _ = float(state.q[0, 0, 0])
    t0 = time.time()
    state, (dts, iters) = cj(state, const, args.steps)
    _ = float(state.q[0, 0, 0])
    wall = (time.time() - t0) / args.steps
    pts = N * N * nl
    print(f"vmg step ({'masked' if args.masked else 'unmasked'}): "
          f"{wall*1e3:.2f} ms/step = {pts/wall:.3e} pts/s "
          f"(vcycles {float(jnp.mean(jnp.asarray(iters, jnp.float32))):.1f})")


if __name__ == "__main__":
    main()
