"""Micro-benchmark protocol for the tunneled (axon) TPU.

On this platform `block_until_ready` does NOT synchronize with device
execution and bulk fetches are slow; the only reliable clock is: dispatch ONE
jitted call that runs the op n times via lax.scan (chained through the carry),
fetch a device-computed SCALAR, and subtract the measured ~30 ms tunnel
round-trip latency.

Usage:
    from tools.ubench import timeit, roundtrip
    t_ms = timeit(fn, carry0, n=50)   # fn: carry -> carry (same pytree shape)
"""

import time

import jax
import jax.numpy as jnp


def roundtrip(samples: int = 3) -> float:
    """Tunnel round-trip latency in seconds (scalar fetch of a trivial op)."""
    @jax.jit
    def triv(x):
        return x + 1.0

    float(triv(jnp.float32(0.0)))
    ts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        float(triv(jnp.float32(0.0)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _scalar_of(tree):
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    return sum(jnp.sum(x[..., :1, :1].astype(jnp.float32)) for x in leaves
               if x.ndim >= 2) + sum(
                   jnp.sum(x.astype(jnp.float32)) for x in leaves
                   if x.ndim < 2)


def timeit(fn, carry0, *args, n: int = 50, rt: float | None = None,
           repeats: int = 3) -> float:
    """Per-iteration wall time (ms) of `fn: (carry, *args) -> carry`,
    measured as one jitted lax.scan of length n with a scalar fetch. Pass
    large read-only operands via *args (NOT via closure — closures bake them
    into the compile payload, which the remote-compile tunnel rejects)."""
    if rt is None:
        rt = roundtrip()

    @jax.jit
    def chain(c, *a):
        def body(c, _):
            return fn(c, *a), None
        c, _ = jax.lax.scan(body, c, None, length=n)
        return _scalar_of(c)

    float(chain(carry0, *args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chain(carry0, *args))
        best = min(best, time.perf_counter() - t0)
    return max(best - rt, 0.0) / n * 1e3
