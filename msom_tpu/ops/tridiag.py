"""Batched tridiagonal (Thomas) solves over the layer axis.

The reference performs a scalar Thomas solve per cell inside hot loops
(/root/reference/msqg/poisson_layer.h:137-146, /root/reference/mspg/pg.h:493-506).
Here the vertical dimension is small and static (nl <= ~30), so the
elimination is unrolled over layers and vectorized over all (ny, nx) cells at
once — pure VPU work, deterministic, order-independent.
"""

from __future__ import annotations

import jax.numpy as jnp


def thomas(t0: jnp.ndarray, t1: jnp.ndarray, t2: jnp.ndarray,
           rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve t0[l]*x[l-1] + t1[l]*x[l] + t2[l]*x[l+1] = rhs[l] for each cell.

    All inputs have shape (nl, ...). The layer loop is unrolled (nl is
    static); every step is a batched elementwise op over the trailing axes.
    """
    cp, im = factor(t0, t1, t2)
    return solve_factored(cp, im, t0, rhs)


def thomas_scan(t0: jnp.ndarray, t1: jnp.ndarray, t2: jnp.ndarray,
                rhs: jnp.ndarray) -> jnp.ndarray:
    """Thomas solve along axis 0 via lax.scan — for long systems (e.g. the
    4N-point perimeter circulation BC, /root/reference/mspg/pg.h:78-163)
    where unrolling would bloat the program."""
    import jax

    def fwd(carry, row):
        cp_prev, dp_prev = carry
        a, b, c, d = row
        m = b - a * cp_prev
        cp = c / m
        dp = (d - a * dp_prev) / m
        return (cp, dp), (cp, dp)

    z = jnp.zeros_like(t1[0])
    _, (cp, dp) = jax.lax.scan(fwd, (z, z), (t0, t1, t2, rhs))

    def bwd(x_next, row):
        cp_l, dp_l = row
        x = dp_l - cp_l * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, z, (cp, dp), reverse=True)
    return xs


def factor(t0: jnp.ndarray, t1: jnp.ndarray, t2: jnp.ndarray):
    """Precompute the Thomas elimination factors (cp, inv_m) so repeated
    solves with the same matrix (e.g. every multigrid relaxation sweep on a
    level) only do the rhs sweep. m[l] = t1[l] - t0[l]*cp[l-1];
    cp[l] = t2[l]/m[l]; inv_m = 1/m."""
    nl = t1.shape[0]
    im = [1.0 / t1[0]]
    cp = [t2[0] * im[0]]
    for l in range(1, nl):
        m = t1[l] - t0[l] * cp[-1]
        im.append(1.0 / m)
        cp.append(t2[l] * im[-1])
    return jnp.stack(cp, axis=0), jnp.stack(im, axis=0)


def solve_factored(cp: jnp.ndarray, im: jnp.ndarray, t0: jnp.ndarray,
                   rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve with precomputed factors from `factor` (same t0)."""
    nl = rhs.shape[0]
    dp = [rhs[0] * im[0]]
    for l in range(1, nl):
        dp.append((rhs[l] - t0[l] * dp[-1]) * im[l])
    x = [dp[-1]]
    for l in range(nl - 2, -1, -1):
        x.append(dp[l] - cp[l] * x[-1])
    x.reverse()
    return jnp.stack(x, axis=0)
