"""Vertex-grid (nodal) operators for the qg-node model family.

Fields live on the (N+1)x(N+1) cell corners; boundary nodes lie exactly on
the walls and carry BC values (psi = psi_bc, q/zeta from the partial-slip
relation — set_bc, /root/reference/qg-node/qg.h:197-226), and the interior
mask (1 inside, 0 on boundary nodes, /root/reference/qg-node/qg.h:422-431)
multiplies every tendency.

Because boundary nodes are IN the array, interior stencils need no ghost
cells: a full (N+1)^2 array is its own "padded" array, and the stencil ops
from msom_tpu.ops.stencil apply directly (their interior is the (N-1)^2
interior nodes). The vertex hierarchy (level l has 2^l+1 nodes per side)
gets its own restriction/prolongation pair mirroring my_vertex.h.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def interior(a):
    """(N-1)^2 interior-node view of a vertex array."""
    return a[..., 1:-1, 1:-1]


def set_ring(a, left, right, bottom, top, corners=0.0):
    """Overwrite the boundary ring. left/right/... may be scalars or 1-D
    arrays of length N-1 (non-corner boundary nodes)."""
    a = a.at[..., 1:-1, 0].set(left)
    a = a.at[..., 1:-1, -1].set(right)
    a = a.at[..., 0, 1:-1].set(bottom)
    a = a.at[..., -1, 1:-1].set(top)
    a = a.at[..., 0, 0].set(corners)
    a = a.at[..., 0, -1].set(corners)
    a = a.at[..., -1, 0].set(corners)
    a = a.at[..., -1, -1].set(corners)
    return a


def bc_psi(psi, psi_bc=0.0):
    """psi = psi_bc on all boundary nodes (set_bc, qg.h:202-205)."""
    return set_ring(psi, psi_bc, psi_bc, psi_bc, psi_bc, psi_bc)


def bc_deriv(field, psi, bc_fac, delta, psi_bc=0.0):
    """Vorticity-like boundary nodes from the partial-slip relation
    (qg.h:211-214, set_bc_ms qg_baroclinic_ms.h:61-69):
    value = 2*bc_fac/Delta^2 * (first_interior(psi) - psi_bc).
    bc_fac = 0 -> free slip (zeta = 0 on walls), 1 -> no slip."""
    c = 2.0 * bc_fac / (delta * delta)
    return set_ring(field,
                    c * (psi[..., 1:-1, 1] - psi_bc),
                    c * (psi[..., 1:-1, -2] - psi_bc),
                    c * (psi[..., 1, 1:-1] - psi_bc),
                    c * (psi[..., -2, 1:-1] - psi_bc),
                    0.0)


def bc_deriv_rel(field, parent, bc_fac, delta):
    """set_bc_ms's SECOND-derived-field ring relation (the biharmonic
    intermediate, qg_baroclinic_ms.h:67-69): ring value =
    2*bc_fac/Delta^2 * (first_interior(parent) - parent_ring) — "first
    interior point minus boundary point", where the parent's own ring
    value (e.g. zeta's slip ring, nonzero for bc_fac > 0) is subtracted,
    unlike bc_deriv's scalar psi_bc."""
    c = 2.0 * bc_fac / (delta * delta)
    return set_ring(field,
                    c * (parent[..., 1:-1, 1] - parent[..., 1:-1, 0]),
                    c * (parent[..., 1:-1, -2] - parent[..., 1:-1, -1]),
                    c * (parent[..., 1, 1:-1] - parent[..., 0, 1:-1]),
                    c * (parent[..., -2, 1:-1] - parent[..., -1, 1:-1]),
                    0.0)


def default_mask(N, dtype=jnp.float32):
    """1 at interior nodes, 0 on the boundary ring (qg.h:422-431)."""
    m = np.ones((N + 1, N + 1))
    m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = 0.0
    return jnp.asarray(m, dtype)


# ---------------------------------------------------------------------------
# vertex hierarchy transfer operators (my_vertex.h)
# ---------------------------------------------------------------------------

def _decimate2(x):
    """Even-index stride-2 subsample of the last two (ODD-length) axes via
    pad + reshape instead of a strided slice. Value-identical to
    x[..., ::2, ::2]; exists because the strided-slice lowering faults the
    XLA:TPU backend ('TPU worker crashed', kernel fault class) when two
    multigrid while-loops containing it at (4, 2049, 2049) share one
    program — the root cause of the r4 '2048^2 vmg OOM/crash' (bisected in
    r5; the reshape form compiles and runs the full 11-level solver)."""
    s = x.shape
    if s[-1] % 2 == 0 or s[-2] % 2 == 0:
        return x[..., ::2, ::2]   # even lengths: not the faulting pattern
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, 1), (0, 1)])
    x = x.reshape(*s[:-2], (s[-2] + 1) // 2, 2, s[-1] + 1)[..., 0, :]
    return x.reshape(*x.shape[:-1], (s[-1] + 1) // 2, 2)[..., 0]


def vrestrict_inject(f):
    """restriction_vert (my_vertex.h:49-51): coarse node = co-located fine."""
    return _decimate2(f)


def vrestrict_weighted(f):
    """restriction_coarsen_vert (my_vertex.h:55-62):
    coarse = (2C + E + W + N + S)/6 of the co-located fine node; missing
    neighbours at the domain edge count as zero (residual BCs are zero,
    nodal-poisson.h:46-50)."""
    z = jnp.zeros_like(f[..., :1, :])
    fy = jnp.concatenate([z, f, z], axis=-2)
    z2 = jnp.zeros_like(fy[..., :, :1])
    fp = jnp.concatenate([z2, fy, z2], axis=-1)
    C = fp[..., 1:-1, 1:-1]
    E = fp[..., 1:-1, 2:]
    W = fp[..., 1:-1, :-2]
    Nn = fp[..., 2:, 1:-1]
    S = fp[..., :-2, 1:-1]
    out = (2 * C + E + W + Nn + S) / 6.0
    return _decimate2(out)


def vrestrict_weighted16(f):
    """restriction_coarsen_vert2 (my_vertex.h:65-75), used for the mask:
    (4C + 2(E+W+N+S) + corners)/16 with zero beyond the edge."""
    z = jnp.zeros_like(f[..., :1, :])
    fy = jnp.concatenate([z, f, z], axis=-2)
    z2 = jnp.zeros_like(fy[..., :, :1])
    fp = jnp.concatenate([z2, fy, z2], axis=-1)
    C = fp[..., 1:-1, 1:-1]
    E, W = fp[..., 1:-1, 2:], fp[..., 1:-1, :-2]
    Nn, S = fp[..., 2:, 1:-1], fp[..., :-2, 1:-1]
    NE, NW = fp[..., 2:, 2:], fp[..., 2:, :-2]
    SE, SW = fp[..., :-2, 2:], fp[..., :-2, :-2]
    out = (4 * C + 2 * (E + W + Nn + S) + NE + NW + SE + SW) / 16.0
    return _decimate2(out)


def vprolong(c):
    """refine_vert (my_vertex.h:82-105): injection at co-located nodes,
    2-point average at edge midpoints, 4-point average at centers.
    (..., n, n) -> (..., 2n-1, 2n-1).

    Built by stack/reshape INTERLEAVING, not strided .at[::2].set
    scatters: the four-scatter form costs 350 ms at (4, 1025) -> (4, 2049)
    on TPU v5e (it dominated the whole nodal V-cycle, PERF.md r5); the
    interleave form is a few fused copies."""
    n = c.shape[-1]
    xm = 0.5 * (c[..., :, :-1] + c[..., :, 1:])
    ym = 0.5 * (c[..., :-1, :] + c[..., 1:, :])
    cm = 0.25 * (c[..., :-1, :-1] + c[..., :-1, 1:]
                 + c[..., 1:, :-1] + c[..., 1:, 1:])

    def ilx(a, m):
        """Interleave columns: a (..., r, k), m (..., r, k-1) ->
        (..., r, 2k-1) = [a0, m0, a1, m1, ..., a_{k-1}]."""
        body = jnp.stack([a[..., :-1], m], axis=-1)
        body = body.reshape(*a.shape[:-1], 2 * (a.shape[-1] - 1))
        return jnp.concatenate([body, a[..., -1:]], axis=-1)

    even = ilx(c, xm)                         # (..., n, 2n-1)
    odd = ilx(ym, cm)                         # (..., n-1, 2n-1)
    body = jnp.stack([even[..., :-1, :], odd], axis=-2)
    body = body.reshape(*even.shape[:-2], 2 * (n - 1), even.shape[-1])
    return jnp.concatenate([body, even[..., -1:, :]], axis=-2)
