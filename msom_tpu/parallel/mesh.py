"""Device-mesh domain decomposition.

The reference scales by 2-D Cartesian MPI decomposition of the N x N grid
with 1-cell halos exchanged in `boundary()` after every stencil (SURVEY.md
§2.5, /root/reference/msqg/qg.c:12-14). The TPU-native equivalent: a 2-D
`jax.sharding.Mesh` over the chip slice with fields sharded
PartitionSpec(None, 'y', 'x') — layers replicated, horizontal tiles per
device. The model code is written in global view; XLA's SPMD partitioner
turns the functional pad/shift stencils into halo exchanges over ICI and the
max/sum reductions into collectives, including on every multigrid level
(coarse levels smaller than the mesh are handled by GSPMD's automatic
resharding; see msom_tpu.solvers.mg).

Multi-host: the same code runs under jax.distributed.initialize with a
global mesh spanning hosts; DCN handles the inter-host edges of the same
collectives.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """2-D ('y', 'x') mesh as square as possible over the given devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    my = 1
    for cand in range(int(np.sqrt(n)), 0, -1):
        if n % cand == 0:
            my = cand
            break
    mx = n // my
    return Mesh(np.array(devices).reshape(my, mx), ("y", "x"))


def field_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for a (..., ny, nx) field: horizontal split, rest replicated."""
    spec = [None] * (ndim - 2) + ["y", "x"]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_model(mesh: Mesh, tree, grid_n: int):
    """Place every (..., N, N) leaf of a state/constants pytree with the
    horizontal domain-decomposition sharding; everything else replicated.

    Multigrid-level coefficient fields coarser than N are also sharded as
    long as each device keeps at least a 1-cell tile; below that they are
    replicated (the coarse-grid strategy for levels smaller than the mesh,
    SURVEY.md §2.5 'multilevel communication')."""
    my, mx = mesh.devices.shape

    def place(x):
        if not hasattr(x, "ndim") or x.ndim < 2:
            return jax.device_put(x, replicated(mesh))
        ny, nx = x.shape[-2], x.shape[-1]
        if ny % my == 0 and nx % mx == 0 and ny >= my and nx >= mx:
            return jax.device_put(x, field_sharding(mesh, x.ndim))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(place, tree)
