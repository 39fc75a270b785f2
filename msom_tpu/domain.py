"""Grid descriptor for the cell-centered square domain.

The reference uses Basilisk's multigrid Cartesian grid: `init_grid(N);
size(L0)` (see /root/reference/msqg/qg.c:45-46) gives an N x N grid of cells
of size Delta = L0/N, cell centers at (i + 1/2) * Delta from the origin, and a
power-of-two level hierarchy (level d has 2^d x 2^d cells) used by the
multigrid solver and the wavelet filter.

Here the grid is a static (hashable) descriptor; fields are plain arrays of
shape (..., ny, nx) with NO ghost cells — boundary conditions are applied
functionally (see msom_tpu.ops.bc).

Array axis convention: axis -1 is x (TPU lanes), axis -2 is y (sublanes).
A Basilisk stencil offset `f[a, b]` (a = x-offset, b = y-offset) maps to
`field[..., j + b, i + a]`.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Grid:
    """Static descriptor of the horizontal grid + vertical layer count.

    Attributes:
      N: number of cells per horizontal direction (power of two for multigrid).
      nl: number of vertical layers.
      L0: physical domain size (square domain, side L0).
      x0, y0: coordinates of the lower-left domain corner (Basilisk `origin()`,
        used by mspg which shifts the origin to (0, ys), /root/reference/mspg/pg.c:97).
    """

    N: int
    nl: int = 1
    L0: float = 1.0
    x0: float = 0.0
    y0: float = 0.0

    @property
    def delta(self) -> float:
        return self.L0 / self.N

    @property
    def depth(self) -> int:
        """Finest multigrid level: level d has 2^d cells per side (N = 2^depth)."""
        d = int(round(math.log2(self.N)))
        if 2**d != self.N:
            raise ValueError(f"N={self.N} must be a power of two for multigrid")
        return d

    def delta_at(self, level: int) -> float:
        """Cell size at a multigrid/wavelet hierarchy level."""
        return self.L0 / (2**level)

    def xc(self, dtype=jnp.float32) -> jnp.ndarray:
        """1-D x cell-center coordinates, shape (N,)."""
        return (np.arange(self.N, dtype=np.float64) + 0.5) * self.delta + self.x0

    def yc(self, dtype=jnp.float32) -> jnp.ndarray:
        """1-D y cell-center coordinates, shape (N,)."""
        return (np.arange(self.N, dtype=np.float64) + 0.5) * self.delta + self.y0

    def mesh_coords(self, dtype=jnp.float32):
        """(X, Y) 2-D cell-center coordinate arrays of shape (N, N)."""
        x = np.asarray(self.xc(), np.float64)
        y = np.asarray(self.yc(), np.float64)
        X, Y = np.meshgrid(x, y, indexing="xy")  # X[j,i] = x_i, Y[j,i] = y_j
        return jnp.asarray(X, dtype), jnp.asarray(Y, dtype)

    def coords_at(self, level: int):
        """Cell-center coordinates (X, Y) at a coarser hierarchy level (numpy)."""
        n = 2**level
        d = self.L0 / n
        x = (np.arange(n, dtype=np.float64) + 0.5) * d + self.x0
        y = (np.arange(n, dtype=np.float64) + 0.5) * d + self.y0
        return np.meshgrid(x, y, indexing="xy")
