"""Roll-based ghosted stencil views — the TPU-fast boundary machinery.

The naive functional-pad approach (concatenate one ghost cell per side)
produces (N+2, N+2) arrays that break the TPU's (8,128) tiled layout: every
downstream shifted slice is lane-unaligned and XLA inserts relayout copies
(~12x slowdown measured at 2048^2). Here a field stays at its aligned
(N, N) shape; a neighbor view shift(dj, di) is a lane/sublane ROLL plus an
edge-vector overwrite, and ghost values live in explicit edge vectors:

  gl, gr: (..., N) ghost columns;  gb, gt: (..., N+2) ghost rows INCLUDING
  corner ghosts — so diagonal neighbors (the Arakawa corners) are exact,
  reproducing the sequential x-then-y boundary application of the reference
  (msom_tpu.ops.bc.pad semantics, Basilisk boundary()).

Boundary physics is identical to ops/bc.py; only the data movement changed.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from msom_tpu.ops.bc import BC


@dataclasses.dataclass(frozen=True)
class Ghosted:
    """An (..., N, N) field plus its ghost edge vectors."""
    a: jnp.ndarray
    gl: jnp.ndarray   # (..., N) left ghost column
    gr: jnp.ndarray
    gb: jnp.ndarray   # (..., N+2) bottom ghost row incl. corners
    gt: jnp.ndarray

    def __getitem__(self, idx):
        """Slice leading (layer) axes, keeping the ghost structure."""
        return Ghosted(self.a[idx], self.gl[idx], self.gr[idx],
                       self.gb[idx], self.gt[idx])

    def shift(self, dj: int, di: int) -> jnp.ndarray:
        """out[j, i] = extended[j + dj, i + di], |dj|,|di| <= 1."""
        a = self.a
        out = a
        if di == 1:
            out = jnp.roll(out, -1, axis=-1)
            out = out.at[..., :, -1].set(self.gr)
        elif di == -1:
            out = jnp.roll(out, 1, axis=-1)
            out = out.at[..., :, 0].set(self.gl)
        if dj == 1:
            row = self.gt[..., 1 + di:1 + di + a.shape[-1]]
            out = jnp.roll(out, -1, axis=-2)
            out = out.at[..., -1, :].set(row)
        elif dj == -1:
            row = self.gb[..., 1 + di:1 + di + a.shape[-1]]
            out = jnp.roll(out, 1, axis=-2)
            out = out.at[..., 0, :].set(row)
        return out

    def padded(self) -> jnp.ndarray:
        """Materialize the (..., N+2, N+2) padded array (slow path, used by
        the coarse-grid/wavelet code where shapes are small)."""
        a = self.a
        mid = jnp.concatenate([self.gl[..., :, None], a,
                               self.gr[..., :, None]], axis=-1)
        return jnp.concatenate([self.gb[..., None, :], mid,
                                self.gt[..., None, :]], axis=-2)


jax.tree_util.register_dataclass(
    Ghosted, data_fields=["a", "gl", "gr", "gb", "gt"], meta_fields=[])


def ghosted_from_padded(pp: jnp.ndarray) -> Ghosted:
    """Build a Ghosted view from an explicitly padded (..., N+2, N+2) array
    (used for the custom large-scale-psi ghosts, msqg/qg.h:1105-1114)."""
    return Ghosted(a=pp[..., 1:-1, 1:-1], gl=pp[..., 1:-1, 0],
                   gr=pp[..., 1:-1, -1], gb=pp[..., 0, :], gt=pp[..., -1, :])


def ghosted(a: jnp.ndarray, bc: BC) -> Ghosted:
    """Standard BCs (dirichlet half-cell / neumann / periodic) — same values
    as ops.bc.pad."""
    if bc is BC.PERIODIC:
        gl = a[..., :, -1]
        gr = a[..., :, 0]
        row_b = a[..., -1, :]
        row_t = a[..., 0, :]
        gb = jnp.concatenate([gl[..., -1:], row_b, gr[..., -1:]], axis=-1)
        gt = jnp.concatenate([gl[..., :1], row_t, gr[..., :1]], axis=-1)
        return Ghosted(a, gl, gr, gb, gt)
    sign = -1.0 if bc is BC.DIRICHLET else 1.0
    gl = sign * a[..., :, 0]
    gr = sign * a[..., :, -1]
    # ghost rows = sign * (row adjacent incl. its x-ghosts)
    row_b = jnp.concatenate([gl[..., :1], a[..., 0, :], gr[..., :1]], axis=-1)
    row_t = jnp.concatenate([gl[..., -1:], a[..., -1, :], gr[..., -1:]],
                            axis=-1)
    return Ghosted(a, gl, gr, sign * row_b, sign * row_t)


def ghosted_slip(zeta: jnp.ndarray, psi: Ghosted, sbc: float,
                 delta: float) -> Ghosted:
    """Partial-slip ghosts for a Laplacian-derived field: edge ghosts
    c*(psi_in - psi_ghost) with c = sbc/((0.5*sbc+1)*Delta^2); corner ghosts
    keep the Dirichlet fill (+interior corner) — exactly
    ops.bc.pad_zeta_slip (/root/reference/msqg/qg.h:185-198)."""
    if sbc <= 0:
        return ghosted(zeta, BC.DIRICHLET)
    base = ghosted(zeta, BC.DIRICHLET)
    c = sbc / ((0.5 * sbc + 1.0) * delta * delta)
    p = psi.a
    gl = c * (p[..., :, 0] - psi.gl)
    gr = c * (p[..., :, -1] - psi.gr)
    row_b = c * (p[..., 0, :] - psi.gb[..., 1:-1])
    row_t = c * (p[..., -1, :] - psi.gt[..., 1:-1])
    gb = jnp.concatenate([base.gb[..., :1], row_b, base.gb[..., -1:]], -1)
    gt = jnp.concatenate([base.gt[..., :1], row_t, base.gt[..., -1:]], -1)
    return Ghosted(zeta, gl, gr, gb, gt)


# ---------------------------------------------------------------------------
# stencil operators on Ghosted fields (same math as ops.stencil)
# ---------------------------------------------------------------------------

def laplacian_g(g: Ghosted, delta: float) -> jnp.ndarray:
    return (g.shift(0, 1) + g.shift(0, -1) + g.shift(1, 0) + g.shift(-1, 0)
            - 4.0 * g.a) / (delta * delta)


def neighbor_sum(g: Ghosted) -> jnp.ndarray:
    return g.shift(0, 1) + g.shift(0, -1) + g.shift(1, 0) + g.shift(-1, 0)


def arakawa_mjac_g(p: Ghosted, q: Ghosted, delta: float) -> jnp.ndarray:
    """-J(p, q), 12-point Arakawa (msqg macro, /root/reference/msqg/qg.h:252)."""
    pE, pW = p.shift(0, 1), p.shift(0, -1)
    pN, pS = p.shift(1, 0), p.shift(-1, 0)
    pNE, pNW = p.shift(1, 1), p.shift(1, -1)
    pSE, pSW = p.shift(-1, 1), p.shift(-1, -1)
    qE, qW = q.shift(0, 1), q.shift(0, -1)
    qN, qS = q.shift(1, 0), q.shift(-1, 0)
    qNE, qNW = q.shift(1, 1), q.shift(1, -1)
    qSE, qSW = q.shift(-1, 1), q.shift(-1, -1)
    j = ((qE - qW) * (pN - pS)
         + (qS - qN) * (pE - pW)
         + qE * (pNE - pSE)
         - qW * (pNW - pSW)
         - qN * (pNE - pNW)
         + qS * (pSE - pSW)
         + pN * (qNE - qNW)
         - pS * (qSE - qSW)
         - pE * (qNE - qSE)
         + pW * (qNW - qSW))
    return j / (12.0 * delta * delta)


def beta_effect_g(p: Ghosted, beta: float, delta: float) -> jnp.ndarray:
    return beta * (p.shift(0, -1) - p.shift(0, 1)) / (2.0 * delta)


def max_face_speed_layers(p: Ghosted, delta: float) -> jnp.ndarray:
    """Per-layer max over faces of |u| for the CFL controller: the face
    velocity is the mean of the adjacent cells' one-sided derivative
    (identical extrema to ops.stencil.face_velocities, incl. the boundary
    faces). Reduces only the trailing (y, x) axes, so a (nl, N, N) input
    gives all layers' maxima in one fused pass (the reference calls
    timestep() once per layer, /root/reference/msqg/qg.h:383-391; the
    sequential part of that chain is only the scalar smoothing recurrence,
    handled by the caller)."""
    # cell-centered -dpsi/dy and +dpsi/dx (with ghost neighbors)
    uc = -(p.shift(1, 0) - p.shift(-1, 0)) / (2.0 * delta)
    vc = (p.shift(0, 1) - p.shift(0, -1)) / (2.0 * delta)
    # ghost-column values of uc (from the psi ghost columns incl. corners)
    pgl = jnp.concatenate([p.gb[..., :1], p.gl, p.gt[..., :1]], axis=-1)
    pgr = jnp.concatenate([p.gb[..., -1:], p.gr, p.gt[..., -1:]], axis=-1)
    ucl = -(pgl[..., 2:] - pgl[..., :-2]) / (2.0 * delta)
    ucr = -(pgr[..., 2:] - pgr[..., :-2]) / (2.0 * delta)
    ucW = jnp.roll(uc, 1, axis=-1).at[..., :, 0].set(ucl)
    yx = (-2, -1)
    fx = jnp.max(jnp.abs(0.5 * (uc + ucW)), axis=yx)
    fx = jnp.maximum(fx, jnp.max(jnp.abs(0.5 * (uc[..., :, -1] + ucr)),
                                 axis=-1))
    # ghost-row values of vc
    vgb = (p.gb[..., 2:] - p.gb[..., :-2]) / (2.0 * delta)
    vgt = (p.gt[..., 2:] - p.gt[..., :-2]) / (2.0 * delta)
    vcS = jnp.roll(vc, 1, axis=-2).at[..., 0, :].set(vgb)
    fy = jnp.max(jnp.abs(0.5 * (vc + vcS)), axis=yx)
    fy = jnp.maximum(fy, jnp.max(jnp.abs(0.5 * (vc[..., -1, :] + vgt)),
                                 axis=-1))
    return jnp.maximum(fx, fy)


def max_face_speed(p: Ghosted, delta: float) -> jnp.ndarray:
    """Scalar max over all layers and faces (see max_face_speed_layers)."""
    return jnp.max(max_face_speed_layers(p, delta))
