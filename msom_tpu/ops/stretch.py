"""Vertical stretching operator and layer metrics.

The QG vertical coupling Gamma(a)[l] = s[l-1]*(a[l-1]-a[l])*idh0[l]
+ s[l]*(a[l+1]-a[l])*idh1[l] with Neumann top/bottom (idh0[0] = idh1[nl-1] = 0)
— comp_stretch, /root/reference/msqg/qg.h:202-246, metrics
/root/reference/msqg/qg.h:1017-1027.

Unlike the reference's per-layer scalar loops, everything here is vectorized
over the (nl, ny, nx) layer axis: the coupling becomes shifted-slice
arithmetic, which XLA maps onto the VPU as a few fused elementwise loops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def layer_metrics(dh) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inter-layer metrics (dhc, idh0, idh1) from face layer thicknesses dh
    (length nl). Mirrors /root/reference/msqg/qg.h:1017-1027."""
    dh = np.asarray(dh, np.float64)
    nl = dh.shape[0]
    idh0 = np.zeros(nl)
    idh1 = np.zeros(nl)
    if nl == 1:
        return np.zeros(0), idh0, idh1
    dhc = 0.5 * (dh[:-1] + dh[1:])  # centered thicknesses, length nl-1
    idh1[0] = 1.0 / (dhc[0] * dh[0])
    for l in range(1, nl - 1):
        idh0[l] = 1.0 / (dhc[l - 1] * dh[l])
        idh1[l] = 1.0 / (dhc[l] * dh[l])
    idh0[nl - 1] = 1.0 / (dhc[nl - 2] * dh[nl - 1])
    return dhc, idh0, idh1


def stretch(a: jnp.ndarray, s: jnp.ndarray, idh0, idh1) -> jnp.ndarray:
    """Gamma(a) for a (nl, ny, nx) field.

    `s` is the stretching coefficient at the nl-1 interior interfaces,
    shape (nl-1, ny, nx) (strl = (Fr/Ro)^2, /root/reference/msqg/qg.h:1043-1048).
    idh0/idh1 are length-nl 1-D metrics (idh0[0] = idh1[-1] = 0 encode the
    Neumann vertical BCs). Returns zeros for nl == 1
    (/root/reference/msqg/qg.h:239-242)."""
    nl = a.shape[0]
    if nl == 1:
        return jnp.zeros_like(a)
    idh0 = jnp.asarray(idh0, a.dtype).reshape(nl, 1, 1)
    idh1 = jnp.asarray(idh1, a.dtype).reshape(nl, 1, 1)
    z = jnp.zeros_like(a[:1])
    # up[l] = s[l-1]*(a[l-1] - a[l]), zero at l=0
    up = jnp.concatenate([z, s * (a[:-1] - a[1:])], axis=0)
    # down[l] = s[l]*(a[l+1] - a[l]), zero at l=nl-1
    down = jnp.concatenate([s * (a[1:] - a[:-1]), z], axis=0)
    return up * idh0 + down * idh1
