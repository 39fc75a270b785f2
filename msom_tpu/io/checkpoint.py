"""Checkpoint / resume for the full model state.

The reference's two restart mechanisms (SURVEY.md §5.4) — copy a `.bas`
snapshot to p0.bas, or `restart.nc` at the last time record — are supported
through io.bas / io.netcdf. This module adds an exact-state checkpoint the
reference lacks: EVERY state leaf (including the CFL controller's
previous-dt smoothing state, whose loss makes reference restarts non-bitwise,
/root/reference/qg-node/qg.h:259) round-trips through one .npz, so resume is
bit-exact.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def save_state(path: str, state) -> None:
    """Multi-process safe: every process participates in the gather, only
    process 0 touches the filesystem (the reference's pid()==0 rule)."""
    from msom_tpu.parallel import dist

    leaves = {}
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        if v is None:
            continue
        leaves[f.name] = dist.fetch_global(v)
    if dist.is_master():
        np.savez(path, **leaves)


def load_state(path: str, template):
    """Restore into the same dataclass type as `template` (leaves absent in
    the file keep the template's value, e.g. None optionals)."""
    import jax.numpy as jnp

    data = np.load(path)
    kw = {}
    for f in dataclasses.fields(template):
        tv = getattr(template, f.name)
        if f.name in data.files:
            arr = data[f.name]
            if tv is not None and hasattr(tv, "dtype"):
                kw[f.name] = jnp.asarray(arr, tv.dtype)
            else:
                kw[f.name] = jnp.asarray(arr)
        else:
            kw[f.name] = tv
    return dataclasses.replace(template, **kw)
