"""Run loop + event scheduling for the QG model family.

Replaces the Basilisk event system (run()/event blocks, SURVEY.md §3.1) with
an explicit host loop around a jitted step: events fire at fixed model-time
cadences (output every dtout, wavelet filter every dtflt), and the in-device
dtnext clamp makes steps land exactly on event times — the same semantics
the reference gets from Basilisk's event scheduler.

Between events the steps run back-to-back with the device-resident state;
only event decisions read back the model time.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from msom_tpu.models import qg as qg_model
from msom_tpu.params import QGConfig


@dataclasses.dataclass
class RunHooks:
    """Callbacks fired by the driver (host side)."""
    on_log: Callable | None = None      # (i, dt, t, ke) every step
    on_output: Callable | None = None   # (state, t) every dtout
    on_filter: Callable | None = None   # (state, t) every dtflt


def _next_event(t, cadence, eps=1e-10):
    """First multiple of `cadence` strictly greater than t (within eps)."""
    if cadence <= 0:
        return np.inf
    k = np.floor((t + eps) / cadence) + 1
    return k * cadence


def run_qg(cfg: QGConfig, *, const=None, state=None, hooks: RunHooks = None,
           max_steps: int | None = None, log_every: int = 1):
    """Integrate the msqg model to cfg.tend. Returns the final state.

    Mirrors the reference driver loop /root/reference/msqg/qg.c: KE heartbeat
    each step (writestdout), output event at t += dtout, filter event at
    t += dtflt.
    """
    hooks = hooks or RunHooks()
    if const is None:
        const = qg_model.build_constants(cfg)
    if state is None:
        state = qg_model.init_state(cfg, const)

    step = jax.jit(qg_model.make_step(cfg))

    t = float(state.t)
    i = int(state.i)
    tend = cfg.tend
    next_out = 0.0  # output event also fires at t = 0 (qg.c:112)
    next_flt = _next_event(0.0, cfg.dtflt)

    while t < tend - 1e-10:
        if hooks.on_output is not None and t >= next_out - 1e-10:
            hooks.on_output(state, t)
        if t >= next_out - 1e-10:
            next_out = _next_event(t, cfg.dtout)
        if cfg.dtflt > 0 and t >= next_flt - 1e-10:
            from msom_tpu.ops.wavelet import wavelet_filter_step
            state = wavelet_filter_step(cfg, const, state)
            if hooks.on_filter is not None:
                hooks.on_filter(state, t)
            next_flt = _next_event(t, cfg.dtflt)

        tnext = min(next_out, next_flt, tend)
        state, diag = step(state, const, jnp.asarray(tnext, state.t.dtype))
        t = float(state.t)
        i = int(state.i)
        if hooks.on_log is not None and i % log_every == 0:
            hooks.on_log(i, float(diag.dt), t, float(diag.ke))
        if max_steps is not None and i >= max_steps:
            break

    if hooks.on_output is not None and t >= next_out - 1e-10:
        hooks.on_output(state, t)
    return state


def stdout_hooks(stream=sys.stdout) -> RunHooks:
    """KE heartbeat matching /root/reference/msqg/qg.c:101-109."""
    def log(i, dt, t, ke):
        print(f"i = {i}, dt = {dt:g}, t = {t:g}, ke_1 = {ke:g}", file=stream)
    return RunHooks(on_log=log)


def main(argv=None):
    import argparse

    from msom_tpu.params import load_qg_config

    p = argparse.ArgumentParser(description="msom_tpu QG driver")
    p.add_argument("--config", required=True, help="params.in path")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cfg = load_qg_config(args.config)
    t0 = time.time()
    state = run_qg(cfg, hooks=stdout_hooks(), max_steps=args.steps)
    wall = time.time() - t0
    n_steps = int(state.i)
    print(json.dumps({
        "steps": n_steps, "t": float(state.t), "wall_s": wall,
        "points_per_s": cfg.N * cfg.N * cfg.nl * n_steps / max(wall, 1e-9)}))


if __name__ == "__main__":
    main()
