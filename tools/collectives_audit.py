"""Audit the partitioned HLO of every sharded step for collective ops
(VERDICT r5 ask #2): count all-gather / all-reduce / collective-permute /
all-to-all / reduce-scatter instructions and their bytes per step on the
virtual 8-device CPU mesh, and flag any FULL-FIELD all-gather (a silent
resharding bottleneck that would only show up on real multi-chip ICI).

Audited paths: GSPMD spectral, GSPMD mg, rows-kernel (explicit shard_map),
general-mesh shard_map spectral. Results -> PERF.md table.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 python
tools/collectives_audit.py
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msom_tpu.models import qg as m
from msom_tpu.params import QGConfig

DTYPES = {"f32": 4, "f64": 8, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
          "s8": 1, "u8": 1, "f16": 2, "c64": 8, "c128": 16}

COLLECTIVES = ("all-gather", "all-reduce", "collective-permute",
               "all-to-all", "reduce-scatter")


def shape_bytes(shape_str):
    """'f32[4,256,256]' -> bytes. Tuples '(f32[..], f32[..])' -> sum."""
    total = 0
    for m_ in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m_.group(1), m_.group(2)
        if dt not in DTYPES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPES[dt]
    return total


def audit_hlo(hlo_text, full_field_bytes):
    """Per-collective (count, bytes) + list of suspicious full-field
    gathers (result >= the full field size)."""
    out = {k: [0, 0] for k in COLLECTIVES}
    suspects = []
    for line in hlo_text.splitlines():
        line = line.strip()
        mm = re.match(r"(?:ROOT )?%?[\w.\-]+ = (\([^)]*\)|\S+) "
                      r"(all-gather|all-reduce|collective-permute|"
                      r"all-to-all|reduce-scatter)", line)
        if not mm:
            continue
        shape, op = mm.group(1), mm.group(2)
        b = shape_bytes(shape)
        out[op][0] += 1
        out[op][1] += b
        if op == "all-gather" and b >= full_field_bytes:
            suspects.append(f"{op} {shape} ({b/1e6:.2f} MB)")
    return out, suspects


def build(N=256, nl=4, solver="spectral", dtype="float32",
          use_pallas=False, transform="auto"):
    cfg = QGConfig(N=N, nl=nl, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                   Re4=1563 * (N / 256) ** 3, beta=0.5,
                   Fr=tuple([0.003] * (nl - 1)), dh=tuple([1.0 / nl] * nl),
                   DT=5e-2, tend=1e9, dtout=1e9, CFL=0.6, dtype=dtype,
                   solver=solver, use_pallas=use_pallas,
                   transform=transform).validate()
    const = m.build_constants(cfg)
    state = m.init_state(cfg, const, seed=0)
    return cfg, const, state


def gspmd_case(solver):
    cfg, const, state = build(solver=solver, use_pallas=False,
                              transform="auto")
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("y", "x"))
    shard3 = NamedSharding(mesh, P(None, "y", "x"))
    repl = NamedSharding(mesh, P())

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 2 \
                and x.shape[-1] == cfg.N and x.shape[-2] == cfg.N:
            return jax.device_put(x, NamedSharding(
                mesh, P(*([None] * (x.ndim - 2) + ["y", "x"]))))
        return jax.device_put(x, repl) if hasattr(x, "ndim") else x

    state = jax.tree.map(place, state)
    const = jax.tree.map(place, const)
    step = m.make_step(cfg)

    @jax.jit
    def fn(state, const, tnext):
        new, d = step(state, const, tnext)
        return new, d.dt

    txt = fn.lower(state, const,
                   jnp.asarray(1e9, state.t.dtype)).compile().as_text()
    return cfg, txt


def rows_case():
    os.environ.setdefault("MSOM_PALLAS", "interpret")
    from msom_tpu.parallel.step import make_qg_step_sharded
    cfg, const, state = build(solver="spectral", use_pallas=True)
    devs = np.array(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devs, ("y", "x"))
    step, place = make_qg_step_sharded(cfg, mesh, state, const)
    assert step.uses_kernels and step.uses_pencil
    sp, cp = place(state), place(const)
    fn = jax.jit(lambda s, c, t: step.raw(s, c, step.sd, t))
    txt = fn.lower(sp, cp,
                   jnp.asarray(1e9, sp.t.dtype)).compile().as_text()
    return cfg, txt


def shardmap_case():
    from msom_tpu.parallel.step import make_qg_step_sharded
    cfg, const, state = build(solver="spectral", use_pallas=False)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("y", "x"))
    step, place = make_qg_step_sharded(cfg, mesh, state, const)
    sp, cp = place(state), place(const)
    fn = jax.jit(lambda s, c, t: step.raw(s, c, step.sd, t))
    txt = fn.lower(sp, cp,
                   jnp.asarray(1e9, sp.t.dtype)).compile().as_text()
    return cfg, txt


def main():
    cases = {
        "gspmd_spectral(2x4)": lambda: gspmd_case("spectral"),
        "gspmd_mg(2x4)": lambda: gspmd_case("mg"),
        "rows_kernel(8x1)": rows_case,
        "shard_map_spectral(2x4)": shardmap_case,
    }
    print(f"{'path':26s} {'op':19s} {'count':>5s} {'MB/step':>9s}")
    any_suspect = False
    for name, fn in cases.items():
        cfg, txt = fn()
        field_bytes = (cfg.nl * cfg.N * cfg.N
                       * jnp.dtype(cfg.dtype).itemsize)
        stats, suspects = audit_hlo(txt, field_bytes)
        for op, (cnt, byt) in stats.items():
            if cnt:
                print(f"{name:26s} {op:19s} {cnt:5d} {byt/1e6:9.3f}")
        if suspects:
            any_suspect = True
            print(f"{name}: FULL-FIELD GATHERS: ")
            for s in suspects[:8]:
                print("   ", s)
        else:
            print(f"{name:26s} {'(no full-field all-gather)':19s}")
    sys.exit(1 if any_suspect else 0)


if __name__ == "__main__":
    main()
