"""Per-phase device timings for the msqg step (VERDICT item 2: roofline
accounting). Times each phase of the hot path with tools.ubench (lax.scan
chain + scalar fetch, tunnel-latency corrected) and prints a table with
achieved HBM bandwidth vs the chip roofline.

Phases (all at nl layers, f32 unless --dtype):
  step/spectral   full predictor-corrector step, spectral inversion
  step/mg+pallas  full step, multigrid inversion, Pallas fused kernels
  step/mg+xla     full step, multigrid inversion, pure XLA lowering
  invert/spectral one spectral PV inversion (modal einsum + DST^2 + scale)
  dstpair         forward+inverse DST-II along both axes (4 transforms)
  modal           layer->mode + mode->layer einsum pair
  rhs/pallas      fused Pallas RHS kernel (zeta + full tendency, one pass)
  rhs/xla         same math, XLA lowering (ghosted rolls)
  cfl             CFL controller chain (max face speed per layer + smoothing)

Bytes-moved estimates (min useful HBM traffic, f(field) = nl*N*N*itemsize):
  invert/spectral: read q, write psi + 4 transform passes r+w  -> ~10 fields
  rhs: read psi, write dq (fused ideal)                        -> 2 fields
  cfl: read psi                                                -> 1 field
  step: 2 x (invert + rhs + q update r+w x2) + cfl + ke        -> see code

Usage: python tools/perf_phases.py --N 2048 [--nl 4] [--dtype float32]
Writes/updates nothing; paste the table into PERF.md.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from tools.ubench import roundtrip, timeit

# TPU v5e (lite): ~819 GB/s HBM BW, 16 GB. v5p: ~2765 GB/s.
HBM_GBPS = {"v5 lite": 819.0, "v5e": 819.0, "v5p": 2765.0, "v4": 1228.0}


def hbm_roofline() -> float:
    name = str(jax.devices()[0]).lower()
    for k, v in HBM_GBPS.items():
        if k in name:
            return v
    return 819.0


def build_cfg(N, nl, dtype, solver):
    from msom_tpu.params import QGConfig
    return QGConfig(N=N, nl=nl, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                    Re4=1563 * (N / 256) ** 3, beta=0.5,
                    Fr=tuple([0.003] * (nl - 1)),
                    dh=tuple([1.0 / nl] * nl),
                    DT=5e-2, tend=1e9, dtout=1e9, CFL=0.6,
                    dtype=dtype, tol=1e-3, solver=solver).validate()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=2048)
    p.add_argument("--nl", type=int, default=4)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--n", type=int, default=20, help="scan length per timing")
    p.add_argument("--skip-mg", action="store_true")
    args = p.parse_args()

    from msom_tpu.models import qg as m
    from msom_tpu.models import pallas_rhs
    from msom_tpu.solvers import spectral as sp

    N, nl = args.N, args.nl
    itemsize = jnp.dtype(args.dtype).itemsize
    field_gb = nl * N * N * itemsize / 1e9
    rt = roundtrip()
    roof = hbm_roofline()
    rows = []

    def rec(name, ms, fields_moved):
        gbps = fields_moved * field_gb / (ms / 1e3) if ms > 0 else 0.0
        rows.append((name, ms, fields_moved, gbps, 100.0 * gbps / roof))
        print(f"{name:18s} {ms:9.3f} ms   ~{fields_moved:5.1f} fields"
              f"  {gbps:8.1f} GB/s  {100.0 * gbps / roof:6.1f}% roof",
              flush=True)

    # ---- full steps -------------------------------------------------------
    def time_step(solver, pallas_env):
        os.environ["MSOM_PALLAS"] = pallas_env
        cfg = build_cfg(N, nl, args.dtype, solver)
        const = m.build_constants(cfg)
        state = m.init_state(cfg, const, seed=0)
        step = m.make_step(cfg)
        big = jnp.asarray(1e18, state.t.dtype)

        def fn(s, c):
            s2, _ = step(s, c, big)
            return s2
        ms = timeit(fn, state, const, n=args.n, rt=rt)
        del os.environ["MSOM_PALLAS"]
        return ms

    rec("step/spectral", time_step("spectral", ""), 2 * 12 + 5)
    if not args.skip_mg:
        rec("step/mg+pallas", time_step("mg", "1"), 2 * 20 + 5)
        rec("step/mg+xla", time_step("mg", "0"), 2 * 40 + 5)

    # ---- phases (spectral config) ----------------------------------------
    cfg = build_cfg(N, nl, args.dtype, "spectral")
    const = m.build_constants(cfg)
    state = m.init_state(cfg, const, seed=0)
    q = state.q

    # one PV inversion: to_modes (r+w) + 2 fwd DST (2x r+w) + scale (r+w)
    # + 2 inv DST + to_layers  ~ 12 field passes minimum
    def inv_fn(qc, c):
        psi, _ = m.invert_q(cfg, c, qc, qc)
        return psi
    rec("invert/spectral", timeit(inv_fn, q, const, n=args.n, rt=rt), 12)

    # DST pair (fwd+inv both axes = 4 transforms, each >= r+w = 2 passes)
    def dst_fn(x):
        y = sp.dst2(sp.dst2(x, -1), -2)
        return sp.idst2(sp.idst2(y, -2), -1)
    rec("dstpair(4x)", timeit(dst_fn, q, n=args.n, rt=rt), 8)

    if const.spec is not None and const.spec.l2m is not None:
        def modal_fn(x):
            xm = jnp.einsum("ml,lyx->myx", const.spec.l2m, x)
            return jnp.einsum("lm,myx->lyx", const.spec.m2l, xm)
        rec("modal(2x)", timeit(modal_fn, q, n=args.n, rt=rt), 4)

    # RHS
    psi = state.psi
    if pallas_rhs.applicable(cfg, const) and jax.default_backend() == "tpu":
        os.environ["MSOM_PALLAS"] = "1"
        def rhsp_fn(pc, c):
            return pallas_rhs.rhs_fused(cfg, c, pc)[0]
        rec("rhs/pallas", timeit(rhsp_fn, psi, const, n=args.n, rt=rt), 2)
        del os.environ["MSOM_PALLAS"]

    from msom_tpu.ops.ghost import ghosted, laplacian_g

    def rhsx_fn(pc, c):
        pg = ghosted(pc, m._bc_psi(cfg))
        zeta = laplacian_g(pg, cfg.delta)
        zg = m._ghost_deriv(cfg, zeta, pg)
        dq, _ = m.rhs(cfg, c, pc, pc, pg, zeta, zg, None)
        return dq
    rec("rhs/xla", timeit(rhsx_fn, psi, const, n=args.n, rt=rt), 2)

    # CFL chain
    def cfl_fn(carry, c):
        pc, prev = carry
        pg = ghosted(pc, m._bc_psi(cfg))
        dtm, prev = m.cfl_dtmax(cfg, c, pg, jnp.asarray(0.05, pc.dtype), prev)
        return (pc + 0.0 * dtm, prev)
    rec("cfl", timeit(cfl_fn, (psi, jnp.zeros((), psi.dtype)), const,
                      n=args.n, rt=rt), 1)

    # KE diagnostic
    def ke_fn(carry, c):
        pc, acc = carry
        return (pc, acc + 0.0 * m.kinetic_energy(cfg, pc))
    rec("ke", timeit(ke_fn, (psi, jnp.zeros((), psi.dtype)), const,
                     n=args.n, rt=rt), 1.0 / nl)

    print(json.dumps({
        "N": N, "nl": nl, "dtype": args.dtype,
        "device": str(jax.devices()[0]), "roofline_gbps": roof,
        "tunnel_rt_ms": rt * 1e3,
        "rows": [{"phase": r[0], "ms": round(r[1], 3),
                  "fields": r[2], "gbps": round(r[3], 1),
                  "pct_roof": round(r[4], 1)} for r in rows]}))


if __name__ == "__main__":
    main()
