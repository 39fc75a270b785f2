"""Production-precision (f32) trajectory + statistics validation
(VERDICT r5 #8): the Verron 256^2 x 3 double gyre run f32 vs f64 —
1000-step trajectory drift curve, KE time series to a statistical window,
and the isotropic KE spectrum compared between precisions. Results ->
GOLDEN.md f32 section.

Run twice: `--dtype float64 --cpu` (truth; TPUs have no native f64) and
`--dtype float32` (production, on the chip) + `--dtype float32 --cpu`
(same precision, CPU backend — separates precision drift from backend
rounding). Each writes a .npz; `--report` combines them."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run(args):
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np
    from msom_tpu.models import qg as m
    from msom_tpu.params import QGConfig

    cfg = QGConfig(N=256, nl=3, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                   Re4=1563, beta=0.5, Fr=(0.0023669, 0.0076173),
                   dh=(0.06, 0.14, 0.8), DT=5e-2, tend=1e18, dtout=1e18,
                   CFL=0.6, solver="spectral", dtype=args.dtype).validate()
    const = m.build_constants(cfg)
    state = m.init_state(cfg, const, seed=0)
    step = m.make_step(cfg)

    def chunk(s, c, n):
        def body(s, _):
            s, d = step(s, c, jnp.asarray(1e18, s.t.dtype))
            return s, (d.ke, d.dt)
        return jax.lax.scan(body, s, None, length=n)

    cj = jax.jit(chunk, static_argnums=2)
    kes, dts, snaps = [], [], {}
    total = args.steps
    B = 100
    for k in range(total // B):
        state, (ke, dt) = cj(state, const, B)
        kes.append(np.asarray(ke))
        dts.append(np.asarray(dt))
        i = (k + 1) * B
        if i in (100, 250, 500, 1000, 2000, total):
            snaps[str(i)] = np.asarray(state.q, np.float64)
        print(f"  {i}/{total} ke={float(ke[-1]):.6g}", flush=True)
    out = dict(ke=np.concatenate(kes), dt=np.concatenate(dts),
               psi_final=np.asarray(state.psi, np.float64),
               t_final=float(state.t))
    for k, v in snaps.items():
        out[f"q_{k}"] = v
    tag = f"{args.dtype}_{'cpu' if args.cpu else 'tpu'}"
    np.savez(f"/root/repo/tools/f32val_{tag}.npz", **out)
    print(f"wrote f32val_{tag}.npz")


def report():
    import numpy as np
    from msom_tpu.analysis import ke_spectrum

    d64 = np.load("/root/repo/tools/f32val_float64_cpu.npz")
    d32 = np.load("/root/repo/tools/f32val_float32_tpu.npz")
    d32c = np.load("/root/repo/tools/f32val_float32_cpu.npz")
    print("| steps | rel q drift f32(TPU) vs f64 | f32(CPU) vs f64 |")
    print("|---|---|---|")
    for k in ("100", "250", "500", "1000", "2000"):
        if f"q_{k}" not in d64:
            continue
        ref = d64[f"q_{k}"]
        sc = np.abs(ref).max()
        a = np.abs(d32[f"q_{k}"] - ref).max() / sc
        b = np.abs(d32c[f"q_{k}"] - ref).max() / sc
        print(f"| {k} | {a:.3e} | {b:.3e} |")
    n = len(d64["ke"])
    w = n // 3
    for name, d in (("f64/cpu", d64), ("f32/tpu", d32), ("f32/cpu", d32c)):
        ke = d["ke"][-w:]
        print(f"KE window [{name}]: mean={ke.mean():.6g} std={ke.std():.3g}"
              f" dt_mean={d['dt'][-w:].mean():.5g}")
    delta = 80.0 / 256
    out = {}
    for name, d in (("f64", d64), ("f32", d32)):
        kk, E = ke_spectrum(d["psi_final"][0], delta)
        out[name] = (np.asarray(kk), np.asarray(E))
    k64, E64 = out["f64"]
    k32, E32 = out["f32"]
    # spectra agree over the energy-containing decades
    m_ = E64 > E64.max() * 1e-6
    rat = E32[m_] / E64[m_]
    print(f"isotropic KE spectrum at final state: {m_.sum()} bins above "
          f"1e-6*peak; E_f32/E_f64 in [{rat.min():.3f}, {rat.max():.3f}], "
          f"median {np.median(rat):.4f}")
    json.dump({"spectrum_ratio_median": float(np.median(rat))},
              open("/root/repo/tools/f32val_summary.json", "w"))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="float32")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--report", action="store_true")
    a = p.parse_args()
    if a.report:
        report()
    else:
        run(a)
