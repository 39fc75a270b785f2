"""Two-process CPU smoke test of the multi-host path (VERDICT item 3).

Each process runs this script with MSOM_MP_RANK / MSOM_MP_NPROCS /
MSOM_MP_COORD set; jax.distributed connects them, a 2-device mesh (one CPU
device per process) shards a small msqg step along y, and the driver-side
utilities (broadcast_str, fetch_global, master-gated writes) are exercised.
Prints one JSON line on success (rank 0: includes the KE; rank 1: ok only).

Launched by tests/test_multiprocess.py; standalone:
    MSOM_MP_COORD=localhost:12345 MSOM_MP_NPROCS=2 MSOM_MP_RANK=0 \
        python tools/mp_smoke.py & \
    MSOM_MP_COORD=localhost:12345 MSOM_MP_NPROCS=2 MSOM_MP_RANK=1 \
        python tools/mp_smoke.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    rank = int(os.environ["MSOM_MP_RANK"])
    nprocs = int(os.environ["MSOM_MP_NPROCS"])
    coord = os.environ["MSOM_MP_COORD"]
    outdir = os.environ.get("MSOM_MP_OUTDIR", "/tmp/msom_mp_out")

    from msom_tpu.parallel import dist
    dist.initialize(coordinator_address=coord, num_processes=nprocs,
                    process_id=rank)
    assert jax.process_count() == nprocs, jax.process_count()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from msom_tpu.models import qg as m
    from msom_tpu.params import QGConfig

    # one CPU device per process -> a (1, nprocs) mesh sharding y
    devs = np.array(jax.devices()).reshape(1, nprocs)
    mesh = Mesh(devs, ("x", "y"))

    # transform="matmul": the FFT lowering does not shard under multi-process
    # GSPMD (XLA c64/c128 verifier failure); the MXU matmul transform does
    cfg = QGConfig(N=64, nl=2, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4,
                   Re4=1563, beta=0.5, Fr=(0.003,), dh=(0.5, 0.5),
                   DT=5e-2, tend=1.0, dtout=1.0, CFL=0.6,
                   dtype="float64", solver="spectral",
                   transform="matmul").validate()
    const = m.build_constants(cfg)
    state = m.init_state(cfg, const, seed=0)
    step = m.make_step(cfg)

    # GSPMD: shard q/psi along y across the two processes
    sh = NamedSharding(mesh, P(None, "y", None))
    state = state.__class__(
        q=jax.device_put(state.q, sh), psi=jax.device_put(state.psi, sh),
        t=state.t, dt_prev=state.dt_prev, i=state.i, key=state.key,
        tracers=None, qof=None, nbar=None)

    with mesh:
        jstep = jax.jit(step)
        for _ in range(3):
            state, diag = jstep(state, const,
                                jnp.asarray(1e18, state.t.dtype))
    ke = float(diag.ke)

    # driver utilities: broadcast a string, gather the global field,
    # master-gated write
    name = dist.broadcast_str(f"run_{os.getpid()}" if rank == 0 else None)
    assert name.startswith("run_"), name
    q_global = dist.fetch_global(state.q)
    assert q_global.shape == (cfg.nl, cfg.N, cfg.N)
    if dist.is_master():
        os.makedirs(outdir, exist_ok=True)
        np.save(os.path.join(outdir, "q.npy"), q_global)
    dist.sync()
    # every process must see the master's file (shared fs)
    assert os.path.exists(os.path.join(outdir, "q.npy"))

    # --- rows-KERNEL sharded step across the two OS processes ------------
    # (parallel/step.py rows fast path: fused Pallas kernels in interpret
    # mode + pencil transforms, ppermute/all_to_all crossing the process
    # boundary; result checked against a process-local unsharded run)
    os.environ["MSOM_PALLAS"] = "interpret"
    from msom_tpu.parallel.step import make_qg_step_sharded

    mesh_r = Mesh(np.array(jax.devices()).reshape(nprocs, 1), ("y", "x"))
    const_r = m.build_constants(cfg)
    state_r = m.init_state(cfg, const_r, seed=0)
    step_r, place_r = make_qg_step_sharded(cfg, mesh_r, state_r, const_r)
    assert step_r.uses_kernels and step_r.uses_pencil
    sp, cp = place_r(state_r), place_r(const_r)
    for _ in range(3):
        sp, dp = step_r(sp, cp, jnp.asarray(1e18, jnp.float64))
    q_rows = np.asarray(dist.fetch_global(sp.q))

    su = m.init_state(cfg, const_r, seed=0)
    stepu = jax.jit(m.make_step(cfg))
    for _ in range(3):
        su, du = stepu(su, const_r, jnp.asarray(1e18, jnp.float64))
    q_ref = np.asarray(su.q)
    rel_rows = float(np.abs(q_rows - q_ref).max() / np.abs(q_ref).max())
    assert rel_rows < 1e-11, rel_rows

    print(json.dumps({"rank": rank, "ok": True, "ke": ke,
                      "rows_rel": rel_rows,
                      "processes": jax.process_count()}), flush=True)


if __name__ == "__main__":
    main()
