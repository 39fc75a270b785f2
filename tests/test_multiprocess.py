"""Real two-process jax.distributed run on CPU (VERDICT round-1 item 3):
launches tools/mp_smoke.py twice, which connects the processes through a
coordinator, shards an msqg step over a 2-device (one per process) mesh,
and exercises broadcast_str / fetch_global / master-gated output."""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(300)
def test_two_process_distributed(tmp_path):
    port = _free_port()
    env_base = {**os.environ,
                "MSOM_MP_COORD": f"localhost:{port}",
                "MSOM_MP_NPROCS": "2",
                "MSOM_MP_OUTDIR": str(tmp_path),
                "JAX_PLATFORMS": "cpu",
                # one CPU device per process
                "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    procs = []
    for rank in range(2):
        env = {**env_base, "MSOM_MP_RANK": str(rank)}
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "mp_smoke.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO))
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"rank failed rc={rc}\nstdout:{out}\nstderr:{err}"
    results = [json.loads(out.strip().splitlines()[-1])
               for _, out, _ in outs]
    assert all(r["ok"] for r in results)
    assert all(r["processes"] == 2 for r in results)
    # both ranks computed the same (replicated-scalar) KE
    assert results[0]["ke"] == pytest.approx(results[1]["ke"], rel=1e-12)
    assert (tmp_path / "q.npy").exists()
