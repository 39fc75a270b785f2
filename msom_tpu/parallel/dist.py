"""Multi-host execution support (SURVEY.md §2.5 rows 40-41, §5.8).

The reference's multi-process story is MPI mediated by Basilisk plus three
direct patterns this module reproduces the JAX way:

* `MPI_Init` at startup -> :func:`initialize` wraps
  `jax.distributed.initialize` (idempotent; a no-op for single-process runs,
  so every driver can call it unconditionally).
* `pid() == 0` guards around mkdir/file side effects
  (/root/reference/msqg/qg.h:766-780, qg-node/extra.h:121-135,
  netcdf_vertex_bas.h:60) -> :func:`is_master` / :func:`master_only`.
* `MPI_Bcast` of the freshly created output-dir name to the other ranks
  (/root/reference/msqg/qg.h:777-779, mspg/pg.c:115-118)
  -> :func:`broadcast_str` over `multihost_utils.broadcast_one_to_all`.
* `MPI_Reduce(MPI_MIN)` nodata-gather of a distributed field to rank 0 for
  output (/root/reference/msqg/auxiliar_input.h:122-146,
  qg-node/netcdf_vertex_bas.h:273-295) -> :func:`fetch_global`, which works
  for both the single-process mesh (device_get of the GSPMD array) and
  multi-process meshes (process_allgather).

Launch pattern (the `mpirun -np 16 ./qg.e` equivalent, msqg/qg.c:14):

    # per host, e.g. under SLURM or GCE metadata autodetection:
    from msom_tpu.parallel import dist
    dist.initialize()                      # autodetects on TPU pods
    ... build mesh over jax.devices(), run; writers are master-gated ...

Tested in-tree with two local CPU processes (tests/test_multiprocess.py
drives tools/mp_smoke.py) since this environment has a single TPU chip.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Idempotent `jax.distributed.initialize` wrapper.

    With no arguments: initializes iff running under a recognized multi-host
    environment (TPU pod metadata, SLURM, OMPI vars — jax autodetects); plain
    single-process runs are left untouched. With explicit arguments
    (coordinator/num_processes/process_id): always initializes — this is the
    two-local-process test path.
    """
    global _initialized
    if _initialized:
        return
    # NB: jax.process_count() itself initializes the backend, which would
    # make distributed init impossible — only consult it when the backend
    # is already up.
    from jax._src import xla_bridge
    if xla_bridge.backends_are_initialized() and jax.process_count() > 1:
        _initialized = True
        return
    explicit = coordinator_address is not None
    if not explicit:
        import os
        # TPU_WORKER_HOSTNAMES counts only when it names MULTIPLE hosts
        # (single-chip tunnels set it to one name, e.g. "localhost")
        auto = ("SLURM_JOB_ID" in os.environ
                or "OMPI_COMM_WORLD_SIZE" in os.environ
                or "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
                or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
        if not auto:
            return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id,
                                   local_device_ids=local_device_ids)
    except RuntimeError as e:
        # backend already initialized (e.g. a host process that has run
        # single-process JAX work before calling the driver): distributed
        # init is impossible now; proceed single-process unless the caller
        # explicitly demanded a multi-process run.
        if explicit:
            raise
        import warnings
        warnings.warn(f"jax.distributed.initialize skipped: {e}")
    _initialized = True


def is_master() -> bool:
    """True on the process allowed to touch the filesystem (pid()==0)."""
    return jax.process_index() == 0


def master_only(fn):
    """Run `fn` only on process 0 (returns None elsewhere) — the analog of
    the reference's `if (pid() == 0) { ... }` blocks."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_master():
            return fn(*args, **kwargs)
        return None
    return wrapper


def broadcast_str(s: str | None, maxlen: int = 256) -> str:
    """Broadcast a string from process 0 to all (MPI_Bcast of the outdir
    name, msqg/qg.h:777-779). Single-process: identity."""
    if jax.process_count() == 1:
        return s
    from jax.experimental import multihost_utils
    buf = np.zeros(maxlen, np.uint8)
    if is_master():
        b = (s or "").encode()[:maxlen]
        buf[:len(b)] = np.frombuffer(b, np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    return bytes(np.asarray(out)).rstrip(b"\x00").decode()


def fetch_global(x) -> np.ndarray:
    """Materialize a (possibly sharded, possibly multi-process) jax.Array as
    a full NumPy array on every process; writers then gate on is_master().

    Single-process (even with a local mesh): plain device_get — XLA already
    assembles the global view. Multi-process: the array's shards live on
    different hosts, so go through multihost_utils.process_allgather
    (the MPI_Reduce-gather analog, auxiliar_input.h:122-146)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    if isinstance(x, jax.Array) and x.is_fully_addressable:
        return np.asarray(x)
    return np.asarray(
        multihost_utils.process_allgather(x, tiled=True))


def sync() -> None:
    """Barrier across processes (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("msom_tpu.dist.sync")
