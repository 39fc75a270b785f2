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


def default_mesh(mesh=None):
    """2-D (y, x) device mesh over all local devices, as square as possible
    — the msqg MPI Cartesian decomposition (`mpirun -np 16 ./qg.e`,
    /root/reference/msqg/qg.c:13-14) on the TPU slice."""
    from jax.sharding import Mesh
    if mesh is not None:
        return mesh
    devs = jax.devices()
    nd = len(devs)
    my = 1
    for cand in range(int(nd ** 0.5), 0, -1):
        if nd % cand == 0:
            my = cand
            break
    return Mesh(np.array(devs).reshape(my, nd // my), ("y", "x"))


def _shard_qg(cfg: QGConfig, mesh, state, const):
    """GSPMD placement: every (..., N, N) field splits over the (y, x) mesh;
    the spectral-solver operator data (basis matrices) and everything else
    replicates. The jitted step/filter/energy functions then partition
    automatically (XLA inserts the halo collectives)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def place(x):
        if not hasattr(x, "ndim"):
            return x
        if x.ndim >= 2 and x.shape[-1] == cfg.N and x.shape[-2] == cfg.N:
            spec = [None] * (x.ndim - 2) + ["y", "x"]
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, repl)

    state = jax.tree.map(place, state)
    spec_data = const.spec
    const = dataclasses.replace(const, spec=None)
    const = jax.tree.map(place, const)
    if spec_data is not None:
        # operator matrices (DST basis / folded blocks / inv_den) replicate:
        # the transform einsums then shard over the FIELD operand only
        const = dataclasses.replace(
            const, spec=jax.tree.map(lambda x: jax.device_put(x, repl),
                                     spec_data))
    return state, const


def sharded_cfg(cfg: QGConfig) -> QGConfig:
    """The config adjustments GSPMD sharding requires: Pallas kernels off
    (pallas_call is opaque to the partitioner) and, for f64 spectral
    configs, the matmul transform instead of the non-partitionable FFT
    lowering. Apply BEFORE building constants."""
    kw = {"use_pallas": False}
    if (cfg.solver == "spectral" and cfg.transform in ("auto", "fft")
            and jnp.dtype(cfg.dtype).itemsize == 8):
        kw["transform"] = "matmul"
    return dataclasses.replace(cfg, **kw)


def _strip_kernels(const):
    """GSPMD-safe view of constants built with use_pallas: drop the fused
    RHS kernel data and the multigrid Pallas sweep/residual profiles so
    every jitted function keeps the partitionable XLA lowering (pallas_call
    is opaque to the partitioner). The spectral basis (matmul or folded —
    both partitionable) is kept."""
    def strip_levels(levels):
        if levels is None:
            return None
        return [dataclasses.replace(lvl, sw=None, rp=None)
                for lvl in levels]
    return dataclasses.replace(
        const, rhsk=None, levels=strip_levels(const.levels),
        mlevels=strip_levels(const.mlevels))


def rows_mesh(mesh=None):
    """1-D rows mesh (ndev, 1) over all local devices — the layout of the
    kernel-keeping sharded step (parallel/step.py rows fast path)."""
    from jax.sharding import Mesh
    if mesh is not None:
        return mesh
    devs = jax.devices()
    return Mesh(np.array(devs).reshape(len(devs), 1), ("y", "x"))


def run_qg(cfg: QGConfig, *, const=None, state=None, hooks: RunHooks = None,
           max_steps: int | None = None, log_every: int = 1,
           sharded: bool = False, mesh=None):
    """Integrate the msqg model to cfg.tend. Returns the final state (and
    attaches the energy accumulator as `run_qg.energy` when ediag > -1).

    Mirrors the reference driver loop /root/reference/msqg/qg.c: KE heartbeat
    each step (writestdout), output event at t += dtout, filter event at
    t += dtflt, per-step energy accumulation when ediag > -1 (comp_diag,
    qg_energy.h:286-288) with the filter-event de_ft term and per-window
    reset at outputs.

    `sharded`: the multi-chip entry the reference gets from
    `mpirun -np 16 ./qg.e` (msqg/qg.c:13-14). Accepts True/"auto", "rows"
    or "gspmd":

    * "rows" (and the "auto" first choice): the KERNEL-KEEPING explicit
      shard_map step on a 1-D rows mesh (parallel/step.py rows fast path)
      — fused Pallas RHS/tracer kernels on every shard + pencil
      folded-DST inversion; the distributed mode whose per-chip code path
      equals the single-chip fast path.
    * "gspmd" (and the "auto" fallback for configs the kernels don't
      cover): GSPMD placement over `mesh` (default: all local devices, as
      square as possible) with the partitionable XLA lowerings — the
      Pallas fast paths are stripped (pallas_call is opaque to the
      partitioner) while the matmul/folded spectral basis is kept.

    All events (wavelet filter, energy accumulation, OutputWriter gather)
    run on the mesh in both modes. The mode actually taken is recorded in
    `run_qg.sharded_mode`. Output equality vs the unsharded run is pinned
    by tests/test_parallel.py::test_run_qg_sharded_matches_single and
    tests/test_rows_step.py.
    """
    hooks = hooks or RunHooks()
    mode = None
    if sharded:
        mode = sharded if isinstance(sharded, str) else "auto"
        if mode not in ("auto", "rows", "gspmd"):
            raise ValueError(f"sharded={mode!r}: use 'auto', 'rows' or "
                             "'gspmd'")
    user_const = const
    if mode == "gspmd":
        cfg = sharded_cfg(cfg)
        if const is not None and (const.rhsk is not None or any(
                lvl.sw is not None for lvl in const.levels)):
            raise ValueError(
                "run_qg(sharded='gspmd') needs constants built with "
                "use_pallas=False (or pass const=None to rebuild)")
        if const is not None and const.spec is not None \
                and const.spec.S is None and const.spec.fac is None:
            # the FFT spectral lowering does not partition under GSPMD;
            # constants must be rebuilt with the matmul basis (the
            # sharded_cfg transform override, applied before building)
            raise ValueError(
                "run_qg(sharded='gspmd') needs spectral constants built "
                "from sharded_cfg(cfg) — the FFT transform does not "
                "partition (pass const=None to rebuild)")
    if const is None:
        const = qg_model.build_constants(cfg)
    if state is None:
        state = qg_model.init_state(cfg, const)

    rows_step = None
    if mode in ("auto", "rows"):
        from msom_tpu.parallel.step import make_qg_step_sharded
        mesh_r = rows_mesh(mesh)
        my_r, mx_r = mesh_r.devices.shape
        ok = (mx_r == 1 and cfg.N % my_r == 0
              and (cfg.N // my_r) % 8 == 0
              and not (cfg.mode_pv_invert and const.iBu is not None))
        if ok and cfg.solver == "spectral":
            from msom_tpu.solvers import spectral as spectral_mod
            # y-varying strl (varRo) has no pencil decomposition yet:
            # route through GSPMD (block-Thomas vary solve partitions)
            ok = spectral_mod.applicable(cfg.nl, const.strl)
        if ok:
            step_r, place_r = make_qg_step_sharded(cfg, mesh_r, state,
                                                   const)
            ok = step_r.uses_kernels and (cfg.solver != "spectral"
                                          or step_r.uses_pencil)
        if ok:
            rows_step = step_r
            state, const = place_r(state), place_r(const)
            if cfg.solver == "spectral" and step_r.sd is not None:
                # events (wavelet filter, energy, OutputWriter inversions)
                # run under GSPMD on the mesh-placed state: give them the
                # pencil step's partitionable basis (matmul/folded) in
                # place of a possibly non-partitionable FFT basis
                const = dataclasses.replace(const, spec=step_r.sd)
        elif mode == "rows":
            raise ValueError(
                "sharded='rows': the kernel-keeping rows path does not "
                "cover this configuration (needs a 1-D rows mesh with "
                "N % ndev == 0, (N/ndev) % 8 == 0, use_pallas, and a "
                "kernel-covered config — see models.pallas_rhs)")
        else:
            mode = "gspmd"
            cfg = sharded_cfg(cfg)
            if user_const is None:
                # constants were built here from cfg alone — rebuild them
                # GSPMD-clean (no kernel data, partitionable transform)
                const = qg_model.build_constants(cfg)
            else:
                const = _strip_kernels(const)
                if cfg.solver == "spectral" and const.spec is not None \
                        and const.spec.S is None and const.spec.fac is None:
                    raise ValueError(
                        "sharded='auto' GSPMD fallback needs a "
                        "partitionable spectral basis; rebuild constants "
                        "with transform='matmul'")

    if mode == "gspmd" and rows_step is None:
        mesh = default_mesh(mesh)
        state, const = _shard_qg(cfg, mesh, state, const)

    run_qg.sharded_mode = "rows" if rows_step is not None else mode
    step = rows_step if rows_step is not None \
        else jax.jit(qg_model.make_step(cfg))

    energy = None
    energy_tend_j = None
    if cfg.ediag > -1:
        from msom_tpu.models import qg_energy as en
        energy = en.init_energy(cfg)
        energy_tend_j = jax.jit(
            lambda acc, psi, dt: en.energy_tend(cfg, const, acc, psi, dt))

    t = float(state.t)
    i = int(state.i)
    tend = cfg.tend
    next_out = 0.0  # output event also fires at t = 0 (qg.c:112)
    next_flt = _next_event(0.0, cfg.dtflt)

    while t < tend - 1e-10:
        if t >= next_out - 1e-10:
            if hooks.on_output is not None:
                hooks.on_output(state, t)
            if energy is not None and hasattr(hooks.on_output, "write_energy"):
                hooks.on_output.write_energy(energy, int(state.i))
            if energy is not None:
                from msom_tpu.models import qg_energy as en
                energy = en.reset_window(energy)
            next_out = _next_event(t, cfg.dtout)
        if cfg.dtflt > 0 and t >= next_flt - 1e-10:
            from msom_tpu.ops.wavelet import wavelet_filter_step
            if energy is not None:
                from msom_tpu.models import qg_energy as en
                energy = en.filter_de(cfg, const, energy, state.q, state.psi)
            state = wavelet_filter_step(cfg, const, state)
            if hooks.on_filter is not None:
                hooks.on_filter(state, t)
            next_flt = _next_event(t, cfg.dtflt)

        tnext = min(next_out, next_flt, tend)
        state, diag = step(state, const, jnp.asarray(tnext, state.t.dtype))
        t = float(state.t)
        i = int(state.i)
        # NaN guard (SURVEY.md §5.3): a CFL/ke NaN propagates into t within
        # one step; fail loudly instead of integrating garbage to tend.
        if t != t:
            raise FloatingPointError(
                f"non-finite model time after step {i}: blow-up or NaN in "
                "the state (check DT/CFL; resume from the last checkpoint)")
        if energy is not None:
            energy = energy_tend_j(energy, state.psi, diag.dt)
        if hooks.on_log is not None and i % log_every == 0:
            ke = float(diag.ke)
            if ke != ke:
                raise FloatingPointError(
                    f"non-finite kinetic energy at step {i} (t={t:g})")
            hooks.on_log(i, float(diag.dt), t, ke)
        if max_steps is not None and i >= max_steps:
            break

    if hooks.on_output is not None and t >= next_out - 1e-10:
        hooks.on_output(state, t)
    run_qg.energy = energy
    return state


def run_pg(cfg, *, const=None, state=None, hooks: RunHooks = None,
           max_steps: int | None = None, sharded: bool = False, mesh=None):
    """Integrate the mspg model to cfg.tend (driver loop of
    /root/reference/mspg/pg.c): running means every 10 steps (comp_output),
    b_me/u_me state dumps every dtout (writestate).

    `sharded`: GSPMD domain decomposition over `mesh` (the reference runs
    mspg under the same MPI split, pg.c:115-118); face-staggered (N+1)
    axes stay unsharded — only axes divisible by the mesh dim split."""
    from msom_tpu.models import mspg

    hooks = hooks or RunHooks()
    if const is None:
        const = mspg.build_constants(cfg)
    if state is None:
        state = mspg.init_state(cfg, const)
    if sharded:
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = default_mesh(mesh)
        my, mx = mesh.devices.shape

        def place(x):
            if not hasattr(x, "ndim") or x.ndim < 2:
                return x
            spec = [None] * x.ndim
            if x.shape[-2] % my == 0:
                spec[-2] = "y"
            if x.shape[-1] % mx == 0:
                spec[-1] = "x"
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))

        state = jax.tree.map(place, state)
        const = jax.tree.map(place, const)

    step = jax.jit(mspg.make_step(cfg))
    t = float(state.t)
    next_out = _next_event(0.0, cfg.dtout)
    if hooks.on_output is not None:
        hooks.on_output(state, t)   # writestate fires at t = 0 (pg.c:213)

    while t < cfg.tend - 1e-10:
        tnext = min(next_out, cfg.tend)
        state, diag = step(state, const, jnp.asarray(tnext, state.t.dtype))
        t = float(state.t)
        i = int(state.i)
        if t != t:  # NaN guard, see run_qg
            raise FloatingPointError(
                f"non-finite model time after step {i}: blow-up or NaN in "
                "the state (check DT/CFL; resume from the last checkpoint)")
        if i % 10 == 0:
            state = mspg.accumulate_means(state)
        if hooks.on_log is not None:
            hooks.on_log(i, float(diag.dt), t, 0.0)
        if t >= next_out - 1e-10:
            if hooks.on_output is not None:
                hooks.on_output(state, t)
            state = dataclasses.replace(
                state, nme=jnp.asarray(0, jnp.int32))  # reset running average
            next_out = _next_event(t, cfg.dtout)
        if max_steps is not None and i >= max_steps:
            break
    return state


class OutputWriter:
    """Reference-compatible output: creates `outdir_%04d/`, backs up the
    config, and writes po/qo/pf (+ energy de_*) snapshots as `.bas` files
    with the reference's naming (/root/reference/msqg/qg.c:112-173,
    create_outdir qg.h:766-780, backup_config qg.h:782-835)."""

    def __init__(self, cfg, const, outdir=None, params_text=None):
        import os

        from msom_tpu.parallel import dist

        self.cfg = cfg
        self.const = const
        # outdir creation + all backups happen on process 0 only and the
        # name is broadcast — the reference's pid()==0 mkdir + MPI_Bcast
        # (/root/reference/msqg/qg.h:766-780)
        if outdir is None:
            if dist.is_master():
                for k in range(1, 10000):
                    cand = f"outdir_{k:04d}"
                    try:
                        os.makedirs(cand)
                        outdir = cand
                        break
                    except FileExistsError:
                        continue
            outdir = dist.broadcast_str(outdir)
        elif dist.is_master():
            os.makedirs(outdir, exist_ok=True)
        dist.sync()
        self.dir = outdir
        self._master = dist.is_master()
        if self._master:
            if params_text is not None:
                with open(f"{self.dir}/params.in", "w") as f:
                    f.write(params_text)
            self._backup_config()

    def _backup_config(self):
        """Write the actually-used derived fields, matching backup_config
        (/root/reference/msqg/qg.h:782-835): sig_filt = min(afilt*Rd, Lfmax),
        Rd, psipg, frpg (recovered from strl = (Fr/Ro)^2), qforc, topo, dh."""
        from msom_tpu.io.bas import write_bas

        cfg, const = self.cfg, self.const
        import numpy as np
        write_bas(f"{self.dir}/sig_filt.bas", np.asarray(const.sig_filt),
                  cfg.L0)
        write_bas(f"{self.dir}/rdpg_{cfg.nl}l_N{cfg.N}.bas",
                  np.asarray(const.Rd), cfg.L0)
        pp = (np.zeros((cfg.nl, cfg.N, cfg.N), np.float32)
              if const.pp_pad is None
              else np.asarray(const.pp_pad)[:, 1:-1, 1:-1])
        write_bas(f"{self.dir}/psipg_{cfg.nl}l_N{cfg.N}.bas", pp, cfg.L0)
        if const.strl is not None:
            Fr = np.sqrt(np.asarray(const.strl)) * np.asarray(const.Ro)
            write_bas(f"{self.dir}/frpg_{cfg.nl}l_N{cfg.N}.bas", Fr, cfg.L0)
        if const.qforc is not None:
            write_bas(f"{self.dir}/qforc_{cfg.nl}l_N{cfg.N}.bas",
                      np.asarray(const.qforc), cfg.L0)
        if const.topo_pad is not None:
            write_bas(f"{self.dir}/topo_N{cfg.N}.bas",
                      np.asarray(const.topo_pad)[1:-1, 1:-1], cfg.L0)
        np.asarray(cfg.dh[:cfg.nl], np.float32).tofile(
            f"{self.dir}/dh_{cfg.nl}l.bin")

    def __call__(self, state, t):
        from msom_tpu.io.bas import write_bas
        from msom_tpu.parallel import dist
        import numpy as np

        i = int(state.i)
        cfg = self.cfg
        # device-side work + cross-process gathers happen on EVERY process
        # (skipping them off-master would deadlock multi-process collectives);
        # only the file writes below are master-gated
        psi = dist.fetch_global(state.psi)
        q = dist.fetch_global(state.q)
        pf = tr = None
        if state.qof is not None and cfg.dtflt > 0:
            from msom_tpu.models import qg as qgm
            # gather FIRST: the writer's own constants may carry a
            # non-partitionable (FFT) basis, so the inversion runs on the
            # replicated gathered field, not the mesh-sharded one
            qof_g = jnp.asarray(dist.fetch_global(state.qof))
            pf_dev, _ = qgm.invert_q(cfg, self.const,
                                     jnp.zeros_like(qof_g), qof_g)
            pf = np.asarray(pf_dev)
        if state.tracers is not None:
            tr = dist.fetch_global(state.tracers)
        if not self._master:
            return
        write_bas(f"{self.dir}/po{i:09d}.bas", np.asarray(psi), cfg.L0)
        write_bas(f"{self.dir}/qo{i:09d}.bas", np.asarray(q), cfg.L0)
        if pf is not None:
            write_bas(f"{self.dir}/pf{i:09d}.bas", np.asarray(pf), cfg.L0)
        if tr is not None:
            write_bas(f"{self.dir}/ptr{i:09d}.bas",
                      np.asarray(tr).reshape(-1, cfg.N, cfg.N), cfg.L0)

    def write_energy(self, energy, i):
        """Flush the per-window energy budget fields rescaled by 1/dtout
        (/root/reference/msqg/qg.c:139-166)."""
        from msom_tpu.io.bas import write_bas
        from msom_tpu.parallel import dist
        import numpy as np

        s = 1.0 / self.cfg.dtout
        for name in ("de_bf", "de_vd", "de_j1", "de_j2", "de_j3", "de_ft"):
            field = dist.fetch_global(getattr(energy, name))
            if self._master:
                write_bas(f"{self.dir}/{name}{i:09d}.bas",
                          np.asarray(field) * s, self.cfg.L0)


def stdout_hooks(stream=None) -> RunHooks:
    """KE heartbeat matching /root/reference/msqg/qg.c:101-109. The stream
    is resolved at log time (not def time) so redirections of sys.stdout
    after import are honored."""
    def log(i, dt, t, ke):
        print(f"i = {i}, dt = {dt:g}, t = {t:g}, ke_1 = {ke:g}",
              file=stream if stream is not None else sys.stdout)
    return RunHooks(on_log=log)


class PGOutputWriter:
    """mspg reference-compatible output (pg.c events writeconst/writestate):
    psibt.bas at t = 0, then running-mean b%09d.bas / u%09d.bas every dtout
    — with the two vertical ghost sigma-layers included in the blocks (the
    reference dumps the full nl+2 lists, pg.c:213-228, vertbc ghosts
    pg.h:374-387) so our files round-trip through load_pg_deck AND through
    the reference's own input_matrixl."""

    def __init__(self, cfg, const, outdir=None, params_text=None):
        import os

        from msom_tpu.parallel import dist

        self.cfg = cfg
        if outdir is None:
            if dist.is_master():
                for k in range(1, 10000):
                    cand = f"outdir_{k:04d}"
                    try:
                        os.makedirs(cand)
                        outdir = cand
                        break
                    except FileExistsError:
                        continue
            outdir = dist.broadcast_str(outdir)
        elif dist.is_master():
            os.makedirs(outdir, exist_ok=True)
        dist.sync()
        self.dir = outdir
        self._master = dist.is_master()
        if self._master:
            from msom_tpu.io.bas import write_bas
            if params_text is not None:
                with open(f"{self.dir}/params.in", "w") as f:
                    f.write(params_text)
            write_bas(f"{self.dir}/psibt.bas", np.asarray(const.psibt),
                      cfg.L0, y0=cfg.ys)

    def __call__(self, state, t):
        from msom_tpu.io.bas import write_bas
        from msom_tpu.parallel import dist

        i = int(state.i)
        cfg = self.cfg
        b = np.asarray(dist.fetch_global(state.b_me))
        ux = np.asarray(dist.fetch_global(state.ux_me))
        uy = np.asarray(dist.fetch_global(state.uy_me))
        if not self._master:
            return
        bg = np.concatenate([b[:1], b, b[-1:]], axis=0)       # vertbc ghosts
        write_bas(f"{self.dir}/b{i:09d}.bas", bg, cfg.L0, y0=cfg.ys)
        # (scalar *) u_mel flattening: [l.x, l.y] per sigma-layer incl.
        # ghosts; faces anchored at their cell (drop the trailing wall face)
        ux_c, uy_c = ux[:, :, :-1], uy[:, :-1, :]
        uxg = np.concatenate([ux_c[:1], ux_c, ux_c[-1:]], axis=0)
        uyg = np.concatenate([uy_c[:1], uy_c, uy_c[-1:]], axis=0)
        inter = np.stack([uxg, uyg], axis=1).reshape(-1, cfg.N, cfg.N)
        write_bas(f"{self.dir}/u{i:09d}.bas", inter, cfg.L0, y0=cfg.ys)


def main(argv=None):
    import argparse
    import os

    from msom_tpu.io.deck import load_pg_deck, load_qg_deck
    from msom_tpu.params import load_pg_config, load_qg_config

    p = argparse.ArgumentParser(description="msom_tpu QG/PG driver — the "
                                "`./qg.e params.in` / `./pg.e params.in` "
                                "equivalent, incl. deck-directory input "
                                "files and outdir_%%04d output")
    p.add_argument("--config", required=True, help="params.in path")
    p.add_argument("--model", choices=["qg", "pg"], default="qg")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--deck", default=None,
                   help="deck directory with input files (p0.bas, psipg_*, "
                        "b0.bas, ...); defaults to the config's directory")
    p.add_argument("--outdir", default=None,
                   help="output directory (default: next free outdir_%%04d)")
    p.add_argument("--no-output", action="store_true",
                   help="skip file output (stdout KE log only)")
    p.add_argument("--sharded", action="store_true",
                   help="domain decomposition over all local devices "
                        "(the reference's mpirun entry, msqg/qg.c:13-14)")
    p.add_argument("--sharded-mode", choices=["auto", "rows", "gspmd"],
                   default="auto",
                   help="sharded execution mode: 'rows' = kernel-keeping "
                        "explicit shard_map rows decomposition, 'gspmd' = "
                        "partitioner placement, 'auto' = rows when the "
                        "config is kernel-covered else gspmd")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from msom_tpu.parallel import dist
    dist.initialize()

    with open(args.config) as f:
        params_text = f.read()
    deckdir = args.deck or os.path.dirname(os.path.abspath(args.config))
    log = (lambda s: print(s)) if dist.is_master() else (lambda s: None)

    t0 = time.time()
    if args.model == "pg":
        from msom_tpu.models import mspg
        cfg = load_pg_config(params_text)
        deck = load_pg_deck(cfg, deckdir, log=log)
        const = mspg.build_constants(cfg, **deck["const"])
        state = mspg.init_state(cfg, const, **deck["init"])
        hooks = stdout_hooks()
        if not args.no_output:
            hooks.on_output = PGOutputWriter(cfg, const, outdir=args.outdir,
                                             params_text=params_text)
        state = run_pg(cfg, const=const, state=state, hooks=hooks,
                       max_steps=args.steps, sharded=args.sharded)
    else:
        cfg = load_qg_config(params_text)
        if args.sharded and args.sharded_mode == "gspmd":
            cfg = sharded_cfg(cfg)
        deck = load_qg_deck(cfg, deckdir, log=log)
        const = qg_model.build_constants(cfg, **deck["const"])
        state = qg_model.init_state(cfg, const, **deck["init"])
        hooks = stdout_hooks()
        if not args.no_output:
            hooks.on_output = OutputWriter(cfg, const, outdir=args.outdir,
                                           params_text=params_text)
        state = run_qg(cfg, const=const, state=state, hooks=hooks,
                       max_steps=args.steps,
                       sharded=args.sharded_mode if args.sharded else False)
    wall = time.time() - t0
    n_steps = int(state.i)
    if dist.is_master():
        print(json.dumps({
            "steps": n_steps, "t": float(state.t), "wall_s": wall,
            "points_per_s": cfg.N * cfg.N * cfg.nl * n_steps
            / max(wall, 1e-9)}))


if __name__ == "__main__":
    main()
