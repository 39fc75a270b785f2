"""Run loops for the qg-node, newqg, and sqg model families.

Mirrors the reference drivers' event schedules (the Basilisk `run()` loop
becomes an explicit host loop around a jitted step, like driver.run_qg):

* qg-node (/root/reference/qg-node/qg.c:130-179, qg.h:361-400,486-499):
  `vars.nc` NetCDF record every dtout (psi, q on the (N+1)^2 vertex grid,
  firing at t = 0 too), `diag_1d.dat` header at t = 0 then
  `t, ke, dissipation, forcing` rows every dtdiag, the wavelet filter every
  dtflt, automatic `restart.nc` pickup (psi at the last stored record,
  backed up into the output dir), KE heartbeat each step, and the
  time-varying wandering-gyre wind — already recomputed inside the jitted
  step from model time (models/qg_node.q_forcing_field), so the reference's
  per-step `event forcing` needs no host-side hook.
* newqg (/root/reference/newqg/qg.c:50-99): cell-centered vars.nc every
  dtout, restart.nc pickup, KE heartbeat.
* sqg (qg-node compiled with -DSQG): as qg-node with the surface buoyancy
  `bs` as an extra output/restart variable
  (/root/reference/qg-node/qg.h:492-495).

All filesystem side effects are gated on parallel.dist.is_master()
(the reference's pid()==0 guards, qg-node/extra.h:121-135).
"""

from __future__ import annotations

import dataclasses
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from msom_tpu.driver import RunHooks, _next_event
from msom_tpu.io.netcdf import NCWriter, read_nc
from msom_tpu.parallel import dist


def create_outdir(outdir: str | None, prefix: str = "outdir") -> str:
    """First free `outdir_%04d/` (create_outdir, qg-node/extra.h:121-135),
    created on the master process and broadcast to the others (the
    reference's MPI_Bcast of dpath)."""
    if outdir is None:
        if dist.is_master():
            for k in range(1, 10000):
                cand = f"{prefix}_{k:04d}"
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
    return outdir


class NodeOutput:
    """vars.nc + diag_1d.dat + config backup for the node-family drivers."""

    def __init__(self, cfg, outdir: str | None = None, *, var_names=("psi", "q"),
                 vertex=True, params_text=None):
        self.cfg = cfg
        self.names = list(var_names)
        self.dir = create_outdir(outdir)
        self.nc = None
        self.vertex = vertex
        if dist.is_master():
            nl = cfg.nl if cfg.nl > 1 else None
            self.nc = NCWriter(os.path.join(self.dir, "vars.nc"),
                               self.names, cfg.N, nl=nl, L0=cfg.L0,
                               vertex=vertex, surface_vars=("bs",))
            if params_text is not None:
                with open(os.path.join(self.dir, "params.in"), "w") as f:
                    f.write(params_text)
        self._diag_path = os.path.join(self.dir, "diag_1d.dat")

    def write(self, t, **fields):
        arrays = {k: dist.fetch_global(v) for k, v in fields.items()}
        if self.nc is not None:
            self.nc.append(t, **arrays)

    def diag_header(self):
        if dist.is_master():
            with open(self._diag_path, "a") as f:
                f.write("# time, ke, dissipation, forcing\n")

    def diag_row(self, t, ke, d_ke, f_ke):
        if dist.is_master():
            with open(self._diag_path, "a") as f:
                f.write(f"{t:e}, {ke:e}, {d_ke:e}, {f_ke:e}\n")

    def backup_restart(self, path):
        """Copy the consumed restart.nc into the output dir (backup_file,
        qg-node/qg.h:497)."""
        if dist.is_master():
            shutil.copy(path, os.path.join(self.dir, "restart.nc.bak"))

    def backup_file(self, path):
        """Copy a consumed input file into the output dir (backup_file,
        /root/reference/qg-node/extra.h:137-178 — the reference backs up
        input_vars_<nl>l_N<N>.nc at init, qg_baroclinic_ms.h:492)."""
        if dist.is_master():
            shutil.copy(path, os.path.join(self.dir,
                                           os.path.basename(path)))

    def close(self):
        if self.nc is not None:
            self.nc.close()


def _maybe_restart(path: str | None):
    """(fields, t) from restart.nc's last record, or (None, None)."""
    if path and os.path.exists(path):
        return path
    return None


def run_node(cfg, *, const=None, state=None, hooks: RunHooks | None = None,
             max_steps: int | None = None, outdir=None, output=None,
             restart: str | None = "restart.nc", params_text=None,
             deck: str | None = None, sharded: bool = False, mesh=None):
    """Integrate the qg-node model to cfg.tend with the reference's event
    schedule. Returns (final_state, output).

    `deck`: directory holding input_vars_<nl>l_N<N>.nc (N2, psi_pg, mask,
    topo, q_forcing_3d — /root/reference/qg-node/qg_baroclinic_ms.h:478-495);
    the consumed file is backed up into the output dir.

    `sharded`: run the owned-node vertex-sharded step (parallel/vshard.py)
    over `mesh` (default: all local devices, as square as possible) — the
    reference's MPI domain decomposition (inner-vertex.h)."""
    from msom_tpu.models import qg_node as node

    hooks = hooks or RunHooks()
    deck_nc = None
    if const is None:
        kw = {}
        if deck is not None:
            from msom_tpu.io.deck import load_node_deck
            d = load_node_deck(
                cfg, deck,
                log=(print if dist.is_master() else None))
            kw = d["const"]
            deck_nc = d["path"]
        const = node.build_constants(cfg, **kw)
    if state is None:
        state = node.init_state(cfg, const)
    rp = _maybe_restart(restart)
    if rp and state is not None:
        fields, t0 = read_nc(rp, ["psi"])
        psi = jnp.asarray(fields["psi"].reshape(cfg.nl, cfg.N + 1, cfg.N + 1),
                          jnp.dtype(cfg.dtype))
        if cfg.periodic:
            psi = psi[..., :-1, :-1]   # drop the wrapped ring
        else:
            from msom_tpu.ops import vertex
            psi = vertex.bc_psi(psi)
        state = dataclasses.replace(
            state, psi=psi, q=node.comp_q(cfg, const, psi),
            t=jnp.asarray(t0, jnp.dtype(cfg.dtype)))

    if output is None:
        output = NodeOutput(cfg, outdir, params_text=params_text)
    if rp:
        output.backup_restart(rp)
    if deck_nc:
        output.backup_file(deck_nc)
    if sharded:
        if cfg.periodic:
            raise NotImplementedError(
                "vertex sharding covers wall domains; run periodic "
                "qg-node configs on the unsharded/GSPMD path")
        return _run_node_sharded(cfg, const, state, hooks, max_steps,
                                 output, mesh)
    step = jax.jit(node.make_step(cfg))

    t = float(state.t)
    next_out = 0.0                               # output fires at t = 0
    next_diag = 0.0 if cfg.dtdiag > 0 else np.inf
    next_flt = _next_event(t, cfg.dtflt)
    wrote_header = False

    def fire_output(state, t):
        # at i == 0 the reference re-inverts before writing (qg.c:163-166)
        psi = state.psi
        if int(state.i) == 0:
            psi, _ = node.invert_q(cfg, const, state.psi, state.q)
        output.write(t, psi=node.to_vertex_full(cfg, psi),
                     q=node.to_vertex_full(cfg, state.q))
        if hooks.on_output is not None:
            hooks.on_output(state, t)
        return dataclasses.replace(state, nbar=jnp.asarray(0, jnp.int32))

    while True:
        if t >= next_out - 1e-10:
            state = fire_output(state, t)
            next_out = _next_event(t, cfg.dtout)
        if cfg.dtdiag > 0 and t >= next_diag - 1e-10:
            if not wrote_header:
                output.diag_header()
                wrote_header = True
            else:
                ke, d_ke, f_ke = (float(x) for x in node.diag_1d(
                    cfg, const, state.psi, state.q, t))
                output.diag_row(t, ke, d_ke, f_ke)
            next_diag = _next_event(t, cfg.dtdiag)
        if cfg.dtflt > 0 and t >= next_flt - 1e-10:
            state = node.wavelet_filter(cfg, const, state)
            if hooks.on_filter is not None:
                hooks.on_filter(state, t)
            next_flt = _next_event(t, cfg.dtflt)
        if t >= cfg.tend - 1e-10:
            break

        tnext = min(next_out, next_diag, next_flt, cfg.tend)
        state, diag = step(state, const, jnp.asarray(tnext, state.t.dtype))
        t = float(state.t)
        i = int(state.i)
        if t != t:
            raise FloatingPointError(
                f"non-finite model time after step {i}: blow-up or NaN "
                "(check DT/CFL; resume from the last restart.nc)")
        if hooks.on_log is not None:
            hooks.on_log(i, float(diag.dt), t, float(diag.ke))
        if max_steps is not None and i >= max_steps:
            break
    output.close()
    return state, output


def _default_mesh(n_devices=None):
    """All local devices on a ('y', 'x') mesh, as square as possible."""
    from jax.sharding import Mesh

    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    n = len(devs)
    my = 1
    for cand in range(int(n ** 0.5), 0, -1):
        if n % cand == 0:
            my = cand
            break
    return Mesh(np.array(devs).reshape(my, n // my), ("y", "x"))


def _run_node_sharded(cfg, const, state, hooks, max_steps, output, mesh):
    """The run_node event loop on the vertex-sharded step (vshard v2:
    topography, 3-D forcing, stochastic kick, in-loop wavelet filter)."""
    import dataclasses as dc

    from msom_tpu.models import qg_node as node
    from msom_tpu.parallel import vshard

    if mesh is None:
        mesh = _default_mesh()
    own0 = vshard.owned_state(state)
    step, place, csh = vshard.make_node_step_sharded(
        cfg, mesh, const, np.asarray(state.q), own0)
    filt = None
    if cfg.dtflt > 0:
        filt = vshard.make_node_filter_sharded(cfg, mesh, own0)
    s = place(own0)

    def full_psi_q(s):
        psi = vshard.to_full(jnp.asarray(dist.fetch_global(s.psi)))
        q = vshard.to_full(jnp.asarray(dist.fetch_global(s.q)),
                           ring_row=jnp.asarray(dist.fetch_global(
                               csh.ring.q_top)),
                           ring_col=jnp.asarray(dist.fetch_global(
                               csh.ring.q_right)))
        return psi, q

    t = float(dist.fetch_global(s.t))
    next_out = 0.0
    next_diag = 0.0 if cfg.dtdiag > 0 else np.inf
    next_flt = _next_event(t, cfg.dtflt)
    wrote_header = False

    while True:
        if t >= next_out - 1e-10:
            psi_full, q_full = full_psi_q(s)
            if int(dist.fetch_global(s.i)) == 0:
                psi_full, _ = node.invert_q(cfg, const, psi_full, q_full)
            output.write(t, psi=psi_full, q=q_full)
            if hooks.on_output is not None:
                hooks.on_output(s, t)
            s = dc.replace(s, nbar=jnp.asarray(0, jnp.int32))
            next_out = _next_event(t, cfg.dtout)
        if cfg.dtdiag > 0 and t >= next_diag - 1e-10:
            if not wrote_header:
                output.diag_header()
                wrote_header = True
            else:
                psi_full, q_full = full_psi_q(s)
                ke, d_ke, f_ke = (float(x) for x in node.diag_1d(
                    cfg, const, psi_full, q_full, t))
                output.diag_row(t, ke, d_ke, f_ke)
            next_diag = _next_event(t, cfg.dtdiag)
        if cfg.dtflt > 0 and t >= next_flt - 1e-10:
            s, ring = filt(s, csh)
            csh = dc.replace(csh, ring=ring)
            if hooks.on_filter is not None:
                hooks.on_filter(s, t)
            next_flt = _next_event(t, cfg.dtflt)
        if t >= cfg.tend - 1e-10:
            break

        tnext = min(next_out, next_diag, next_flt, cfg.tend)
        s, diag = step(s, csh, jnp.asarray(tnext, s.t.dtype))
        t = float(dist.fetch_global(s.t))
        i = int(dist.fetch_global(s.i))
        if t != t:
            raise FloatingPointError(
                f"non-finite model time after step {i}: blow-up or NaN "
                "(check DT/CFL; resume from the last restart.nc)")
        if hooks.on_log is not None:
            hooks.on_log(i, float(diag.dt), t, float(diag.ke))
        if max_steps is not None and i >= max_steps:
            break
    output.close()
    return s, output


def run_newqg(cfg, *, lam=None, state=None, hooks: RunHooks | None = None,
              max_steps: int | None = None, outdir=None, output=None,
              restart: str | None = "restart.nc", params_text=None):
    """Integrate the newqg model (/root/reference/newqg/qg.c driver loop)."""
    from msom_tpu.models import newqg

    hooks = hooks or RunHooks()
    if lam is None:
        _, lam = newqg.build_levels(cfg)
    if state is None:
        state = newqg.init_state(cfg, lam)
    rp = _maybe_restart(restart)
    if rp:
        fields, t0 = read_nc(rp, ["psi"])
        psi = jnp.asarray(fields["psi"].reshape(cfg.nl, cfg.N, cfg.N),
                          jnp.dtype(cfg.dtype))
        state = newqg.NewQGState(
            q=newqg.comp_q(cfg, lam, psi), psi=psi,
            t=jnp.asarray(t0, jnp.dtype(cfg.dtype)),
            dt_prev=jnp.asarray(0.0, jnp.dtype(cfg.dtype)),
            i=jnp.asarray(0, jnp.int32))

    if output is None:
        output = NodeOutput(cfg, outdir, vertex=False,
                            params_text=params_text)
    if rp:
        output.backup_restart(rp)
    step = jax.jit(newqg.make_step(cfg))

    t = float(state.t)
    next_out = 0.0
    while True:
        if t >= next_out - 1e-10:
            output.write(t, psi=state.psi, q=state.q)
            if hooks.on_output is not None:
                hooks.on_output(state, t)
            next_out = _next_event(t, cfg.dtout)
        if t >= cfg.tend - 1e-10:
            break
        tnext = min(next_out, cfg.tend)
        state, diag = step(state, jnp.asarray(tnext, state.t.dtype))
        t = float(state.t)
        i = int(state.i)
        if t != t:
            raise FloatingPointError(
                f"non-finite model time after step {i} (check DT/CFL)")
        if hooks.on_log is not None:
            hooks.on_log(i, float(diag.dt), t, float(diag.ke))
        if max_steps is not None and i >= max_steps:
            break
    output.close()
    return state, output


def run_sqg(cfg, *, const=None, state=None, hooks: RunHooks | None = None,
            max_steps: int | None = None, outdir=None, output=None,
            restart: str | None = "restart.nc", params_text=None):
    """Integrate the SQG variant (qg-node with -DSQG: bs is prognostic and
    participates in output + restart, /root/reference/qg-node/qg.h:492-495)."""
    from msom_tpu.models import sqg
    from msom_tpu.ops import vertex

    hooks = hooks or RunHooks()
    if const is None:
        const = sqg.build_constants(cfg)
    if state is None:
        state = sqg.init_state(cfg, const)
    rp = _maybe_restart(restart)
    if rp:
        # the reference reads {psi, bs} from restart.nc (qg-node/qg.h:492-495)
        fields, t0 = read_nc(rp, ["psi", "bs"])
        dtp = jnp.dtype(cfg.dtype)
        psi = vertex.bc_psi(jnp.asarray(
            fields["psi"].reshape(cfg.nl, cfg.N + 1, cfg.N + 1), dtp))
        bs = jnp.asarray(fields["bs"], dtp)
        state = dataclasses.replace(
            state, psi=psi, bs=bs, q=sqg.comp_q(cfg, const, psi, bs),
            t=jnp.asarray(t0, dtp))

    if output is None:
        output = NodeOutput(cfg, outdir, var_names=("psi", "q", "bs"),
                            params_text=params_text)
    if rp:
        output.backup_restart(rp)
    step = jax.jit(sqg.make_step(cfg))

    t = float(state.t)
    next_out = 0.0
    while True:
        if t >= next_out - 1e-10:
            output.write(t, psi=state.psi, q=state.q, bs=state.bs)
            if hooks.on_output is not None:
                hooks.on_output(state, t)
            next_out = _next_event(t, cfg.dtout)
        if t >= cfg.tend - 1e-10:
            break
        tnext = min(next_out, cfg.tend)
        state, diag = step(state, const, jnp.asarray(tnext, state.t.dtype))
        t = float(state.t)
        i = int(state.i)
        if t != t:
            raise FloatingPointError(
                f"non-finite model time after step {i} (check DT/CFL)")
        if hooks.on_log is not None:
            hooks.on_log(i, float(diag.dt), t, float(diag.ke))
        if max_steps is not None and i >= max_steps:
            break
    output.close()
    return state, output


def main(argv=None):
    """CLI: `python -m msom_tpu.driver_node --model node|newqg|sqg
    --config params.in` — the `./qg.e params.in` equivalent."""
    import argparse

    from msom_tpu.driver import stdout_hooks

    p = argparse.ArgumentParser(description="msom_tpu node-family driver")
    p.add_argument("--model", choices=["node", "newqg", "sqg"],
                   default="node")
    p.add_argument("--config", required=True, help="params.in path")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--outdir", default=None)
    p.add_argument("--restart", default="restart.nc")
    p.add_argument("--deck", default=None,
                   help="deck directory with input_vars_<nl>l_N<N>.nc; "
                        "defaults to the config's directory")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--sharded", action="store_true",
                   help="vertex-sharded step over all local devices "
                        "(parallel/vshard.py; qg-node model only)")
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    dist.initialize()

    import os as _os
    deck = args.deck or _os.path.dirname(_os.path.abspath(args.config))

    with open(args.config) as f:
        text = f.read()
    if args.model == "newqg":
        from msom_tpu.models.newqg import load_newqg_config
        cfg = load_newqg_config(text)
        run_newqg(cfg, hooks=stdout_hooks(), max_steps=args.steps,
                  outdir=args.outdir, restart=args.restart, params_text=text)
    else:
        from msom_tpu.models.qg_node import load_node_config
        cfg = load_node_config(text)
        if args.model == "sqg":
            run_sqg(cfg, hooks=stdout_hooks(), max_steps=args.steps,
                    outdir=args.outdir, restart=args.restart,
                    params_text=text)
        else:
            run_node(cfg, hooks=stdout_hooks(), max_steps=args.steps,
                     outdir=args.outdir, restart=args.restart,
                     params_text=text, deck=deck, sharded=args.sharded)


if __name__ == "__main__":
    main()
