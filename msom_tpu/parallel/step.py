"""Explicit shard_map model step: the whole msqg predictor-corrector on a
('y', 'x') device mesh with ppermute halo exchanges, a sharded multigrid
inversion (replicated coarse tail), pmax CFL/convergence reductions and a
psum KE diagnostic — the fully explicit-collective counterpart of running
models.qg.make_step under GSPMD (SURVEY.md §2.5, §3.1 process boundaries).

Usage:
    mesh = make_mesh(8)
    step, place = make_qg_step_sharded(cfg, mesh)
    state, const = place(state), place(const)
    state, diag = step(state, const, tnext)   # jit-able

Supported configuration (v2): the full msqg model except the modal
(mode_pv_invert) inversion — the PG coupling, large-scale relative
vorticity and topography constants ride REPLICATED in padded form, each
device slicing its (tile + ghost) window locally (their ghosts carry
custom precomputed boundary laws, so no ppermute is needed for constant
fields); passive tracers shard and advance like q. The modal inversion
falls back to the GSPMD path.

ROWS FAST PATH (v3, the kernel-keeping distributed mode): on a 1-D rows
mesh (mx == 1) the step keeps BOTH single-chip fast paths on every shard —
the fused Pallas RHS/tracer kernels (models.pallas_rhs rows mode: 8-row
ppermute halo slabs feed the tile edges, wall ghost rules key on the
global row index) and the folded-DST spectral inversion (pencil
decomposition, parallel.spectral_shard.solve_spectral_pencil: local folded
matmuls + two all_to_all transposes per transform pair). This is the
distributed counterpart of the reference's one-and-only hot loop under MPI
(/root/reference/msqg/qg.c:13-14): distribution no longer changes the
per-rank code path. On a 1-device mesh every collective is the identity,
so single-chip cost matches the unsharded kernel step.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

import numpy as np

from msom_tpu.models import qg as m
from msom_tpu.ops.bc import BC
from msom_tpu.ops.ghost import laplacian_g
from msom_tpu.parallel import halo, shard_mg, spectral_shard


def _spec_rule(my: int, mx: int):
    """Leaf -> PartitionSpec: horizontal split when each device keeps at
    least a 2x2 tile (agrees with shard_mg.level_is_sharded)."""
    def rule(x):
        if not hasattr(x, "ndim") or x.ndim < 2:
            return P()
        ny, nx = x.shape[-2], x.shape[-1]
        if (ny % my == 0 and nx % mx == 0 and ny // my >= 2
                and nx // mx >= 2):
            return P(*([None] * (x.ndim - 2) + ["y", "x"]))
        return P()
    return rule


def tree_specs(tree, my: int, mx: int):
    return jax.tree.map(_spec_rule(my, mx), tree)


def _build_rows_rhsk(cfg, const_example, my: int):
    """Rows-mode RhsKernelData for the kernel-keeping path, or None when
    the config cannot use the fused kernels (same gates as
    models.qg.build_constants plus rows divisibility)."""
    from msom_tpu.models import pallas_rhs
    from msom_tpu.solvers.pallas_mg import default_interpret
    if not getattr(cfg, "use_pallas", True):
        return None
    if jnp.dtype(cfg.dtype).itemsize > 4 and not default_interpret():
        return None   # compiled TPU kernels are f32/bf16 only
    ok, sprof = pallas_rhs.strl_profile(const_example.strl)
    if not ok:
        return None
    return pallas_rhs.build_kernel_data(
        cfg, np.asarray(const_example.wind), sprof,
        Ro=np.asarray(const_example.Ro),
        pp_pad=const_example.pp_pad, topo_pad=const_example.topo_pad,
        zetap_pad=const_example.zetap_pad,
        need_q=bool(cfg.stochastic or cfg.energy_conserv),
        has_qforc=const_example.qforc is not None, rows=my)


def make_qg_step_sharded(cfg, mesh, state_example, const_example):
    """Build (step, place): `step(state, const, tnext)` is the shard_map'ed
    predictor-corrector; `place(tree)` device_puts a pytree with the
    matching shardings.

    The PV inversion is the sharded direct spectral solve
    (solver="spectral") or the sharded multigrid (solver="mg"). On a rows
    mesh (mx == 1) the ROWS FAST PATH applies (module docstring): fused
    Pallas kernels + pencil folded-DST transforms; otherwise the
    general-mesh XLA forms (reduce-scatter transform decomposition /
    force_matmul basis)."""
    assert not (cfg.mode_pv_invert and const_example.iBu is not None), \
        "sharded step: layered (non-modal) inversion"
    from msom_tpu.solvers.pallas_mg import default_interpret
    my, mx = mesh.devices.shape
    bc = m._bc_psi(cfg)
    DT = cfg.dt_clamped()
    delta = cfg.delta
    ny_l, nx_l = cfg.N // my, cfg.N // mx
    periodic = cfg.sbc == -1

    # rows fast path: fused kernels on shards (requires a pure-rows mesh)
    rhsk_rows = None
    if mx == 1:
        rhsk_rows = _build_rows_rhsk(cfg, const_example, my)
    use_kernels = rhsk_rows is not None and (
        cfg.nptr == 0 or rhsk_rows.Ttr > 0)
    if use_kernels:
        from msom_tpu.models import pallas_rhs
        const_example = dataclasses.replace(const_example, rhsk=rhsk_rows)

    def from_padded_local(p_pad):
        """Ghosted view of this device's tile cut from a REPLICATED padded
        constant (pp/zetap/topo carry custom precomputed ghost laws): the
        (tile + 1-ghost) window starts at padded index (tile origin), so
        neighbor-tile data doubles as the interior ghosts — no ppermute
        needed for constant fields."""
        from msom_tpu.ops.ghost import ghosted_from_padded
        yi, xi = lax.axis_index("y"), lax.axis_index("x")
        zero = jnp.zeros((), yi.dtype)
        start = [zero] * (p_pad.ndim - 2) + [yi * ny_l, xi * nx_l]
        size = list(p_pad.shape[:-2]) + [ny_l + 2, nx_l + 2]
        return ghosted_from_padded(lax.dynamic_slice(p_pad, start, size))

    sd = None
    pencil = False
    if cfg.solver == "spectral":
        from msom_tpu.solvers import spectral as spectral_mod
        assert cfg.N % my == 0 and cfg.N % mx == 0, \
            "sharded spectral: N must divide the mesh"
        assert spectral_mod.applicable(cfg.nl, const_example.strl), \
            "sharded spectral: uniform strl only (varRo configs route " \
            "through GSPMD with the block-Thomas vary solve)"
        strl = const_example.strl
        sprof = None if strl is None else np.asarray(strl)[:, 0, 0]
        build = functools.partial(
            spectral_mod.build_spectral,
            nl=cfg.nl, N=cfg.N, L0=cfg.L0, dh=np.asarray(cfg.dh[:cfg.nl]),
            s_profile=sprof, periodic=periodic, dtype=jnp.dtype(cfg.dtype))
        if mx == 1:
            # pencil path: keep the production transform (folded DST /
            # matmul basis); only the non-partitionable fft must go
            pencil = True
            sd = build(transform=cfg.transform
                       if cfg.transform != "fft" else "matmul")
            if sd.S is None and sd.fac is None:
                sd = build(transform="matmul")
        else:
            sd = build(transform=cfg.transform, force_matmul=True)

    def ghost_deriv(f, parent_g):
        if periodic:
            return halo.ghosted_sharded(f, BC.PERIODIC)
        return halo.ghosted_slip_sharded(f, parent_g, cfg.sbc, delta)

    def solve(const, sdl, q, psi_guess):
        if sdl is not None:
            if pencil:
                psi = spectral_shard.solve_spectral_pencil(sdl, q)
            else:
                psi = spectral_shard.solve_spectral_sharded(sdl, q)
            z = jnp.zeros((), q.dtype)
            st = shard_mg.mg.MGStats(iters=jnp.zeros((), jnp.int32),
                                     resb=z, resa=z,
                                     nrelax=jnp.zeros((), jnp.int32))
            return psi, st
        return shard_mg.solve_layered_sharded(
            psi_guess, q, levels=const.levels, my=my, mx=mx,
            idh0=const.idh0, idh1=const.idh1, bc=bc, tolerance=cfg.tol)

    need_q = bool(cfg.stochastic or cfg.energy_conserv)

    def update(const, sdl, q, psi_guess, tr, prev):
        psi, st = solve(const, sdl, q, psi_guess)
        if use_kernels:
            from msom_tpu.models import pallas_rhs
            row0 = lax.axis_index("y") * ny_l
            psi_ext = halo.ext_rows8(psi, wrap=periodic)
            q_ext = halo.ext_rows8(q, wrap=periodic) if need_q else None
            dq, umax = pallas_rhs.rhs_fused(
                cfg, const, psi, q if need_q else None,
                psi_ext=psi_ext, q_ext=q_ext, row0=row0)
            dtr = None
            if tr is not None:
                ntr = cfg.nl * cfg.nptr
                tr_flat = tr.reshape(ntr, *tr.shape[-2:])
                dtr = pallas_rhs.tracer_fused(
                    cfg, const, psi, tr, psi_ext=psi_ext,
                    tr_ext=halo.ext_rows8(tr_flat, wrap=periodic),
                    row0=row0)
            dtm, prev = m.cfl_from_umax(cfg, umax, const.rhsk.umax_pp,
                                        DT, prev, reduce_fn=halo.pmax2)
            return dq, dtr, psi, prev, dtm, st
        psi_g = halo.ghosted_sharded(psi, bc)
        if halo.overlap_enabled():
            # interior of zeta computes while the psi halos are in flight
            zeta = halo.laplacian_overlap_g(psi_g, delta)
        else:
            zeta = laplacian_g(psi_g, delta)
        zeta_g = ghost_deriv(zeta, psi_g)
        dq, dtr = m.rhs(cfg, const, q, psi, psi_g, zeta, zeta_g, tr,
                        ghost_deriv_fn=ghost_deriv,
                        ghost_fn=lambda f, b: halo.ghosted_sharded(f, b),
                        from_padded_fn=from_padded_local)
        dtm, prev = m.cfl_dtmax(cfg, const, psi_g, DT, prev,
                                reduce_fn=halo.pmax2,
                                from_padded_fn=from_padded_local)
        return dq, dtr, psi, prev, dtm, st

    def local_step(state, const, sdl, tnext):
        q0 = state.q
        tr0 = state.tracers
        have_tr = tr0 is not None
        key = state.key
        noise = None
        if cfg.stochastic:
            # per-device fold-in keeps streams independent across tiles
            key, sub = jax.random.split(key)
            sub = jax.random.fold_in(
                sub, lax.axis_index("y") * mx + lax.axis_index("x"))
            sigma = const.s_stoch if const.s_stoch is not None else 1.0
            noise = cfg.amp_stoch * sigma * jax.random.normal(
                sub, q0.shape, q0.dtype)

        def substep(q_eval, tr_eval, psi, prev, dt, is_first):
            dq, dtr, psi, prev, dtm, st = update(const, sdl, q_eval, psi,
                                                 tr_eval, prev)
            if is_first:
                dt = m.dtnext(state.t, tnext, dtm)
            frac = 0.5 if is_first else 1.0
            q_eval = q0 + dq * (frac * dt)
            if cfg.stochastic:
                q_eval = q_eval + noise * jnp.sqrt(dt) * frac
            if have_tr:
                tr_eval = tr0 + dtr * (frac * dt)
            return q_eval, tr_eval, psi, prev, dt, st

        zero = jnp.zeros((), q0.dtype)
        # mg warm-start extrapolation (models.qg.make_step counterpart)
        guess0 = state.psi
        if state.psi_old is not None:
            guess0 = 2.0 * state.psi - state.psi_old
        q1, tr1, psi1, prev, dt, st1 = substep(q0, tr0, guess0,
                                               state.dt_prev, zero, True)
        q2, tr2, psi2, prev, dt, st2 = substep(q1, tr1, psi1, prev, dt,
                                               False)

        p0 = psi2[0]
        lap0 = laplacian_g(halo.ghosted_sharded(p0[None], bc), delta)[0]
        ke = halo.psum2(-jnp.sum(0.5 * p0 * lap0)) * delta ** 2

        new = m.QGState(q=q2, psi=psi2, t=state.t + dt, dt_prev=prev,
                        i=state.i + 1, key=key, tracers=tr2,
                        qof=state.qof, nbar=state.nbar,
                        psi_old=None if state.psi_old is None
                        else state.psi)
        diag = m.StepDiag(dt=dt, ke=ke, mg_iters=st1.iters, mg_res=st1.resa)
        return new, diag

    state_specs = tree_specs(state_example, my, mx)
    const_specs = tree_specs(const_example, my, mx)
    if use_kernels:
        from msom_tpu.models import pallas_rhs
        const_specs = dataclasses.replace(
            const_specs, rhsk=pallas_rhs.rows_specs(rhsk_rows))
    diag_specs = jax.tree.map(lambda _: P(), m.StepDiag(
        dt=0.0, ke=0.0, mg_iters=0, mg_res=0.0))
    if sd is None:
        sd_specs = None
    elif pencil:
        sd_specs = spectral_shard.pencil_specs(sd, my)
    else:
        sd_specs = spectral_shard.specs(sd, my, mx)

    raw = shard_map(local_step, mesh=mesh,
                    in_specs=(state_specs, const_specs, sd_specs, P()),
                    out_specs=(state_specs, diag_specs),
                    check_vma=False)

    def place(tree):
        if use_kernels and isinstance(tree, m.QGConstants):
            tree = dataclasses.replace(tree, rhsk=rhsk_rows)
            specs = const_specs
        else:
            specs = tree_specs(tree, my, mx)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, specs)

    if sd is not None:
        sd = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), sd,
            sd_specs)

    # sd is passed as a jit ARGUMENT, not a closure: in multi-process runs
    # a closed-over mesh-placed array spans non-addressable devices (and
    # through the TPU tunnel a closure would embed as an HLO literal)
    jstep = jax.jit(raw)

    def step(state, const, tnext):
        return jstep(state, const, sd, tnext)

    step.uses_kernels = use_kernels
    step.uses_pencil = pencil
    # traceable form for lax.scan chaining (bench): raw(state, const, sd,
    # tnext) with `sd` already placed on the mesh
    step.raw = raw
    step.sd = sd
    return step, place
