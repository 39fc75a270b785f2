"""Generate GOLDEN.md: the committed lockstep-trajectory record.

Runs the independent NumPy/scipy full-step oracle (tests/oracle_full_step.py)
and the JAX model (msom_tpu.models.qg) in lockstep on the Verron double-gyre
deck (/root/reference/msqg/test/params.double_gyre.in scaled to 64^2/128^2,
float64) and records the KE trajectory, the per-step agreement, and the
mg(tol=1e-3)-vs-exact drift. Deterministic (seeded); rerun with

    python tools/make_golden.py

from the repo root to regenerate after an intentional physics change.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from msom_tpu.params import QGConfig
from msom_tpu.models import qg as m
from tests.oracle_full_step import Oracle


def verron(N, solver, **kw):
    base = dict(N=N, nl=3, L0=80, Rom=0.025, Ekb=0.002, tau0=1e-4, Re4=1563,
                beta=0.5, Fr=(0.0023669, 0.0076173), dh=(0.06, 0.14, 0.8),
                DT=5e-2, tend=500., dtout=1., CFL=0.6, dtype="float64",
                solver=solver)
    base.update(kw)
    return QGConfig(**base).validate()


def lockstep(cfg, steps, seed, record_at):
    rng = np.random.default_rng(seed)
    psi0 = 1e-3 * rng.uniform(-1, 1, (cfg.nl, cfg.N, cfg.N))
    psi0 -= psi0.mean(axis=(-2, -1), keepdims=True)
    const = m.build_constants(cfg)
    state = m.init_state(cfg, const, psi0=psi0)
    step = jax.jit(m.make_step(cfg))
    orc = Oracle(cfg)
    q, psi, prev, t = orc.comp_q(psi0.copy()), psi0.copy(), 0.0, 0.0
    rows = []
    for i in range(1, steps + 1):
        q, psi, prev, dt_o, ke_o = orc.step(q, psi, prev, t, 1e9)
        t += dt_o
        state, diag = step(state, const, jnp.asarray(1e9, state.t.dtype))
        if i in record_at:
            rows.append(dict(
                i=i, t=t, dt=dt_o, ke=ke_o,
                relq=float(np.abs(np.asarray(state.q) - q).max()
                           / np.abs(q).max()),
                relpsi=float(np.abs(np.asarray(state.psi) - psi).max()
                             / np.abs(psi).max()),
                relke=float(abs(float(diag.ke) - ke_o) / abs(ke_o))))
    return rows, q, psi


def table(rows, cols):
    head = "| " + " | ".join(cols) + " |"
    sep = "|" + "|".join("---" for _ in cols) + "|"
    fmt = {"i": "{:d}", "t": "{:.6f}", "dt": "{:.9g}", "ke": "{:.12g}",
           "relq": "{:.3e}", "relpsi": "{:.3e}", "relke": "{:.3e}"}
    body = ["| " + " | ".join(fmt[c].format(r[c]) for c in cols) + " |"
            for r in rows]
    return "\n".join([head, sep] + body)


def lockstep_node(cfg, steps, seed, record_at, oracle_kw=None,
                  const_kw=None):
    from msom_tpu.models import qg_node as qn
    from tests.oracle_node import NodeOracle

    const = qn.build_constants(cfg, **(const_kw or {}))
    state = qn.init_state(cfg, const, seed=seed)
    orc = NodeOracle(cfg, **(oracle_kw or {}))
    psi = np.asarray(state.psi, np.float64)
    q = orc.comp_q(psi.copy())
    step = jax.jit(qn.make_step(cfg))
    prev, t = 0.0, 0.0
    tnext = jnp.asarray(1e18, state.t.dtype)
    rows = []
    for i in range(1, steps + 1):
        q, psi, prev, dt_o = orc.step(q, psi, prev, t)
        t += dt_o
        state, diag = step(state, const, tnext)
        if i in record_at:
            rows.append(dict(
                i=i, t=t, dt=dt_o, ke=float(diag.ke),
                relq=float(np.abs(np.asarray(state.q) - q).max()
                           / np.abs(q).max()),
                relpsi=float(np.abs(np.asarray(state.psi) - psi).max()
                             / np.abs(psi).max())))
    return rows


def lockstep_pg(cfg, steps, record_at):
    from msom_tpu.models import mspg
    from tests.oracle_pg import PGOracle

    const = mspg.build_constants(cfg)
    state = mspg.init_state(cfg, const)
    step = jax.jit(mspg.make_step(cfg))
    orc = PGOracle(cfg, const)
    b = np.zeros((cfg.nl, cfg.N, cfg.N))
    ux = np.zeros((cfg.nl, cfg.N, cfg.N + 1))
    uy = np.zeros((cfg.nl, cfg.N + 1, cfg.N))
    prev, t = 0.0, 0.0
    tnext = jnp.asarray(1e18, state.t.dtype)
    rows = []
    for i in range(1, steps + 1):
        b, ux, uy, prev, dt_o = orc.step(b, ux, uy, prev, t)
        t += dt_o
        state, diag = step(state, const, tnext)
        if i in record_at:
            us = max(np.abs(ux).max(), np.abs(uy).max(), 1e-30)
            rows.append(dict(
                i=i, t=t, dt=dt_o,
                relq=float(np.abs(np.asarray(state.b) - b).max()
                           / max(np.abs(b).max(), 1e-30)),
                relpsi=float(max(
                    np.abs(np.asarray(state.ux) - ux).max(),
                    np.abs(np.asarray(state.uy) - uy).max()) / us)))
    return rows


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--north-star", action="store_true",
                    help="also run the 1000-step 256^2 x 3 lockstep "
                         "(BASELINE.md north-star bar; ~20 min on CPU)")
    args = ap.parse_args()

    rec64 = set(range(25, 251, 25)) | {1, 5, 10}
    rows_sp, q_f, psi_f = lockstep(verron(64, "spectral"), 250, 42, rec64)
    rows_mg, _, _ = lockstep(verron(64, "mg"), 250, 42, rec64)
    rows_128, _, _ = lockstep(verron(128, "spectral"), 60, 42,
                              {1, 10, 20, 30, 40, 50, 60})
    rows_slip, _, _ = lockstep(verron(64, "spectral", sbc=1.0), 80, 7,
                               {1, 20, 40, 60, 80})

    # qg-node + mspg independent oracles (r4)
    from msom_tpu.models import qg_node as qn
    from msom_tpu.params import PGConfig
    node_cfg = qn.NodeQGConfig(
        N=64, nl=3, L0=100.0, f0=46.5, beta=0.5, hEkb=1e-3, tau0=1e-3,
        tau1=5e-4, tf1=2.0, tf2=3.0, dy_ws=0.3, nu=5.0,
        dh=(0.2, 0.3, 0.5), N2=(1.0, 2.0), noise_init=1e-3, bc_fac=0.0,
        DT=5e-2, tend=10.0, dtout=10.0, CFL=0.2, TOLERANCE=1e-8,
        solver="spectral", dtype="float64")
    rows_node = lockstep_node(node_cfg, 100, 11,
                              {1, 10, 25, 50, 75, 100})
    pg_cfg = PGConfig(N=32, nl=8, ys=0.3, r=0.02, tau_s=3e-2, tau0=0.12,
                      kv=1e-4, kh=1e-4, omega=0.2, DT=1e-2, CFL=0.4,
                      tend=10.0, dtout=10.0, dtype="float64")
    rows_pg = lockstep_pg(pg_cfg, 120, {1, 10, 30, 60, 90, 120})

    rows_1000 = None
    if args.north_star:
        rec1000 = set(range(100, 1001, 100)) | {1, 10, 50}
        rows_1000, _, _ = lockstep(verron(256, "spectral"), 1000, 42,
                                   rec1000)

    north_star_md = ""
    if rows_1000 is not None:
        north_star_md = f"""
## North star: 256^2 x 3, 1000 steps, solver="spectral" (deck-native N)

BASELINE.md's stated bar verbatim: "psi/q allclose after 1000 steps of the
double-gyre run" at the deck's own N = 256
(/root/reference/msqg/test/params.double_gyre.in). Machine precision
throughout. Recorded table (regenerate: make_golden.py --north-star; not a
CI test — ~20 min):

{table(rows_1000, ["i", "t", "ke", "relq", "relpsi"])}
"""

    md = f"""# GOLDEN — lockstep trajectory record (Verron double gyre)

**Claim.** The msqg step (`msom_tpu/models/qg.py make_step`) reproduces the
reference's full time step — exact PV inversion, Arakawa advection + stretch
cascade, biharmonic dissipation, Ekman friction, wind forcing, the Basilisk
`timestep()` CFL controller with `previous`-smoothing, `dtnext` event
clamping, and the 2nd-order predictor-corrector — to **machine precision in
float64**, verified in lockstep for 250 steps against an INDEPENDENT
NumPy/scipy oracle (`tests/oracle_full_step.py`: padded-slice stencils +
sparse-LU exact inversion; a completely separate data path from the JAX
model's roll-based ghost views and DST/modal spectral solver).

**Why an oracle and not the compiled reference:** qcc/Basilisk (the
reference's compiler/runtime) is NOT installed in this environment, so a
compiled-reference trajectory cannot be produced here. The comparison against
the compiled binary is *deferred, not forgotten* — the oracle transcribes
/root/reference/msqg/qg.h:609-650 (update_qg), :287-393 (advection_pv),
:406-459 (dissip/ekman/forcing), :113-163 (invertq), layer.h:17-27 (walls),
and the timestep()/dtnext recurrences (qg-node/qg.h:258-284, Basilisk
events.h) line by line, and its 12-point Jacobian is checked index-for-index
against the per-cell loop transcription in tests/reference_numpy.py.

Deck: /root/reference/msqg/test/params.double_gyre.in scaled to N (Re4 kept;
DT clamped to {verron(64, 'mg').dt_clamped()} by the biharmonic viscous-CFL
rule, msqg/qg.h:745-746). ICs: seeded uniform noise 1e-3, zero-mean
(qg.c:53-92). float64. Regenerate: `python tools/make_golden.py`.
Regression-tested by tests/test_lockstep.py (tolerances 100-1000x above the
measured agreement, far below any physical signal).

## 64^2 x 3 layers, solver="spectral" (exact), 250 steps, seed 42

{table(rows_sp, ["i", "t", "dt", "ke", "relq", "relpsi", "relke"])}

Final-state checksums: max|q| = {np.abs(q_f).max():.12g},
max|psi| = {np.abs(psi_f).max():.12g},
sum q^2 = {float((q_f ** 2).sum()):.12g}.

## 128^2 x 3 layers, solver="spectral", 60 steps, seed 42

{table(rows_128, ["i", "t", "ke", "relq", "relpsi"])}

## Partial-slip walls (sbc = 1), 64^2, 80 steps, seed 7

Validates the partial-slip vorticity ghost law end-to-end
(/root/reference/msqg/qg.h:185-198).

{table(rows_slip, ["i", "relq", "relpsi"])}

## solver="mg" (reference-parity multigrid, tol = 1e-3) vs exact oracle

The reference solves the PV inversion by multigrid to max-norm residual
1e-3 (msqg/qg.h:159); our mg path reproduces those semantics. Its
trajectory therefore differs from the exact one at the solver-tolerance
level — the drift below stays BOUNDED around 1e-3 (it does not grow
secularly), which is the quantitative statement of "spectral and mg agree
within the tolerance the physics cares about" (the spectral path is strictly
more accurate than the reference's own solver):

{table(rows_mg, ["i", "relq", "relpsi", "relke"])}

## qg-node 64^2 x 3 baroclinic, 100 steps, seed 11 (independent oracle)

Lockstep vs `tests/oracle_node.py` — an independent NumPy/scipy
re-transcription of the qg-node step (explicit slice stencils + sparse-LU
interior inversion vs the model's roll-based views + DST-I spectral solve);
the model runs solver="spectral". This oracle FOUND and pinned a real model
deviation in r4: the biharmonic intermediate's no-slip ring relation
(set_bc_ms, qg_baroclinic_ms.h:67-69 — the parent's own ring value must be
subtracted), fixed in models/qg_node.py + parallel/vshard.py. The coupled
no-slip variant (PG coupling + topography + 3-D forcing + nu4, bc_fac = 1)
and the nl = 1 barotropic module are regression-locked at the same
precision by tests/test_lockstep_node.py.

{table(rows_node, ["i", "t", "dt", "ke", "relq", "relpsi"])}

## mspg 32^2 x 30-sigma gyre spin-up, 120 steps (independent oracle)

Lockstep vs `tests/oracle_pg.py` — an independent NumPy re-transcription of
update_pg/advance_pg (pg.h:733-800: flux-form advection with the diagnostic
w integrated in a literal bottom-up layer loop, literal Thomas vertical
diffusion, sequential top-down convection sweep, surface relaxation,
momentum, barotropic adjustment). relq column = relative buoyancy error,
relpsi = relative face-velocity error. The init-time barotropic solve
(btsolver + circ_bc) is shared setup, validated separately by
tests/test_mspg.py.

{table(rows_pg, ["i", "t", "dt", "relq", "relpsi"])}
{north_star_md}"""
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "GOLDEN.md")
    with open(out, "w") as f:
        f.write(md)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
