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


def main():
    rec64 = set(range(25, 251, 25)) | {1, 5, 10}
    rows_sp, q_f, psi_f = lockstep(verron(64, "spectral"), 250, 42, rec64)
    rows_mg, _, _ = lockstep(verron(64, "mg"), 250, 42, rec64)
    rows_128, _, _ = lockstep(verron(128, "spectral"), 60, 42,
                              {1, 10, 20, 30, 40, 50, 60})
    rows_slip, _, _ = lockstep(verron(64, "spectral", sbc=1.0), 80, 7,
                               {1, 20, 40, 60, 80})

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
"""
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "GOLDEN.md")
    with open(out, "w") as f:
        f.write(md)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
