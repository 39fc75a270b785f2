"""End-to-end multiple-scale coupling workflow (VERDICT r5 #5) — the loop
the reference exists for: mspg mean state -> (modes.py/regrid.py stage)
msqg inputs -> msqg run with the wavelet filter accumulating qof ->
(pgforcing.py stage) PG buoyancy forcing -> mspg run with b_forc, budget
responds. Every unit conversion and layout convention of the chain runs
here; the stages are msom_tpu.coupling + the two drivers.

References: /root/reference/mspg/scripts/modes.py, regrid.py,
pgforcing.py:10, mspg/pg.h:598-606 (qg_forcing), msqg/qg.h:950-969
(psipg/frpg/rdpg inputs)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msom_tpu import coupling
from msom_tpu.analysis import regrid_bicubic
from msom_tpu.models import mspg, qg as qgm
from msom_tpu.params import PGConfig, QGConfig

N_PG, NL_PG = 32, 8
N_QG = 64
IL = [0, 2, 4, 8]          # sigma bands -> 3 QG layers


def run_pg_spinup(steps=150, b_forc=None, state0=None):
    cfg = PGConfig(N=N_PG, nl=NL_PG, ys=0.3, r=0.02, tau_s=3e-2,
                   tau0=0.12, kv=1e-4, kh=1e-4, omega=0.2, DT=1e-2,
                   CFL=0.4, tend=1e18, dtout=1e18, dtype="float64")
    const = mspg.build_constants(cfg, b_forc=b_forc)
    state = state0 if state0 is not None else mspg.init_state(cfg, const)
    step = jax.jit(mspg.make_step(cfg))
    for _ in range(steps):
        state, d = step(state, const, jnp.asarray(1e18, state.t.dtype))
    return cfg, const, state


@pytest.fixture(scope="module")
def workflow():
    out = {}
    # ---- stage 1: PG spin-up toward a quasi-steady thermocline ----------
    pg_cfg, pg_const, pg_state = run_pg_spinup()
    b = np.asarray(pg_state.b)
    ux = np.asarray(pg_state.ux)
    uy = np.asarray(pg_state.uy)
    assert np.isfinite(b).all()
    u_c = 0.5 * (ux[:, :, :-1] + ux[:, :, 1:])
    v_c = 0.5 * (uy[:, :-1, :] + uy[:, 1:, :])
    out["pg"] = (pg_cfg, pg_state)

    # ---- stage 2: modes.py/regrid.py -> msqg inputs --------------------
    inp = coupling.pg_to_qg_inputs(pg_cfg, b, u_c, v_c, il=IL, N_qg=N_QG)
    out["inp"] = inp
    # ---- stage 3: msqg run with the coupling fields + filter -----------
    qg_cfg = QGConfig(N=N_QG, nl=len(IL) - 1, L0=1.0, Rom=inp["Rom"],
                      Ekb=0.002, tau0=1e-5, Re4=50.0, beta=0.5,
                      Fr=(0.003,) * (len(IL) - 2), dh=inp["dh"],
                      DT=2e-2, tend=1e18, dtout=1e18, dtflt=0.1,
                      afilt=10.0, Lfmax=0.5, CFL=0.5,
                      solver="mg", dtype="float64").validate()
    qg_const = qgm.build_constants(qg_cfg, psipg=inp["psipg"],
                                   frpg=inp["frpg"], rdpg=inp["rdpg"])
    qg_state = qgm.init_state(qg_cfg, qg_const, seed=0)
    step = jax.jit(qgm.make_step(qg_cfg))
    from msom_tpu.ops.wavelet import wavelet_filter_step
    for k in range(40):
        qg_state, d = step(qg_state, qg_const,
                           jnp.asarray(1e18, qg_state.t.dtype))
        if k % 5 == 4:
            qg_state = wavelet_filter_step(qg_cfg, qg_const, qg_state)
    assert int(qg_state.nbar) > 0
    # filter-mean flux -> streamfunction (pf written by OutputWriter)
    qof_mean = np.asarray(qg_state.qof) / int(qg_state.nbar)
    pf, _ = qgm.invert_q(qg_cfg, qg_const,
                         jnp.zeros_like(qg_state.qof),
                         jnp.asarray(qof_mean))
    out["qg"] = (qg_cfg, qg_const, qg_state, np.asarray(pf))
    return out


def test_stage2_inputs_sane(workflow):
    inp = workflow["inp"]
    nl_qg = len(IL) - 1
    assert inp["psipg"].shape == (nl_qg, N_QG, N_QG)
    assert inp["frpg"].shape == (nl_qg, N_QG, N_QG)
    assert inp["rdpg"].shape == (N_QG, N_QG)
    assert np.isfinite(inp["psipg"]).all() and np.isfinite(inp["frpg"]).all()
    # Fr > 0 on the nl-1 interfaces, deformation radius positive and of
    # eddy scale (tens of km / l_qg)
    assert (inp["frpg"][:-1] > 0).all()
    assert (inp["rdpg"] > 0).all()
    assert 0.05 < np.median(inp["rdpg"]) < 50.0
    assert abs(sum(inp["dh"]) - 1.0) < 1e-12
    # the regridded large-scale psi actually drives the QG layers
    assert np.abs(inp["psipg"]).max() > 0


def test_stage3_filter_flux_nontrivial(workflow):
    _, _, qg_state, pf = workflow["qg"]
    assert np.isfinite(pf).all()
    assert np.abs(pf).max() > 0


def test_stage4_feedback_closes_the_loop(workflow):
    qg_cfg, qg_const, qg_state, pf = workflow["qg"]
    inp = workflow["inp"]
    pg_cfg, pg_state = workflow["pg"]

    Fr_prof = np.array([np.median(inp["frpg"][k])
                        for k in range(len(IL) - 2)])
    bf_pg = coupling.qg_feedback_forcing(pf, np.asarray(inp["dh"]),
                                         Fr_prof, inp["Rom"], NL_PG)
    assert bf_pg.shape == (NL_PG, N_QG, N_QG)
    assert np.isfinite(bf_pg).all() and np.abs(bf_pg).max() > 0

    # regrid the forcing back to the PG grid (QG ran finer)
    bf_pg_coarse = regrid_bicubic(bf_pg, 1.0, N_PG)

    # ---- stage 5: PG continuation with and without b_forc --------------
    # amplify so the response is unambiguous over the short continuation
    amp = 1e-2 / max(np.abs(bf_pg_coarse).max(), 1e-30)
    _, _, st_forced = run_pg_spinup(steps=30, b_forc=amp * bf_pg_coarse,
                                    state0=pg_state)
    _, _, st_plain = run_pg_spinup(steps=30, b_forc=None, state0=pg_state)
    db = np.asarray(st_forced.b) - np.asarray(st_plain.b)
    assert np.isfinite(db).all()
    # the buoyancy budget responds where the forcing acts, at the
    # magnitude the forcing term integrates to (b_forc * elapsed time)
    elapsed = float(st_forced.t) - float(pg_state.t)
    expect = np.abs(amp * bf_pg_coarse).max() * elapsed
    assert np.abs(db).max() > 0.1 * expect
    assert np.abs(db).max() < 50.0 * expect
