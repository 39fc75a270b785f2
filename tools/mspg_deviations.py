"""Quantify the two documented mspg deviations from the reference
(PARITY.md §2.2 note; VERDICT r2 weak #6).

1. CORIOLIS FORM in the v-momentum equation. The reference writes the
   momentum kernel once inside `foreach_face()` (/root/reference/mspg/
   pg.h:632-645): `du.x[] = ... - f.x*y*0.25*(u.y[]+...)`. qcc executes the
   block for the y-face pass with x<->y coordinate rotation, so the literal
   compiled v-equation uses the face's *x*-coordinate as the Coriolis
   parameter (and x in [0, L0] — it does not even carry the ys origin
   shift), while the u-equation uses y. The repo implements f = y (the
   physical latitude) in BOTH components — consistent with the reference's
   own cell-centered elliptic coefficients ronh/fonh (pg.h:846-852), which
   use y. This script integrates the canonical-parameter PG config under
   both forms and prints the field-level divergence.

2. RUNNING-MEAN CONTENT. The reference's comp_output accumulates
   `um.x[] = (um.x[]*nme + u_gm.x[])/(nme+1)` (/root/reference/mspg/
   pg.c:193-195) — i.e. the running mean holds ONLY the GM eddy-induced
   velocity. With the canonical params.in (no k_gm key; default k_gm = 0,
   pg.h:48) u_gml is identically zero, so the reference's u_mel output is
   a field of zeros. The repo averages the resolved u instead
   (models/mspg.accumulate_means). This script prints the magnitude of
   what each convention stores.

Run: python tools/mspg_deviations.py  (CPU, ~1 min)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from msom_tpu.models import mspg
from msom_tpu.params import PGConfig


_orig_momentum = mspg.momentum


def momentum_literal_rotation(cfg, const, b, ux, uy):
    """The momentum tendency with the LITERAL qcc face-rotation semantics:
    v-equation Coriolis parameter = face x-coordinate (no ys shift)."""
    dux, duy = _orig_momentum(cfg, const, b, ux, uy)
    N = cfg.N
    delta = cfg.L0 / N
    # repo duy = -dpdy - yf*ubar - r uy + nu lap  ->  swap yf for xc
    uxg = jnp.concatenate([ux[:, :1, :], ux, ux[:, -1:, :]], axis=-2)
    ubar = 0.25 * (uxg[:, :-1, :-1] + uxg[:, :-1, 1:]
                   + uxg[:, 1:, :-1] + uxg[:, 1:, 1:])
    yf = jnp.asarray(cfg.ys + np.arange(N + 1) * delta, ux.dtype)[:, None]
    xc = jnp.asarray((np.arange(N) + 0.5) * delta, ux.dtype)[None, :]
    duy = duy + yf * ubar - xc * ubar
    return dux, duy


def run(cfg, const, literal, steps):
    state = mspg.init_state(cfg, const)
    saved = mspg.momentum
    if literal:
        mspg.momentum = momentum_literal_rotation
    try:
        step = jax.jit(mspg.make_step(cfg))
        for _ in range(steps):
            state, _ = step(state, const, jnp.asarray(1e9))
    finally:
        mspg.momentum = saved
    return state


def main():
    # canonical parameters (/root/reference/mspg/params.in) at N=32, nl=10
    # (the N=64 x 30-layer grid only scales the numbers, not the verdict)
    cfg = PGConfig(N=32, nl=10, ys=0.3, r=0.02, tau_s=3e-2, tau0=0.12,
                   kv=3e-4, kh=3e-4, nu=3e-4, omega=0.2, DT=1e-2,
                   CFL=0.4, dtype="float64")
    const = mspg.build_constants(cfg)
    steps = 500

    s_phys = run(cfg, const, literal=False, steps=steps)
    s_lit = run(cfg, const, literal=True, steps=steps)

    t = float(s_phys.t)
    db = np.abs(np.asarray(s_phys.b) - np.asarray(s_lit.b))
    bscale = np.abs(np.asarray(s_phys.b)).max()
    du = np.abs(np.asarray(s_phys.uy) - np.asarray(s_lit.uy))
    uscale = np.abs(np.asarray(s_phys.uy)).max()
    print(f"[coriolis] t = {t:.3f} ({steps} steps, N={cfg.N}, nl={cfg.nl})")
    print(f"[coriolis] max|b_phys - b_literal| = {db.max():.3e} "
          f"({db.max() / bscale:.1%} of max|b| = {bscale:.3e})")
    print(f"[coriolis] max|v_phys - v_literal| = {du.max():.3e} "
          f"({du.max() / uscale:.1%} of max|v| = {uscale:.3e})")

    # running-mean content (deviation 2)
    u_resolved = np.abs(np.asarray(s_phys.ux)).max()
    print(f"[u_mean] canonical k_gm = 0: reference u_mel stores the running "
          f"mean of u_gm = 0 exactly (a zero field);")
    print(f"[u_mean] repo u_me stores the resolved u, max|u| = "
          f"{u_resolved:.3e} — the two outputs differ by the full resolved "
          f"velocity field.")


if __name__ == "__main__":
    main()
