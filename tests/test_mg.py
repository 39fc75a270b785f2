"""Multigrid solver tests: manufactured solutions, convergence-rate checks,
tolerance semantics (max-norm residual), and the pseudo-SOR bt variant."""

import numpy as np
import pytest

import jax.numpy as jnp

from msom_tpu.ops.bc import BC, pad
from msom_tpu.ops.stencil import laplacian
from msom_tpu.ops.stretch import stretch, layer_metrics
from msom_tpu.solvers import mg

RNG = np.random.default_rng(42)


def apply_layered_op(a, L0, s=None, idh0=None, idh1=None, lam=None,
                     bc=BC.DIRICHLET):
    """L(a) = lap a + Gamma a + lam a via the (already-tested) ops."""
    delta = L0 / a.shape[-1]
    out = laplacian(pad(a, bc), delta)
    if s is not None:
        out = out + stretch(a, s, idh0, idh1)
    if lam is not None:
        out = out + lam * a
    return out


def test_poisson_mms_dirichlet():
    """Solve lap a = b with b = L(a_true); recover a_true to solver tol."""
    N, L0 = 64, 1.0
    a_true = jnp.asarray(RNG.standard_normal((1, N, N)))
    b = apply_layered_op(a_true, L0)
    a, st = mg.solve_layered(jnp.zeros_like(b), b, L0=L0, tolerance=1e-8)
    assert float(st.resa) < 1e-8
    assert int(st.iters) < mg.NITERMAX
    # residual tolerance 1e-8 on a 64^2 grid -> error well below 1e-8 * O(1/h^2)
    assert float(jnp.max(jnp.abs(a - a_true))) < 1e-6


def test_poisson_analytic_convergence():
    """2nd-order convergence of the discrete solve against the continuum."""
    errs = []
    for N in (32, 64, 128):
        L0 = 1.0
        g = np.pi
        x = (np.arange(N) + 0.5) / N
        X, Y = np.meshgrid(x, x, indexing="xy")
        a_exact = np.sin(g * X) * np.sin(g * Y)
        b = jnp.asarray((-2 * g * g * a_exact)[None])
        a, st = mg.solve_layered(jnp.zeros_like(b), b, L0=L0, tolerance=1e-10)
        errs.append(float(np.max(np.abs(np.asarray(a)[0] - a_exact))))
    orders = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    assert all(o > 1.8 for o in orders), (errs, orders)


def test_layered_stretching_mms():
    nl, N, L0 = 3, 32, 80.0
    dh = [0.06, 0.14, 0.8]
    dhc, idh0, idh1 = layer_metrics(dh)
    s = jnp.asarray(np.abs(RNG.standard_normal((nl - 1, N, N))) * 5.0)
    a_true = jnp.asarray(RNG.standard_normal((nl, N, N)))
    b = apply_layered_op(a_true, L0, s, idh0, idh1)
    a, st = mg.solve_layered(jnp.zeros_like(b), b, L0=L0, s=s,
                             idh0=idh0, idh1=idh1, tolerance=1e-9)
    assert float(st.resa) < 1e-9
    assert float(jnp.max(jnp.abs(a - a_true))) < 1e-5


def test_layered_warm_start_fewer_iters():
    nl, N, L0 = 2, 64, 1.0
    dh = [0.3, 0.7]
    _, idh0, idh1 = layer_metrics(dh)
    s = jnp.ones((nl - 1, N, N)) * 10.0
    a_true = jnp.asarray(RNG.standard_normal((nl, N, N)))
    b = apply_layered_op(a_true, L0, s, idh0, idh1)
    _, st_cold = mg.solve_layered(jnp.zeros_like(b), b, L0=L0, s=s,
                                  idh0=idh0, idh1=idh1, tolerance=1e-7)
    a0 = a_true + 1e-5 * jnp.asarray(RNG.standard_normal(b.shape))
    _, st_warm = mg.solve_layered(a0, b, L0=L0, s=s, idh0=idh0, idh1=idh1,
                                  tolerance=1e-7)
    assert int(st_warm.iters) <= int(st_cold.iters)


def test_helmholtz_lambda():
    """lap a - k a = b (modal inversion form, lambda = iBu < 0)."""
    N, L0 = 64, 1.0
    lam = -jnp.ones((1, N, N)) * 25.0
    a_true = jnp.asarray(RNG.standard_normal((1, N, N)))
    b = apply_layered_op(a_true, L0, lam=lam)
    a, st = mg.solve_layered(jnp.zeros_like(b), b, L0=L0, lam=lam,
                             tolerance=1e-9)
    assert float(st.resa) < 1e-9
    assert float(jnp.max(jnp.abs(a - a_true))) < 1e-6


def test_periodic_poisson_residual():
    N, L0 = 64, 1.0
    b = RNG.standard_normal((1, N, N))
    b -= b.mean()  # solvable: zero-mean RHS
    b = jnp.asarray(b)
    a, st = mg.solve_layered(jnp.zeros_like(b), b, L0=L0, bc=BC.PERIODIC,
                             tolerance=1e-7)
    assert float(st.resa) < 1e-7


def test_prolong_restrict_consistency():
    """Restriction is a left-inverse of prolongation up to the bilinear
    weights; check prolong of a constant is exact and restrict(prolong(c))
    preserves interior cells of a linear field (periodic wrap)."""
    c = jnp.ones((4, 4))
    f = mg.prolong_bilinear(c, BC.NEUMANN)
    np.testing.assert_allclose(np.asarray(f), 1.0, atol=1e-14)
    x = np.arange(8.0)
    X, _ = np.meshgrid(x, x, indexing="xy")
    r = mg.restrict_cell(jnp.asarray(X))
    # 4-avg of x-coordinates: coarse cell I has fine cols 2I, 2I+1
    np.testing.assert_allclose(np.asarray(r)[0], [0.5, 2.5, 4.5, 6.5])


def test_bt_solver_mms():
    """Pseudo-SOR solver with mspg-like coefficients (ronh, fonh)."""
    N, L0 = 64, 1.0
    r = 0.1
    yc = (np.arange(N) + 0.5) / N * L0 + 0.3
    yf = np.arange(N + 1) / N * L0 + 0.3
    # alpha on faces: r/(r^2+y^2) (pg.h:846-852); x-faces at cell-center y
    ax = jnp.asarray(np.broadcast_to(r / (r**2 + yc[:, None]**2), (N, N + 1)).copy())
    ay = jnp.asarray(np.broadcast_to(r / (r**2 + yf[:, None]**2), (N + 1, N)).copy())
    by = jnp.asarray(np.broadcast_to(-(r**2 - yc[:, None]**2)
                                     / (r**2 + yc[:, None]**2)**2, (N, N)).copy())
    bx = jnp.zeros((N, N))
    a_true = jnp.asarray(RNG.standard_normal((N, N)))
    # b = L a_true: residual(a_true) must vanish => b = -_bt_apply(a_true)
    lvl = mg._bt_levels(6, L0, ax, ay, bx, by)[0]
    b = -mg._bt_apply(a_true, lvl, BC.DIRICHLET)
    a, st = mg.solve_bt(jnp.zeros_like(b), b, L0=L0, alpha_x=ax, alpha_y=ay,
                        beta_x=bx, beta_y=by, omega=0.3, tolerance=1e-8)
    assert float(st.resa) < 1e-8
    assert float(jnp.max(jnp.abs(a - a_true))) < 1e-4


def test_jit_compatibility():
    import jax

    N, L0 = 32, 1.0
    b = jnp.asarray(RNG.standard_normal((1, N, N)))

    @jax.jit
    def solve(b):
        a, st = mg.solve_layered(jnp.zeros_like(b), b, L0=L0, tolerance=1e-6)
        return a, st.iters

    a, iters = solve(b)
    assert np.isfinite(np.asarray(a)).all()
    assert int(iters) >= 1
