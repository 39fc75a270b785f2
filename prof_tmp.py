import time
import jax, jax.numpy as jnp
from tools.ubench import timeit, roundtrip
from bench import build

N, nl = 2048, 4
cfg, const, state, chunk = build(N, nl, "float32", 1e-3)
from msom_tpu.models import qg as m

rt = roundtrip()
print("roundtrip ms", rt*1e3)

# full step
step = m.make_step(cfg)
def fstep(s):
    s2, d = step(s, const, jnp.asarray(1e18, s.t.dtype))
    return s2
t_full = timeit(fstep, state, n=20, rt=rt)
print("full step ms", t_full)

# inversion only
q = state.q
psi = state.psi
def finv(c):
    p, q_ = c
    p2, it = m.invert_q(cfg, const, p, q_)
    return (p2, q_)
t_inv = timeit(finv, (psi, q), n=20, rt=rt)
print("invert_q ms", t_inv)

# RHS only (via update path minus inversion): use models.pallas_rhs
from msom_tpu.models import pallas_rhs as pr
if pr.applicable(cfg, const):
    kd = const.rhsk
    def frhs(p):
        dq = pr.rhs_fused(cfg, const, p)
        return p + 0.0*dq
    t_rhs = timeit(frhs, psi, n=20, rt=rt)
    print("rhs_fused ms", t_rhs)
