import time
import numpy as np
import jax, jax.numpy as jnp
import os
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from tools.ubench import timeit, roundtrip
from bench import build

N, nl = 2048, 4
cfg, const, state, chunk = build(N, nl, "float32", 1e-3, "mg")
from msom_tpu.models import qg as m
from msom_tpu.solvers import spectral as sp

rt = roundtrip()
print("roundtrip ms", rt * 1e3, flush=True)

q = state.q
psi = state.psi

# mg inversion
def finv(c, const_):
    p, q_ = c
    p2, it = m.invert_q(cfg, const_, p, q_)
    return (p2 + 1e-30, q_ + 1e-30)
t_inv = timeit(finv, (psi, q), const, n=10, rt=rt)
print("mg invert ms", t_inv, flush=True)

# spectral (fft) inversion
cfg_s, const_s, state_s, _ = build(N, nl, "float32", 1e-3, "spectral")
def fspec(q_, spec):
    return sp.solve_spectral(spec, q_) + q_ * 1e-30
t_spec = timeit(fspec, q, const_s.spec, n=10, rt=rt)
print("spectral fft invert ms", t_spec, flush=True)

# matmul-DST inversion prototype
k = np.arange(1, N + 1)
i = np.arange(N)
S = np.sin(np.pi * np.outer(k, i + 0.5) / N) * np.sqrt(2.0 / N)
S[N - 1] *= np.sqrt(0.5)
S = jnp.asarray(S, jnp.float32)
inv_den = const_s.spec.inv_den
l2m, m2l = const_s.spec.l2m, const_s.spec.m2l

def fmat(q_, S_, inv_, l2m_, m2l_):
    qm = jnp.einsum("ml,lyx->myx", l2m_, q_)
    A = jnp.einsum("Yy,myx->mYx", S_, qm, precision="highest")
    A = jnp.einsum("Xx,myx->myX", S_, A, precision="highest")
    A = A * inv_
    A = jnp.einsum("Yy,mYx->myx", S_, A, precision="highest")
    A = jnp.einsum("Xx,myX->myx", S_, A, precision="highest")
    return jnp.einsum("lm,myx->lyx", m2l_, A)
t_mat = timeit(fmat, q, S, inv_den, l2m, m2l, n=10, rt=rt)
print("spectral matmul invert ms (highest)", t_mat, flush=True)

def fmat2(q_, S_, inv_, l2m_, m2l_):
    qm = jnp.einsum("ml,lyx->myx", l2m_, q_)
    A = jnp.einsum("Yy,myx->mYx", S_, qm)
    A = jnp.einsum("Xx,myx->myX", S_, A)
    A = A * inv_
    A = jnp.einsum("Yy,mYx->myx", S_, A)
    A = jnp.einsum("Xx,myX->myx", S_, A)
    return jnp.einsum("lm,myx->lyx", m2l_, A)
t_mat2 = timeit(fmat2, q, S, inv_den, l2m, m2l, n=10, rt=rt)
print("spectral matmul invert ms (default)", t_mat2, flush=True)

# accuracy of matmul path vs fft path (on device, f32)
pf = jax.jit(fspec)(q, const_s.spec)
pm = jax.jit(fmat)(q, S, inv_den, l2m, m2l)
pm2 = jax.jit(fmat2)(q, S, inv_den, l2m, m2l)
scale = float(jnp.abs(pf).max())
print("matmul-vs-fft rel err: highest",
      float(jnp.abs(pf - pm).max()) / scale,
      "default", float(jnp.abs(pf - pm2).max()) / scale, flush=True)

# fused RHS alone
from msom_tpu.models import pallas_rhs as pr
if pr.applicable(cfg, const):
    def frhs(p, const_):
        return pr.rhs_fused(cfg, const_, p)
    t_rhs = timeit(frhs, psi, const, n=10, rt=rt)
    print("rhs_fused ms", t_rhs, flush=True)
