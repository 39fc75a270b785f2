"""Compare DST-II implementations on the TPU (VERDICT item 2: replace
jax.scipy.fft.dct with a matmul-DST if it wins).

Candidates, each mapping (nl, N, N) -> (nl, N, N) forward+inverse both axes
(the per-inversion transform load):
  fft    current solvers/spectral.py dst2/idst2 (jfft.dct via FFT)
  mm32   sine-matrix matmul, f32 inputs, precision=HIGHEST (bf16x6 passes)
  mm32d  sine-matrix matmul, f32, precision=float32 (bf16x3)
  mmbf   sine-matrix matmul, bf16 (fast, lossy)
  rfft   DST-II via one length-2N rfft with odd pre-rotation (Makhoul-style)

Prints ms per roundtrip and max rel error vs float64 NumPy.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from tools.ubench import roundtrip, timeit
from msom_tpu.solvers import spectral as sp


def sine_matrix(N, dtype=np.float64):
    # DST-II (orthonormal): S[k, i] = c_k sin(pi (k+1) (i+1/2) / N)
    k = np.arange(N)[:, None]
    i = np.arange(N)[None, :]
    S = np.sin(np.pi * (k + 1) * (i + 0.5) / N)
    c = np.full(N, np.sqrt(2.0 / N))
    c[-1] = np.sqrt(1.0 / N)
    return (c[:, None] * S).astype(dtype)


def np_dst2_pair(x):
    """float64 reference roundtrip (identity up to roundoff)."""
    return x


def make_mm(S, precision):
    ST = S.T

    def pair(x):
        # forward: along -1 then -2; inverse: transpose matrices
        y = jnp.einsum("ki,lyi->lyk", S, x, precision=precision)
        y = jnp.einsum("kj,ljx->lkx", S, y, precision=precision)
        z = jnp.einsum("jk,lkx->ljx", ST, y, precision=precision)
        return jnp.einsum("ik,lyk->lyi", ST, z, precision=precision)
    return pair


def fft_pair(x):
    y = sp.dst2(sp.dst2(x, -1), -2)
    return sp.idst2(sp.idst2(y, -2), -1)


def rfft_dst2(x, axis):
    """DST-II via one length-2N rfft: DCT-II(v)[k] = 2 Re(e^{-i pi k/2N}
    RFFT(concat(x_even_order))..., using the standard 'v = x reordered'
    trick, then the DST flip identity of solvers/spectral.py."""
    N = x.shape[axis]
    s = jnp.asarray(((-1.0) ** np.arange(N)), x.dtype)
    shape = [1] * x.ndim
    shape[axis] = N
    xs = x * s.reshape(shape)
    # DCT-II via 2N rfft of [x, reversed(x)]
    ext = jnp.concatenate([xs, jnp.flip(xs, axis)], axis=axis)
    F = jnp.fft.rfft(ext, axis=axis)
    k = np.arange(N)
    tw = np.exp(-1j * np.pi * k / (2 * N))
    # orthonormal scale
    sc = np.full(N, np.sqrt(1.0 / (2 * N)))
    sc[0] = np.sqrt(1.0 / (4 * N))
    w = (tw * 2 * sc).astype(np.complex64 if x.dtype == jnp.float32
                             else np.complex128)
    wshape = [1] * x.ndim
    wshape[axis] = N
    Fk = jax.lax.slice_in_dim(F, 0, N, axis=axis)
    c = (Fk * jnp.asarray(w).reshape(wshape)).real.astype(x.dtype)
    return jnp.flip(c, axis)


def irfft_dst2(X, axis):
    """Inverse via the adjoint property: for orthonormal DST-II the inverse is
    the transpose = DST-III; implement as matmul-free using idct path of
    spectral (fallback)."""
    return sp.idst2(X, axis)


def rfft_pair(x):
    y = rfft_dst2(rfft_dst2(x, -1), -2)
    return irfft_dst2(irfft_dst2(y, -2), -1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=1024)
    p.add_argument("--nl", type=int, default=4)
    p.add_argument("--n", type=int, default=20)
    args = p.parse_args()
    N, nl = args.N, args.nl

    rng = np.random.default_rng(0)
    x64 = rng.standard_normal((nl, N, N))
    x = jnp.asarray(x64, jnp.float32)
    rt = roundtrip()

    S32 = jnp.asarray(sine_matrix(N, np.float32))
    Sbf = jnp.asarray(sine_matrix(N, np.float32)).astype(jnp.bfloat16)

    cands = {
        "fft": fft_pair,
        "mm32": make_mm(S32, jax.lax.Precision.HIGHEST),
        "mm32d": make_mm(S32, jax.lax.Precision.DEFAULT),
        "rfft": rfft_pair,
    }

    def bf_pair(xx):
        y = make_mm(Sbf, jax.lax.Precision.DEFAULT)(xx.astype(jnp.bfloat16))
        return y.astype(xx.dtype)
    cands["mmbf"] = bf_pair

    for name, fn in cands.items():
        try:
            out = np.asarray(jax.jit(fn)(x), np.float64)
            err = np.max(np.abs(out - x64)) / np.max(np.abs(x64))
            ms = timeit(fn, x, n=args.n, rt=rt)
            print(f"{name:6s} {ms:8.3f} ms  maxrel={err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:6s} FAILED: {type(e).__name__}: {e}", flush=True)


def extra():
    N, nl = 2048, 4
    rng = np.random.default_rng(0)
    x64 = rng.standard_normal((nl, N, N))
    x = jnp.asarray(x64, jnp.float32)
    rt = roundtrip()
    S32 = jnp.asarray(sine_matrix(N, np.float32))
    for name, prec in [("mmHIGH", jax.lax.Precision.HIGH)]:
        fn = make_mm(S32, prec)
        out = np.asarray(jax.jit(fn)(x), np.float64)
        err = np.max(np.abs(out - x64)) / np.max(np.abs(x64))
        ms = timeit(fn, x, n=10, rt=rt)
        print(f"{name:6s} {ms:8.3f} ms  maxrel={err:.2e}", flush=True)
    # full spectral-style inversion via matmul transforms, HIGH precision
    from msom_tpu.ops.modes import eigmod
    vm = eigmod(np.full(nl, 1.0 / nl), np.full(nl - 1, (0.003 / 0.025) ** 2))
    l2m = jnp.asarray(np.asarray(vm.l2m), jnp.float32)
    m2l = jnp.asarray(np.asarray(vm.m2l), jnp.float32)
    h = 80.0 / N
    k = np.arange(1, N + 1, dtype=np.float64)
    lam = -(4.0 / h ** 2) * np.sin(np.pi * k / (2 * N)) ** 2
    den = lam[None, :, None] + lam[None, None, :] + np.asarray(vm.iBu)[:, None, None]
    inv = jnp.asarray(np.where(den != 0, 1.0 / np.where(den != 0, den, 1.0), 0.0), jnp.float32)
    prec = jax.lax.Precision.HIGH

    def inv_mm(q):
        qm = jnp.einsum("ml,lyx->myx", l2m, q, precision=prec)
        Q = jnp.einsum("ki,myi->myk", S32, qm, precision=prec)
        Q = jnp.einsum("kj,mjx->mkx", S32, Q, precision=prec)
        P = Q * inv
        pm = jnp.einsum("jk,mkx->mjx", S32.T, P, precision=prec)
        pm = jnp.einsum("ik,myk->myi", S32.T, pm, precision=prec)
        return jnp.einsum("lm,myx->lyx", m2l, pm, precision=prec)

    ms = timeit(inv_mm, x, n=10, rt=rt)
    print(f"inv_mm {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "extra":
        extra()
    else:
        main()
