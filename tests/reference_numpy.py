"""Independent NumPy loop-level reference implementations of the core
operators, written directly from the discrete formulas in the reference
(cited per function). Used as the correctness oracle for the vectorized JAX
ops. Deliberately slow and index-explicit."""

import numpy as np


def pad_ref(a, bc):
    """Ghost pad, sequential x-then-y application (Basilisk boundary())."""
    ny, nx = a.shape[-2:]
    out = np.zeros(a.shape[:-2] + (ny + 2, nx + 2), a.dtype)
    out[..., 1:-1, 1:-1] = a
    if bc == "periodic":
        out[..., 1:-1, 0] = a[..., :, -1]
        out[..., 1:-1, -1] = a[..., :, 0]
        out[..., 0, :] = out[..., -2, :]
        out[..., -1, :] = out[..., 1, :]
    elif bc == "dirichlet":
        out[..., 1:-1, 0] = -a[..., :, 0]
        out[..., 1:-1, -1] = -a[..., :, -1]
        out[..., 0, :] = -out[..., 1, :]
        out[..., -1, :] = -out[..., -2, :]
    elif bc == "neumann":
        out[..., 1:-1, 0] = a[..., :, 0]
        out[..., 1:-1, -1] = a[..., :, -1]
        out[..., 0, :] = out[..., 1, :]
        out[..., -1, :] = out[..., -2, :]
    else:
        raise ValueError(bc)
    return out


def laplacian_ref(ap, delta):
    """msqg/qg.h:169 — per-cell loop."""
    ny, nx = ap.shape[-2] - 2, ap.shape[-1] - 2
    out = np.zeros(ap.shape[:-2] + (ny, nx))
    for j in range(ny):
        for i in range(nx):
            J, I = j + 1, i + 1
            out[..., j, i] = (ap[..., J, I + 1] + ap[..., J, I - 1]
                             + ap[..., J + 1, I] + ap[..., J - 1, I]
                             - 4 * ap[..., J, I]) / delta**2
    return out


def arakawa_ref(pp, qp, delta):
    """msqg/qg.h:252-262 — the 12-point macro, index-for-index.
    Basilisk f[a,b]: a = x-offset, b = y-offset -> array[..., J+b, I+a]."""
    ny, nx = pp.shape[-2] - 2, pp.shape[-1] - 2
    out = np.zeros(pp.shape[:-2] + (ny, nx))
    for j in range(ny):
        for i in range(nx):
            J, I = j + 1, i + 1

            def p(a, b):
                return pp[..., J + b, I + a]

            def q(a, b):
                return qp[..., J + b, I + a]

            out[..., j, i] = (
                (q(1, 0) - q(-1, 0)) * (p(0, 1) - p(0, -1))
                + (q(0, -1) - q(0, 1)) * (p(1, 0) - p(-1, 0))
                + q(1, 0) * (p(1, 1) - p(1, -1))
                - q(-1, 0) * (p(-1, 1) - p(-1, -1))
                - q(0, 1) * (p(1, 1) - p(-1, 1))
                + q(0, -1) * (p(1, -1) - p(-1, -1))
                + p(0, 1) * (q(1, 1) - q(-1, 1))
                - p(0, -1) * (q(1, -1) - q(-1, -1))
                - p(1, 0) * (q(1, 1) - q(1, -1))
                + p(-1, 0) * (q(-1, 1) - q(-1, -1))) / (12 * delta**2)
    return out


def stretch_ref(a, s, idh0, idh1):
    """msqg/qg.h:202-246 — layer loop."""
    nl = a.shape[0]
    out = np.zeros_like(a)
    if nl == 1:
        return out
    for l in range(nl):
        if l == 0:
            out[l] = s[0] * (a[1] - a[0]) * idh1[0]
        elif l == nl - 1:
            out[l] = s[l - 1] * (a[l - 1] - a[l]) * idh0[l]
        else:
            out[l] = (s[l - 1] * (a[l - 1] - a[l]) * idh0[l]
                      + s[l] * (a[l + 1] - a[l]) * idh1[l])
    return out


def layer_metrics_ref(dh):
    """msqg/qg.h:1017-1027."""
    dh = np.asarray(dh, np.float64)
    nl = len(dh)
    dhc = np.array([0.5 * (dh[l] + dh[l + 1]) for l in range(nl - 1)])
    idh0 = np.zeros(nl)
    idh1 = np.zeros(nl)
    if nl > 1:
        idh1[0] = 1 / (dhc[0] * dh[0])
        for l in range(1, nl - 1):
            idh0[l] = 1 / (dhc[l - 1] * dh[l])
            idh1[l] = 1 / (dhc[l] * dh[l])
        idh0[nl - 1] = 1 / (dhc[nl - 2] * dh[nl - 1])
    return dhc, idh0, idh1


def thomas_ref(t0, t1, t2, rhs):
    """Per-cell scalar Thomas solve (poisson_layer.h:137-146)."""
    nl = t1.shape[0]
    shp = t1.shape[1:]
    out = np.zeros_like(rhs)
    flat = lambda a: a.reshape(nl, -1)
    T0, T1, T2, R = map(lambda a: flat(a).copy(), (t0, t1, t2, rhs))
    for k in range(T1.shape[1]):
        b = T1[:, k].copy()
        d = R[:, k].copy()
        for l in range(1, nl):
            w = T0[l, k] / b[l - 1]
            b[l] -= w * T2[l - 1, k]
            d[l] -= w * d[l - 1]
        x = np.zeros(nl)
        x[nl - 1] = d[nl - 1] / b[nl - 1]
        for l in range(nl - 2, -1, -1):
            x[l] = (d[l] - T2[l, k] * x[l + 1]) / b[l]
        out.reshape(nl, -1)[:, k] = x
    return out.reshape((nl,) + shp)
