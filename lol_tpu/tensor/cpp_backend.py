"""ctypes bindings for the native C++ tensor kernels (lol-cpp analog).

Builds lol_tpu/native/tensor.cpp into a shared library on first use
(g++, cached next to the source) and exposes the Tensor hot ops over
numpy arrays.  Bit-identical to the numpy/jnp/Pallas paths — same
networks, same twiddle tables.
"""

from __future__ import annotations

import ctypes
import subprocess
from functools import lru_cache
from pathlib import Path

import numpy as np

from ..ops.ntt import NTTPlan

_SRC = Path(__file__).parent.parent / "native" / "tensor.cpp"
_LIB = _SRC.parent / "liblol_tensor.so"

_u32p = ctypes.POINTER(ctypes.c_uint32)
_f64p = ctypes.POINTER(ctypes.c_double)


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    if (not _LIB.exists()) or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", str(_LIB), str(_SRC)],
            check=True,
        )
    lib = ctypes.CDLL(str(_LIB))
    for name, args in {
        "zq_mul": [_u32p, _u32p, _u32p, ctypes.c_long, ctypes.c_uint32],
        "zq_add": [_u32p, _u32p, _u32p, ctypes.c_long, ctypes.c_uint32],
        "zq_sub": [_u32p, _u32p, _u32p, ctypes.c_long, ctypes.c_uint32],
        "ntt_fwd": [_u32p, ctypes.c_long, ctypes.c_long, ctypes.c_uint32, _u32p],
        "ntt_inv": [_u32p, ctypes.c_long, ctypes.c_long, ctypes.c_uint32,
                    _u32p, ctypes.c_uint32],
        "axis_matvec": [_u32p, _u32p, _u32p, ctypes.c_long, ctypes.c_long,
                        ctypes.c_uint32],
        "l_fwd": [_u32p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
                  ctypes.c_uint32],
        "l_inv": [_u32p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
                  ctypes.c_uint32],
        "mul_g_pow": [_u32p, _u32p, ctypes.c_long, ctypes.c_long,
                      ctypes.c_long, ctypes.c_uint32],
        "gsq_norm_pow2": [_u32p, _f64p, ctypes.c_long, ctypes.c_long,
                          ctypes.c_uint32],
    }.items():
        fn = getattr(lib, name)
        fn.argtypes = args
        fn.restype = None
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_u32p)


def _c(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.uint32)


def zq_mul(a, b, q: int) -> np.ndarray:
    a, b = _c(a), _c(b)
    out = np.empty_like(a)
    _lib().zq_mul(_ptr(a), _ptr(b), _ptr(out), a.size, q)
    return out


def zq_add(a, b, q: int) -> np.ndarray:
    a, b = _c(a), _c(b)
    out = np.empty_like(a)
    _lib().zq_add(_ptr(a), _ptr(b), _ptr(out), a.size, q)
    return out


def ntt_forward(x, plan: NTTPlan) -> np.ndarray:
    """(..., n) forward negacyclic NTT, in the plan's canonical order."""
    x = _c(x).copy()
    flat = x.reshape(-1, plan.n)
    tw = _c(plan.psi_rev)
    _lib().ntt_fwd(_ptr(flat), flat.shape[0], plan.n, plan.q, _ptr(tw))
    return x


def ntt_inverse(x, plan: NTTPlan) -> np.ndarray:
    x = _c(x).copy()
    flat = x.reshape(-1, plan.n)
    tw = _c(plan.ipsi_rev)
    _lib().ntt_inv(_ptr(flat), flat.shape[0], plan.n, plan.q, _ptr(tw),
                   plan.n_inv)
    return x


def axis_matvec(M, x, q: int) -> np.ndarray:
    """out[..., i] = sum_j M[i, j] x[..., j] mod q (dense odd-prime axis)."""
    M = _c(M)
    x = _c(x)
    phi = M.shape[0]
    flat = x.reshape(-1, phi)
    out = np.empty_like(flat)
    _lib().axis_matvec(_ptr(M), _ptr(flat), _ptr(out), flat.shape[0], phi, q)
    return out.reshape(x.shape)


def l_fwd(x, p: int, inner: int, q: int) -> np.ndarray:
    x = _c(x).copy()
    batch = x.size // ((p - 1) * inner)
    _lib().l_fwd(_ptr(x), batch, p, inner, q)
    return x


def l_inv(x, p: int, inner: int, q: int) -> np.ndarray:
    x = _c(x).copy()
    batch = x.size // ((p - 1) * inner)
    _lib().l_inv(_ptr(x), batch, p, inner, q)
    return x


def mul_g_pow(x, p: int, inner: int, q: int) -> np.ndarray:
    x = _c(x)
    out = np.empty_like(x)
    batch = x.size // ((p - 1) * inner)
    _lib().mul_g_pow(_ptr(x), _ptr(out), batch, p, inner, q)
    return out


def gsq_norm_pow2(x, q: int) -> np.ndarray:
    x = _c(x)
    flat = x.reshape(-1, x.shape[-1])
    out = np.empty(flat.shape[0], dtype=np.float64)
    _lib().gsq_norm_pow2(_ptr(flat), out.ctypes.data_as(_f64p),
                         flat.shape[0], flat.shape[1], q)
    return out.reshape(x.shape[:-1] or (1,))
