"""ctypes bindings for the native runtime helpers (native/fastio.cpp).

Compiled lazily with g++ on first use and cached next to the source; every
caller has a numpy fallback, so the framework works with or without a
toolchain — but the native path is the production one (the reference's
runtime is C++ everywhere; ours is C++ exactly where host-side work is
hot: parsing, checkpoints, CRT lifting)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "fastio.cpp")
_SO = os.path.join(_REPO, "native", "fastio.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (os.path.exists(_SRC) and
                                   os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.fast_read_floats.restype = ctypes.c_long
    lib.fast_read_floats.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_double),
                                     ctypes.c_long]
    lib.crt_lift_center.restype = None
    lib.crt_lift_center.argtypes = [ctypes.POINTER(ctypes.c_uint32),
                                    ctypes.c_long, ctypes.c_long,
                                    ctypes.POINTER(ctypes.c_uint64),
                                    ctypes.POINTER(ctypes.c_uint64),
                                    ctypes.c_uint64, ctypes.c_uint64,
                                    ctypes.POINTER(ctypes.c_double)]
    lib.write_blob_u32.restype = ctypes.c_int
    lib.write_blob_u32.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_uint32),
                                   ctypes.c_long]
    lib.read_blob_u32.restype = ctypes.c_long
    lib.read_blob_u32.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_uint32),
                                  ctypes.c_long]
    _lib = lib
    return lib


def read_floats(path: str) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        from .weights import read_values
        return read_values(path)
    n = lib.fast_read_floats(path.encode(), None, 0)
    if n < 0:
        raise FileNotFoundError(path)
    out = np.empty(n, np.float64)
    lib.fast_read_floats(path.encode(),
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n)
    return out


def crt_lift_center(residues: np.ndarray, primes) -> np.ndarray:
    """Centered CRT reconstruction -> float64, over <=4 limbs (native) or
    exact Python ints (fallback).  residues: (L, n) u32."""
    residues = np.ascontiguousarray(residues, np.uint32)
    L, n = residues.shape
    Q = 1
    for q in primes:
        Q *= int(q)
    lib = get_lib()
    if lib is None or Q >= 1 << 120:
        acc = np.zeros(n, dtype=object)
        for i, q in enumerate(primes):
            qi = int(q)
            Qi = Q // qi
            w = Qi * pow(Qi % qi, qi - 2, qi)
            acc = (acc + residues[i].astype(object) * w) % Q
        acc = np.where(acc > Q // 2, acc - Q, acc)
        return acc.astype(np.float64)
    whi = np.empty(L, np.uint64)
    wlo = np.empty(L, np.uint64)
    for i, q in enumerate(primes):
        qi = int(q)
        Qi = Q // qi
        w = (Qi * pow(Qi % qi, qi - 2, qi)) % Q
        whi[i] = w >> 64
        wlo[i] = w & ((1 << 64) - 1)
    out = np.empty(n, np.float64)
    lib.crt_lift_center(
        residues.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), L, n,
        whi.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        wlo.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        Q >> 64, Q & ((1 << 64) - 1),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def write_blob(path: str, arr: np.ndarray) -> bool:
    lib = get_lib()
    arr = np.ascontiguousarray(arr, np.uint32).reshape(-1)
    if lib is None:
        return False
    rc = lib.write_blob_u32(path.encode(),
                            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                            arr.size)
    return rc == 0


def read_blob(path: str) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    n = lib.read_blob_u32(path.encode(), None, 0)
    if n < 0:
        raise IOError(f"read_blob_u32({path}) -> {n}")
    out = np.empty(n, np.uint32)
    rc = lib.read_blob_u32(path.encode(),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                           n)
    if rc == -3:
        raise IOError(f"crc mismatch in {path}")
    if rc < 0:
        raise IOError(f"read_blob_u32({path}) -> {rc}")
    return out
