"""ctypes bindings for the native batched MT19937 table generator.

Builds ``libmt_tables.so`` on first use with g++ (cached next to this file)
and exposes a ``NativeBatchRNG`` owning one NumPy-legacy-compatible MT19937
stream per environment.  Falls back cleanly when no compiler is available —
callers must check ``available()``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "mt_tables.cpp")
_LIB = os.path.join(_DIR, "libmt_tables.so")
_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _LIB]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return str(e)
    if res.returncode != 0:
        return res.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_LIB) or (os.path.getmtime(_SRC)
                                        > os.path.getmtime(_LIB)):
            _build_error = _build()
            if _build_error is not None:
                return None
        lib = ctypes.CDLL(_LIB)
        lib.batch_create.restype = ctypes.c_void_p
        lib.batch_create.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_size_t]
        lib.batch_destroy.argtypes = [ctypes.c_void_p]
        lib.batch_randint.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                      ctypes.c_long, ctypes.c_void_p,
                                      ctypes.c_size_t]
        lib.batch_normal.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                     ctypes.c_double, ctypes.c_void_p,
                                     ctypes.c_size_t]
        lib.batch_poisson.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                      ctypes.c_void_p, ctypes.c_size_t]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


class NativeBatchRNG:
    """B independent NumPy-legacy MT19937 streams with batched, multithreaded
    table fills.  Stream i seeded like ``np.random.RandomState(seeds[i])``."""

    def __init__(self, seeds: Sequence[Optional[int]]):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native RNG unavailable: {_build_error}")
        self._lib = lib
        self.B = len(seeds)
        s = np.zeros(self.B, np.uint64)
        has = np.zeros(self.B, np.uint8)
        for i, seed in enumerate(seeds):
            if seed is not None:
                s[i] = np.uint64(seed)
                has[i] = 1
        self._h = lib.batch_create(s.ctypes.data, has.ctypes.data, self.B)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.batch_destroy(self._h)
                self._h = None
        except Exception:
            pass

    def randint(self, low: int, high_excl: int, n: int) -> np.ndarray:
        """[B, n] int64, each row one env's randint(low, high_excl) draws."""
        out = np.empty((self.B, n), np.int64)
        self._lib.batch_randint(self._h, low, high_excl, out.ctypes.data, n)
        return out

    def normal(self, loc: float, scale: float, n: int) -> np.ndarray:
        out = np.empty((self.B, n), np.float64)
        self._lib.batch_normal(self._h, loc, scale, out.ctypes.data, n)
        return out

    def poisson(self, lam: float, n: int) -> np.ndarray:
        out = np.empty((self.B, n), np.int64)
        self._lib.batch_poisson(self._h, lam, out.ctypes.data, n)
        return out
