"""ctypes bindings for the native logits codec (native/logits_codec.cc).

Builds on demand with `make` (g++) the first time; every consumer falls back
to the pure-numpy path when the toolchain or .so is unavailable, so the
framework stays importable anywhere.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO = os.path.join(_NATIVE_DIR, "liblogits_codec.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, "logits_codec.cc")
    if not os.path.exists(_SO) and os.path.exists(src):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.logits_pack_write.restype = ctypes.c_int
    lib.logits_pack_write.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int]
    lib.logits_read_unpack.restype = ctypes.c_int
    lib.logits_read_unpack.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def pack_write(fd: int, values: np.ndarray, indices: np.ndarray,
               seeds: np.ndarray, sample_idx: np.ndarray,
               n_threads: int = 8) -> None:
    lib = _load()
    assert lib is not None
    values = np.ascontiguousarray(values, np.float32)
    indices = np.ascontiguousarray(indices, np.int32)
    seeds = np.ascontiguousarray(seeds, np.int32)
    sample_idx = np.ascontiguousarray(sample_idx, np.int64)
    B, K = values.shape
    rc = lib.logits_pack_write(fd, _ptr(values, ctypes.c_float),
                               _ptr(indices, ctypes.c_int32),
                               _ptr(seeds, ctypes.c_int32),
                               _ptr(sample_idx, ctypes.c_int64),
                               B, K, n_threads)
    if rc != 0:
        raise IOError("native logits_pack_write failed")


def read_unpack(fd: int, sample_idx: np.ndarray, K: int, n_threads: int = 8
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None
    sample_idx = np.ascontiguousarray(sample_idx, np.int64)
    B = len(sample_idx)
    values = np.empty((B, K), np.float32)
    indices = np.empty((B, K), np.int32)
    seeds = np.empty((B,), np.int32)
    rc = lib.logits_read_unpack(fd, _ptr(sample_idx, ctypes.c_int64), B, K,
                                _ptr(values, ctypes.c_float),
                                _ptr(indices, ctypes.c_int32),
                                _ptr(seeds, ctypes.c_int32), n_threads)
    if rc != 0:
        raise IOError("native logits_read_unpack failed")
    return values, indices, seeds
