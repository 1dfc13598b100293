"""ctypes loader/builder for the native C++ helpers (csrc/).

The reference relies on external CUDA/CPython packages (constriction ANS,
TorchPQ, fpnge); here the native pieces are built on demand with g++ into a
shared library cached next to the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc")
_LOCK = threading.Lock()
_LIB = None


def _build(lib_path: str):
    srcs = [os.path.join(_CSRC, "rans.cpp"), os.path.join(_CSRC, "plas.cpp")]
    srcs = [s for s in srcs if os.path.exists(s)]
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", lib_path] + srcs + ["-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        # Key the build artifact on a content hash of the sources: after a
        # fresh clone mtimes are checkout time (unreliable), and the .so is
        # never committed (it is machine-specific, built with -march=native).
        import hashlib

        h = hashlib.sha256()
        for f in sorted(os.listdir(_CSRC)):
            if f.endswith(".cpp"):
                with open(os.path.join(_CSRC, f), "rb") as fh:
                    h.update(fh.read())
        lib_path = os.path.join(
            _CSRC, f"libgsc_native.{h.hexdigest()[:16]}.so"
        )
        if not os.path.exists(lib_path):
            _build(lib_path)
        lib = ctypes.CDLL(lib_path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.rans_quantize_freqs.argtypes = [u64p, ctypes.c_int, u32p]
        lib.rans_encode_u8.restype = ctypes.c_int64
        lib.rans_encode_u8.argtypes = [
            u8p, ctypes.c_int64, u32p, ctypes.c_int, u8p, ctypes.c_int64,
        ]
        lib.rans_decode_u8.restype = ctypes.c_int
        lib.rans_decode_u8.argtypes = [
            u8p, ctypes.c_int64, u32p, ctypes.c_int, u8p, ctypes.c_int64,
        ]
        lib.rans_encode_u8_ctx.restype = ctypes.c_int64
        lib.rans_encode_u8_ctx.argtypes = [
            u8p, u16p, ctypes.c_int64, u32p, ctypes.c_int, ctypes.c_int, u8p,
            ctypes.c_int64,
        ]
        lib.rans_decode_u8_ctx.restype = ctypes.c_int
        lib.rans_decode_u8_ctx.argtypes = [
            u8p, ctypes.c_int64, u16p, u32p, ctypes.c_int, ctypes.c_int, u8p,
            ctypes.c_int64,
        ]
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.plas_sort.restype = ctypes.c_int
        lib.plas_sort.argtypes = [
            f32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_uint64, ctypes.c_int,
        ]
        lib.plas_grid_cost.restype = ctypes.c_double
        lib.plas_grid_cost.argtypes = [f32p, i32p, ctypes.c_int, ctypes.c_int]
        _LIB = lib
        return lib


def _as_ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def quantize_freqs(counts: np.ndarray) -> np.ndarray:
    """Raw histogram counts -> 14-bit quantized frequency table."""
    lib = get_lib()
    counts = np.ascontiguousarray(counts, np.uint64)
    out = np.zeros(len(counts), np.uint32)
    lib.rans_quantize_freqs(
        _as_ptr(counts, ctypes.c_uint64), len(counts),
        _as_ptr(out, ctypes.c_uint32),
    )
    return out


def rans_encode(symbols: np.ndarray, freqs: np.ndarray) -> bytes:
    lib = get_lib()
    symbols = np.ascontiguousarray(symbols, np.uint8)
    freqs = np.ascontiguousarray(freqs, np.uint32)
    # worst case ~30 bits/symbol when a symbol lands in a 2^-30 context
    # tail (e.g. an untrained conditional model); size accordingly
    cap = symbols.size * 5 + 64
    out = np.zeros(cap, np.uint8)
    n = lib.rans_encode_u8(
        _as_ptr(symbols, ctypes.c_uint8), symbols.size,
        _as_ptr(freqs, ctypes.c_uint32), len(freqs),
        _as_ptr(out, ctypes.c_uint8), cap,
    )
    if n < 0:
        raise RuntimeError(f"rans_encode failed: {n}")
    return out[:n].tobytes()


def rans_decode(buf: bytes, freqs: np.ndarray, n: int) -> np.ndarray:
    lib = get_lib()
    arr = np.frombuffer(buf, np.uint8)
    freqs = np.ascontiguousarray(freqs, np.uint32)
    out = np.zeros(n, np.uint8)
    rc = lib.rans_decode_u8(
        _as_ptr(arr, ctypes.c_uint8), arr.size,
        _as_ptr(freqs, ctypes.c_uint32), len(freqs),
        _as_ptr(out, ctypes.c_uint8), n,
    )
    if rc != 0:
        raise RuntimeError(f"rans_decode failed: {rc}")
    return out


def plas_sort(
    data: np.ndarray, grid: int, sweeps_per_level: int = 2,
    radius_decay: float = 0.7, seed: int = 0, n_threads: int = 0,
) -> np.ndarray:
    """Self-organizing 2D grid sort: data [grid*grid, d] -> perm [grid*grid]
    with perm[pos] = source row (csrc/plas.cpp)."""
    lib = get_lib()
    data = np.ascontiguousarray(data, np.float32)
    n, d = data.shape
    assert n == grid * grid, (n, grid)
    perm = np.zeros(n, np.int32)
    rc = lib.plas_sort(
        _as_ptr(data, ctypes.c_float), _as_ptr(perm, ctypes.c_int32),
        grid, d, sweeps_per_level, radius_decay, seed, n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"plas_sort failed: {rc}")
    return perm


def plas_grid_cost(data: np.ndarray, perm: np.ndarray, grid: int) -> float:
    lib = get_lib()
    data = np.ascontiguousarray(data, np.float32)
    perm = np.ascontiguousarray(perm, np.int32)
    return lib.plas_grid_cost(
        _as_ptr(data, ctypes.c_float), _as_ptr(perm, ctypes.c_int32),
        grid, data.shape[1],
    )


def rans_encode_ctx(symbols, ctx, freqs_2d) -> bytes:
    lib = get_lib()
    symbols = np.ascontiguousarray(symbols, np.uint8)
    ctx = np.ascontiguousarray(ctx, np.uint16)
    freqs_2d = np.ascontiguousarray(freqs_2d, np.uint32)
    nctx, nsym = freqs_2d.shape
    # worst case ~30 bits/symbol when a symbol lands in a 2^-30 context
    # tail (e.g. an untrained conditional model); size accordingly
    cap = symbols.size * 5 + 64
    out = np.zeros(cap, np.uint8)
    n = lib.rans_encode_u8_ctx(
        _as_ptr(symbols, ctypes.c_uint8), _as_ptr(ctx, ctypes.c_uint16),
        symbols.size, _as_ptr(freqs_2d, ctypes.c_uint32), nctx, nsym,
        _as_ptr(out, ctypes.c_uint8), cap,
    )
    if n < 0:
        raise RuntimeError(f"rans_encode_ctx failed: {n}")
    return out[:n].tobytes()


def rans_decode_ctx(buf, ctx, freqs_2d, n) -> np.ndarray:
    lib = get_lib()
    arr = np.frombuffer(buf, np.uint8)
    ctx = np.ascontiguousarray(ctx, np.uint16)
    freqs_2d = np.ascontiguousarray(freqs_2d, np.uint32)
    nctx, nsym = freqs_2d.shape
    out = np.zeros(n, np.uint8)
    rc = lib.rans_decode_u8_ctx(
        _as_ptr(arr, ctypes.c_uint8), arr.size, _as_ptr(ctx, ctypes.c_uint16),
        _as_ptr(freqs_2d, ctypes.c_uint32), nctx, nsym,
        _as_ptr(out, ctypes.c_uint8), n,
    )
    if rc != 0:
        raise RuntimeError(f"rans_decode_ctx failed: {rc}")
    return out
