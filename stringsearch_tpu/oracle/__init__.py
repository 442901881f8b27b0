"""Trusted host C++ oracle: independent SACA + checker + search + BWT.

Plays the role of the reference's C engine (ref: crates/cdivsufsort —
FFI bindings at crates/cdivsufsort/src/lib.rs:1-30, build script at
build.rs:1-29): a second, independently implemented engine the framework
cross-checks against. Bound via ctypes; the shared library is compiled
from csrc/saca.cpp with g++ on first use and cached next to the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from stringsearch_tpu.core.types import BytesLike, SuffixArray, as_text_array

_CSRC = os.path.join(os.path.dirname(__file__), "csrc")
_SO_PATH = os.path.join(_CSRC, "libsaca.so")
_lock = threading.Lock()
_lib = None


def _build_library() -> str:
    src = os.path.join(_CSRC, "saca.cpp")
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-o", _SO_PATH, src]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO_PATH


def load() -> ctypes.CDLL:
    """Load (building if necessary) the oracle shared library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_CSRC, "saca.cpp")
        if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(src):
            _build_library()
        lib = ctypes.CDLL(_SO_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.saca_build.argtypes = [u8p, i32p, ctypes.c_int32]
        lib.saca_build.restype = ctypes.c_int32
        lib.saca_sufcheck.argtypes = [u8p, i32p, ctypes.c_int32]
        lib.saca_sufcheck.restype = ctypes.c_int32
        lib.saca_search.argtypes = [u8p, ctypes.c_int32, u8p, ctypes.c_int32, i32p, ctypes.c_int32, i32p]
        lib.saca_search.restype = ctypes.c_int64
        lib.saca_simplesearch.argtypes = [u8p, ctypes.c_int32, i32p, ctypes.c_int32, ctypes.c_int32, i32p]
        lib.saca_simplesearch.restype = ctypes.c_int64
        lib.saca_bwt.argtypes = [u8p, u8p, ctypes.c_int32]
        lib.saca_bwt.restype = ctypes.c_int32
        lib.saca_unbwt.argtypes = [u8p, u8p, ctypes.c_int32, ctypes.c_int32]
        lib.saca_unbwt.restype = ctypes.c_int32
        lib.saca_version.restype = ctypes.c_char_p
        _lib = lib
        return lib


def _as_host_u8(data: BytesLike) -> np.ndarray:
    if isinstance(data, (bytes, bytearray, memoryview)):
        return np.frombuffer(bytes(data), dtype=np.uint8)
    arr = np.asarray(data)
    if arr.dtype != np.uint8:
        raise TypeError(f"text must be uint8 bytes, got {arr.dtype}")
    return np.ascontiguousarray(arr)


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def build(data: BytesLike) -> np.ndarray:
    """Suffix array of `data` as a host int32 array (SA-IS)."""
    t = _as_host_u8(data)
    n = len(t)
    sa = np.zeros(n, dtype=np.int32)
    if n:
        rc = load().saca_build(_u8p(t), _i32p(sa), n)
        if rc != 0:
            raise RuntimeError(f"oracle saca_build failed: rc={rc}")
    return sa


def sort(data: BytesLike) -> SuffixArray:
    """Engine-shaped API (ref: crates/cdivsufsort/src/lib.rs:26-30)."""
    return SuffixArray(as_text_array(data), build(data))


def sufcheck(data: BytesLike, sa: np.ndarray) -> int:
    """0 if valid; -k for stage-k failure (ref: c-sources/utils.c:160-241)."""
    t = _as_host_u8(data)
    sa = np.ascontiguousarray(np.asarray(sa, dtype=np.int32))
    if len(sa) != len(t):
        return -1
    if len(t) == 0:
        return 0
    return int(load().saca_sufcheck(_u8p(t), _i32p(sa), len(t)))


def search(data: BytesLike, needle: BytesLike, sa: np.ndarray) -> tuple[int, int]:
    """(count, leftmost SA index) (ref: c-sources/utils.c:244-325)."""
    t = _as_host_u8(data)
    p = _as_host_u8(needle)
    sa = np.ascontiguousarray(np.asarray(sa, dtype=np.int32))
    idx = np.zeros(1, dtype=np.int32)
    cnt = load().saca_search(_u8p(t), len(t), _u8p(p), len(p), _i32p(sa), len(sa), _i32p(idx))
    if cnt < 0:
        raise RuntimeError(f"oracle saca_search failed: rc={cnt}")
    return int(cnt), int(idx[0])


def simplesearch(data: BytesLike, c: int, sa: np.ndarray) -> tuple[int, int]:
    """Single-char (count, leftmost SA index)
    (ref: c-sources/utils.c:328-381 `sa_simplesearch`)."""
    t = _as_host_u8(data)
    sa = np.ascontiguousarray(np.asarray(sa, dtype=np.int32))
    idx = np.zeros(1, dtype=np.int32)
    cnt = load().saca_simplesearch(_u8p(t), len(t), _i32p(sa), len(sa), int(c), _i32p(idx))
    if cnt < 0:
        raise RuntimeError(f"oracle saca_simplesearch failed: rc={cnt}")
    return int(cnt), int(idx[0])


def bwt(data: BytesLike) -> tuple[bytes, int]:
    """(bwt bytes, primary index) (ref: divsufsort.c `divbwt`)."""
    t = _as_host_u8(data)
    n = len(t)
    u = np.zeros(n, dtype=np.uint8)
    if n == 0:
        return b"", 0
    pidx = load().saca_bwt(_u8p(t), _u8p(u), n)
    if pidx < 0:
        raise RuntimeError(f"oracle saca_bwt failed: rc={pidx}")
    return bytes(u.tobytes()), int(pidx)


def unbwt(data: BytesLike, pidx: int) -> bytes:
    """Inverse BWT (ref: c-sources/utils.c:111-157)."""
    u = _as_host_u8(data)
    n = len(u)
    t = np.zeros(n, dtype=np.uint8)
    if n == 0:
        return b""
    rc = load().saca_unbwt(_u8p(u), _u8p(t), n, int(pidx))
    if rc != 0:
        raise RuntimeError(f"oracle saca_unbwt failed: rc={rc}")
    return bytes(t.tobytes())


def version() -> str:
    return load().saca_version().decode()
