"""Native (C++) components, loaded via ctypes (ref: the reference's C++
core — index construction blockwise_sa.h/libsais, parsing pat.cpp).

The shared library is compiled on demand with g++ -O3 and cached next to
the sources; environments without a toolchain fall back to the pure
numpy/python implementations transparently.
"""
from __future__ import annotations

import ctypes
import subprocess
import sys
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB = None
_TRIED = False


def _build() -> Path | None:
    so = _HERE / "libbt2tpu.so"
    srcs = sorted(_HERE.glob("*.cpp"))
    if not srcs:
        return None
    if so.exists() and all(so.stat().st_mtime > s.stat().st_mtime
                           for s in srcs):
        return so
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", "-o", str(so)] + [str(s) for s in srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception as e:  # no toolchain / failed build -> python fallback
        print(f"bt2tpu: native build unavailable ({e}); using python "
              f"fallbacks", file=sys.stderr)
        return None
    return so


def get_lib():
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        so = _build()
        if so is not None:
            lib = ctypes.CDLL(str(so))
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.bt2tpu_sais.restype = ctypes.c_int
            lib.bt2tpu_sais.argtypes = [
                u8p, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
            lib.bt2tpu_sais64.restype = ctypes.c_int
            lib.bt2tpu_sais64.argtypes = [
                u8p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
            lib.bt2tpu_sa_from_bwt.restype = ctypes.c_int
            lib.bt2tpu_sa_from_bwt.argtypes = [
                u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int64)]
            _LIB = lib
    return _LIB


def sais(text: np.ndarray, force64: bool = False) -> np.ndarray | None:
    """Suffix array via native SA-IS; 64-bit positions for texts beyond
    int32 (the .bt2l-scale path, ref: btypes.h BOWTIE_64BIT_INDEX). None if
    the native lib is unavailable."""
    lib = get_lib()
    n = len(text)
    if lib is None:
        return None
    text = np.ascontiguousarray(text, dtype=np.uint8)
    if n >= (1 << 31) or force64:
        sa = np.empty(n, dtype=np.int64)
        rc = lib.bt2tpu_sais64(
            text.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            np.int64(n), sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return sa if rc == 0 else None
    sa = np.empty(n, dtype=np.int32)
    rc = lib.bt2tpu_sais(
        text.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.int32(n), sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        return None
    return sa.astype(np.int64)


def sa_from_bwt(bwt: np.ndarray, primary: int,
                dollar_large: bool = False) -> np.ndarray | None:
    """Full suffix array ((n+1)-row space, int64) reconstructed from a BWT
    by one LF-walk — the .bt2 interop path that skips suffix sorting
    entirely (ref: bt2_idx.h:1607 walkLeft, done eagerly for the whole
    array). dollar_large selects the reference's suffix-order convention
    ($ sorts after every character). Returns None if the native lib is
    unavailable or the BWT is inconsistent."""
    lib = get_lib()
    if lib is None:
        return None
    bwt = np.ascontiguousarray(bwt, dtype=np.uint8)
    sa = np.empty(len(bwt), dtype=np.int64)
    rc = lib.bt2tpu_sa_from_bwt(
        bwt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.int64(len(bwt)), np.int64(primary), np.int32(dollar_large),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return sa if rc == 0 else None
