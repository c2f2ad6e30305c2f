"""Compile-on-first-use loader for the native library (ctypes, no pybind11).

Builds segclip_native.so from the .cc sources with g++ -O3 the first time
it's needed, caching next to the sources; rebuilds when sources are newer.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["felzenszwalb.cc", "records.cc"]
_LIB = os.path.join(_DIR, "segclip_native.so")


def _needs_build() -> bool:
    if not os.path.exists(_LIB):
        return True
    lib_mtime = os.path.getmtime(_LIB)
    return any(os.path.getmtime(os.path.join(_DIR, s)) > lib_mtime
               for s in _SOURCES if os.path.exists(os.path.join(_DIR, s)))


def build() -> str:
    sources = [os.path.join(_DIR, s) for s in _SOURCES
               if os.path.exists(os.path.join(_DIR, s))]
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB] + sources
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB


@lru_cache()
def load() -> ctypes.CDLL:
    if _needs_build():
        build()
    lib = ctypes.CDLL(_LIB)
    lib.felzenszwalb_segment.restype = ctypes.c_int
    lib.felzenszwalb_segment.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32)]
    lib.sgr_open.restype = ctypes.c_void_p
    lib.sgr_open.argtypes = [ctypes.c_char_p]
    lib.sgr_count.restype = ctypes.c_uint64
    lib.sgr_count.argtypes = [ctypes.c_void_p]
    lib.sgr_record.restype = ctypes.c_int
    lib.sgr_record.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_uint64)]
    lib.sgr_close.restype = None
    lib.sgr_close.argtypes = [ctypes.c_void_p]
    return lib
