"""Native (C++) runtime components, compiled on demand.

The hot DP runs on the TPU; these helpers cover the host-side runtime work
the reference implements in C++ (porechop/src/*.cpp):

* traceback.cpp — walks trace bitmaps produced by ops/engine_v2.py with
  SeqAn-identical semantics.  Used as a host fallback (CPU-only deployments)
  and as an independent second opinion in the test suite; the production
  path walks the bits on-device.

Libraries build with g++ on first use and are cached under
~/.cache/porechop_tpu/native keyed by source hash, so the package works from
a plain checkout without a build step.  If no compiler is available the
callers fall back to pure-Python implementations.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.environ.get(
    'PORECHOP_TPU_NATIVE_CACHE',
    os.path.join(os.path.expanduser('~'), '.cache', 'porechop_tpu', 'native'))

_libs = {}


def _build(name: str):
    src = os.path.join(_DIR, name + '.cpp')
    with open(src, 'rb') as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_CACHE, '%s-%s.so' % (name, digest))
    if not os.path.isfile(so_path):
        os.makedirs(_CACHE, exist_ok=True)
        tmp = so_path + '.%d.tmp' % os.getpid()
        cmd = ['g++', '-O3', '-std=c++17', '-shared', '-fPIC', src, '-o', tmp]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)
    return so_path


def load(name: str):
    """Load (building if needed) a native library; returns ctypes.CDLL or
    None when unavailable."""
    if name in _libs:
        return _libs[name]
    try:
        lib = ctypes.CDLL(_build(name))
    except Exception:
        lib = None
    _libs[name] = lib
    return lib


def traceback_lib():
    lib = load('traceback')
    if lib is not None and not getattr(lib, '_configured', False):
        i8p = ctypes.POINTER(ctypes.c_int8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.traceback_stats.argtypes = [
            u8p, i8p, i8p, i32p, i32p, u8p, u8p, i32p, i32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p]
        lib.traceback_stats.restype = None
        lib._configured = True
    return lib
