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


_SOURCES = {
    'core': ['traceback.cpp', 'align_host.cpp', 'align_simd.cpp'],
}


def _build(name: str):
    srcs = [os.path.join(_DIR, s) for s in _SOURCES.get(name, [name + '.cpp'])]
    hasher = hashlib.sha256()
    for src in srcs:
        with open(src, 'rb') as f:
            hasher.update(f.read())
    so_path = os.path.join(_CACHE, '%s-%s.so' % (name, hasher.hexdigest()[:16]))
    if not os.path.isfile(so_path):
        os.makedirs(_CACHE, exist_ok=True)
        tmp = so_path + '.%d.tmp' % os.getpid()
        cmd = (['g++', '-O3', '-std=c++17', '-shared', '-fPIC', '-pthread',
                '-march=native'] + srcs + ['-o', tmp])
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except subprocess.CalledProcessError:
            # Some toolchains reject -march=native (e.g. exotic hosts).
            cmd.remove('-march=native')
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
    lib = load('core')
    if lib is not None and not getattr(lib, '_configured', False):
        i8p = ctypes.POINTER(ctypes.c_int8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.traceback_stats.argtypes = [
            u8p, i8p, i8p, i32p, i32p, u8p, u8p, i32p, i32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p]
        lib.traceback_stats.restype = None
        for fn_name in ('align_host_batch', 'align_simd_batch',
                        'align_simd_scores'):
            fn = getattr(lib, fn_name)
            fn.argtypes = [
                i8p, i64p, i8p, i64p, i64p, i64p, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int64, i64p]
            fn.restype = None
        lib._configured = True
    return lib


def align_host_batch(windows, adapters, pairs, scoring, n_threads=0,
                     score_only=False):
    """Batched host alignment via the native engine.

    windows/adapters: lists of np.int8 Dna5 code arrays; pairs (P, 2) int64.
    Returns a (P, 9) int64 array (see align_host.cpp) or None when the
    native library is unavailable or the scheme is linear (open == ext).

    score_only: SIMD path skips the trace-bit stream and the walker; only
    column 4 (best score) and the degenerate markers (column 0 == -1) are
    meaningful.  The scalar fallback ignores the flag (full results are a
    superset)."""
    import numpy as np

    match, mismatch, open_, ext = (int(x) for x in scoring)
    if open_ == ext:
        return None
    lib = traceback_lib()
    if lib is None:
        return None

    def concat(seqs):
        off = np.zeros(len(seqs) + 1, dtype=np.int64)
        for k, s in enumerate(seqs):
            off[k + 1] = off[k] + len(s)
        buf = np.empty(off[-1], dtype=np.int8)
        for k, s in enumerate(seqs):
            buf[off[k]:off[k + 1]] = s
        return buf, off

    rbuf, roff = concat(windows)
    abuf, aoff = concat(adapters)
    pairs = np.ascontiguousarray(pairs, dtype=np.int64)
    P = len(pairs)
    out = np.zeros((P, 9), dtype=np.int64)
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 16)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    pr = np.ascontiguousarray(pairs[:, 0])
    pa = np.ascontiguousarray(pairs[:, 1])
    if os.environ.get('PORECHOP_TPU_NO_SIMD'):
        fn = lib.align_host_batch
    elif score_only:
        fn = lib.align_simd_scores
    else:
        fn = lib.align_simd_batch
    fn(p(rbuf, ctypes.c_int8), p(roff, ctypes.c_int64),
       p(abuf, ctypes.c_int8), p(aoff, ctypes.c_int64),
       p(pr, ctypes.c_int64), p(pa, ctypes.c_int64),
       P, match, mismatch, open_, ext, n_threads,
       p(out, ctypes.c_int64))
    return out
