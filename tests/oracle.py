"""Test oracle: compiles the reference's C++ aligner (SeqAn) from the
read-only reference checkout into a scratch directory and exposes it through
ctypes.  Used only by the test suite to pin exact alignment semantics; the
framework itself never touches it.

If the reference tree or a C++ toolchain is unavailable the oracle is
reported as missing and oracle-backed tests are skipped.
"""

import os
import subprocess
from ctypes import CDLL, c_char_p, c_int, c_void_p, cast

REF_ROOT = '/root/reference'
BUILD_DIR = '/tmp/porechop_tpu_oracle'
SO_PATH = os.path.join(BUILD_DIR, 'cpp_functions.so')

_lib = None


def available() -> bool:
    return _load() is not None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isdir(os.path.join(REF_ROOT, 'porechop', 'src')):
        return None
    if not os.path.isfile(SO_PATH):
        os.makedirs(BUILD_DIR, exist_ok=True)
        cmd = ['g++', '-std=c++14', '-I', os.path.join(REF_ROOT, 'porechop', 'include'),
               '-fPIC', '-shared', '-O3', '-o', SO_PATH,
               os.path.join(REF_ROOT, 'porechop', 'src', 'adapter_align.cpp'),
               os.path.join(REF_ROOT, 'porechop', 'src', 'alignment.cpp')]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except Exception:
            return None
    lib = CDLL(SO_PATH)
    lib.adapterAlignment.argtypes = [c_char_p, c_char_p, c_int, c_int, c_int, c_int]
    lib.adapterAlignment.restype = c_void_p
    lib.freeCString.argtypes = [c_void_p]
    lib.freeCString.restype = None
    _lib = lib
    return lib


def oracle_align(read: str, adapter: str, scoring=(3, -6, -5, -2)) -> str:
    """Returns the raw CSV string from the reference engine:
    readStart,readEnd,adapterStart,adapterEnd,rawScore,alnPct,fullPct."""
    lib = _load()
    assert lib is not None, 'oracle unavailable'
    match, mismatch, gap_open, gap_ext = scoring
    ptr = lib.adapterAlignment(read.encode(), adapter.encode(),
                               match, mismatch, gap_open, gap_ext)
    out = cast(ptr, c_char_p).value.decode()
    lib.freeCString(ptr)
    return out


def parse_csv(csv: str):
    """Parse the oracle CSV into comparable values (ints + floats; NaN-safe)."""
    parts = csv.split(',')
    ints = [int(x) for x in parts[:5]]
    floats = [float(x) for x in parts[5:]]
    return ints, floats
