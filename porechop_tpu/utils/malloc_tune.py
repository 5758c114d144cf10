"""glibc allocator tuning for fault-expensive hosts.

On memory-overcommitted VMs (ballooning hypervisors, DAMON/idle-page
reclaim hosts) a FRESH page fault can cost orders of magnitude more than a
warm write — measured 22-46 MB/s first-touch vs 1.7 GB/s resident on the
build host (BASELINE.md r5 note).  numpy allocates large buffers with
mmap, which glibc munmaps on free, so every pipeline phase re-faults its
working set from the hypervisor on every run.

Raising M_MMAP_THRESHOLD keeps large allocations on the brk heap, and
raising M_TRIM_THRESHOLD stops glibc returning the freed heap to the
kernel — the working set stays resident and is reused across phases and
runs.  The cost is a persistently higher RSS (bounded by the peak working
set, which the streaming layer already bounds); disable with
PORECHOP_TPU_NO_MALLOC_TUNE=1 on memory-constrained deployments.

mallopt is callable at runtime through ctypes, so entry points apply this
without needing MALLOC_* environment variables set before exec.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os

# glibc malloc.h parameter numbers.
M_TRIM_THRESHOLD = -1
M_MMAP_THRESHOLD = -3

_done = False


def configure(mmap_threshold: int = 1 << 30,
              trim_threshold: int = 1 << 30) -> bool:
    """Apply the tuning once; returns True when mallopt succeeded."""
    global _done
    if _done:
        return True
    if os.environ.get('PORECHOP_TPU_NO_MALLOC_TUNE'):
        return False
    try:
        libc = ctypes.CDLL(ctypes.util.find_library('c') or 'libc.so.6',
                           use_errno=True)
        ok = (libc.mallopt(M_MMAP_THRESHOLD, mmap_threshold) == 1
              and libc.mallopt(M_TRIM_THRESHOLD, trim_threshold) == 1)
    except Exception:
        return False
    _done = ok
    return ok
