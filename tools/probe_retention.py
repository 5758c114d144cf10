#!/usr/bin/env python3
"""Tunnel-client buffer-retention probe (VERDICT r4 task 4).

BASELINE.md's 1M-read stretch measured RSS growing ~1-5 KB/read on the
tunneled (axon/IFRT-proxy) backend and attributed it to the client
retaining host-side copies of transferred buffers (its content-addressed
upload cache).  This probe decides whether that retention is reachable
from the JAX API: it uploads N distinct large arrays (forcing settlement),
in four modes, and prints RSS after each batch.

  none    - device array refs dropped immediately (GC only)
  delete  - x.delete() called explicitly before dropping the ref
  donate  - arrays consumed by a donated-argument jit then dropped
  reuse   - the same np buffer object re-filled in place and re-uploaded
            (tests whether the cache keys on content or on buffer id)

If RSS climbs identically in all modes, retention is inside the tunnel
client and unreachable from JAX — the documented remedy
(PORECHOP_TPU_FORCE_HOST=1 for multi-GB streams on tunneled rigs) stands,
and the result is recorded in BASELINE.md.

Usage: python tools/probe_retention.py [mode ...] [--mb 8] [--n 40]
"""
import argparse
import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def rss_mb():
    with open('/proc/self/status') as f:
        for line in f:
            if line.startswith('VmRSS'):
                return int(line.split()[1]) / 1024.0
    return float('nan')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('modes', nargs='*',
                    default=['none', 'delete', 'donate', 'reuse'])
    ap.add_argument('--mb', type=int, default=8)
    ap.add_argument('--n', type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    print('backend:', jax.default_backend(), flush=True)

    nbytes = args.mb * 1024 * 1024
    rng = np.random.default_rng(0)

    @jax.jit
    def consume(x):
        return x.astype(jnp.int32).sum()

    consume_donated = jax.jit(lambda x: x.astype(jnp.int32).sum(),
                              donate_argnums=0)

    for mode in args.modes:
        gc.collect()
        base = rss_mb()
        t0 = time.perf_counter()
        buf = np.empty(nbytes, np.uint8)
        for k in range(args.n):
            if mode == 'reuse':
                buf[:8] = rng.integers(0, 256, 8)     # new content, same buf
                host = buf
            else:
                host = rng.integers(0, 256, nbytes, dtype=np.uint8)
            x = jax.device_put(host)
            if mode == 'donate':
                s = consume_donated(x)
            else:
                s = consume(x)
            int(np.asarray(s))                        # settle
            if mode == 'delete':
                x.delete()
            del x
            if (k + 1) % 10 == 0:
                gc.collect()
                print('  %-7s %3d uploads (%d MB shipped): RSS %.0f MB '
                      '(+%.0f)' % (mode, k + 1, (k + 1) * args.mb, rss_mb(),
                                   rss_mb() - base), flush=True)
        print('%-7s done in %.1fs: RSS +%.0f MB for %d MB shipped'
              % (mode, time.perf_counter() - t0, rss_mb() - base,
                 args.n * args.mb), flush=True)


if __name__ == '__main__':
    main()
