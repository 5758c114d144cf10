#!/usr/bin/env python3
"""On-chip microbench of the Pallas forward kernels (not part of the package).

Times the forward alone at bench-workload-like shapes and cross-checks a
small case against the jnp forward.  Usage: python tools/bench_forward.py

Timing methodology: on tunneled (axon) backends `block_until_ready` returns
before the computation actually finishes, and the tunnel memoizes identical
(computation, input) pairs — so each timed iteration uses FRESH random
inputs (settled with a scalar fetch before the clock starts) and forces
completion by fetching a scalar reduction of the outputs.  Round-2 numbers
recorded without this (commit 264f) overstated the kernel rate.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from porechop_tpu.ops import engine_v2, kernel_pallas

    print('backend:', jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    def mk(B, L, A):
        return (jnp.asarray(rng.integers(0, 4, (B, L)), jnp.int8),
                jnp.asarray(np.full(B, L), jnp.int32),
                jnp.asarray(rng.integers(0, 4, (B, A)), jnp.int8),
                jnp.asarray(np.full(B, A), jnp.int32))

    def run(fn, B, L, A, label, repeats=3):
        # Reduce outputs to one scalar on device so the timed fetch is tiny;
        # the fetch (np.asarray) is what actually waits for the kernel.
        fsum = jax.jit(lambda r, rl, a, al: sum(
            x.astype(jnp.int32).sum()
            for x in fn(r, rl, a, al, 3, -6, -5, -2)))
        args = mk(B, L, A)
        np.asarray(fsum(*args))            # compile + warm
        best = float('inf')
        for _ in range(repeats):
            args = mk(B, L, A)             # fresh inputs defeat memoization
            float(np.asarray(args[0][0, 0]))   # settle uploads
            t0 = time.perf_counter()
            np.asarray(fsum(*args))
            best = min(best, time.perf_counter() - t0)
        cells = B * (L + 1) * A
        print('%-28s B=%-6d L=%-6d A=%-3d  %.4fs  %.3e cells/s'
              % (label, B, L, A, best, cells / best), flush=True)

    # Correctness cross-check on-chip (small).
    reads = jnp.asarray(rng.integers(0, 5, (64, 300)), jnp.int8)
    rl = jnp.asarray(rng.integers(1, 301, 64), jnp.int32)
    adps = jnp.asarray(rng.integers(0, 5, (64, 28)), jnp.int8)
    al = jnp.asarray(rng.integers(1, 29, 64), jnp.int32)
    p = kernel_pallas.forward_pallas(reads, rl, adps, al, 3, -6, -5, -2)
    j = engine_v2._forward(reads, rl, adps, al, 3, -6, -5, -2)
    ok = True
    for x, y in zip(p, j):
        xa, ya = np.asarray(x), np.asarray(y)
        if xa.ndim == 3:
            xa = xa[..., :ya.shape[2]]
        if not np.array_equal(xa, ya):
            ok = False
    print('single-tile on-chip parity vs jnp:', 'OK' if ok else 'MISMATCH',
          flush=True)

    t = kernel_pallas.forward_pallas_tiled(reads, rl, adps, al, 3, -6, -5, -2)
    ok = True
    for x, y in zip(t, j):
        xa, ya = np.asarray(x), np.asarray(y)
        if xa.ndim == 3:
            xa = xa[..., :ya.shape[2]]
        if not np.array_equal(xa, ya):
            ok = False
    print('tiled on-chip parity vs jnp:', 'OK' if ok else 'MISMATCH',
          flush=True)

    # Detection shape: 150 bp windows (L1p=256), A rung 32.
    run(kernel_pallas.forward_pallas, 8192, 150, 32, 'single detection')
    # Middle-phase shape: 10 kb reads (L1p=12288 tiled), A rung 32.
    run(kernel_pallas.forward_pallas, 2048, 10000, 32, 'single middle-10k')
    run(kernel_pallas.forward_pallas_tiled, 2048, 10000, 32, 'tiled middle-10k')
    # Long-read shape.
    run(kernel_pallas.forward_pallas_tiled, 128, 90000, 32, 'tiled 90k')


if __name__ == '__main__':
    main()
