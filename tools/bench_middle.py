#!/usr/bin/env python3
"""On-chip microbench of the middle-shape kernels (VERDICT r4 task 3):
stat-carrying vs score-only forward at the middle round-0 shape, plus the
column-tiled bitmap kernel with the gap-run window bound.

Same timing methodology as tools/bench_forward.py: fresh random inputs per
iteration (the tunnel memoizes identical (computation, input) pairs),
settled uploads, completion forced by fetching a scalar reduction.

Usage: python tools/bench_middle.py [B L A]...
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
    from porechop_tpu.ops import kernel_pallas

    print('backend:', jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    def mk(B, L, A):
        return (jnp.asarray(rng.integers(0, 4, (B, L)), jnp.int8),
                jnp.asarray(np.full(B, L), jnp.int32),
                jnp.asarray(rng.integers(0, 4, (B, A)), jnp.int8),
                jnp.asarray(np.full(B, A), jnp.int32))

    def run(fn, B, L, A, label, repeats=3, tuple_out=True):
        if tuple_out:
            fsum = jax.jit(lambda r, rl, a, al: sum(
                x.astype(jnp.int32).sum()
                for x in fn(r, rl, a, al, 3, -6, -5, -2)))
        else:
            fsum = jax.jit(lambda r, rl, a, al: fn(
                r, rl, a, al, 3, -6, -5, -2).astype(jnp.int32).sum())
        args = mk(B, L, A)
        np.asarray(fsum(*args))            # compile + warm
        best = float('inf')
        for _ in range(repeats):
            args = mk(B, L, A)
            float(np.asarray(args[0][0, 0]))
            t0 = time.perf_counter()
            np.asarray(fsum(*args))
            best = min(best, time.perf_counter() - t0)
        cells = B * (L + 1) * A
        print('%-26s B=%-6d L=%-6d A=%-3d  %.4fs  %.3e cells/s'
              % (label, B, L, A, best, cells / best), flush=True)
        return best

    shapes = [(2048, 10000, 32), (8192, 10000, 32)]
    if len(sys.argv) > 1:
        vals = [int(x) for x in sys.argv[1:]]
        shapes = [tuple(vals[i:i + 3]) for i in range(0, len(vals), 3)]

    for B, L, A in shapes:
        t_stats = run(kernel_pallas.forward_stats_pallas_impl, B, L, A,
                      'stats (payload) kernel')
        t_score = run(kernel_pallas.forward_score_pallas_impl, B, L, A,
                      'score-only kernel', tuple_out=False)
        print('  -> score-only speedup: %.2fx' % (t_stats / t_score),
              flush=True)

    # Tiled kernel with the window-bounded in-tile prefix (long reads).
    run(kernel_pallas.forward_pallas_tiled_impl, 128, 90000, 32,
        'tiled bitmap (windowed)')


if __name__ == '__main__':
    main()
