#!/usr/bin/env python3
"""Detection-launch A/B: bitmap forward + device walk (r3 path) vs the
stat-carrying kernel (r4), at the bench detection shape.

Methodology per BASELINE.md: the tunnel memoizes (computation, input)
pairs and `block_until_ready` is a no-op, so every iteration uses fresh
lane indices and ends with a forced host fetch of the tiny result.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from porechop_tpu.ops import engine_v2, _jax_setup

_jax_setup.configure()

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 12, 13))
def _groupmax_walk(wpk, wlens, amat, alens, w_idx, a_idx, g_idx,
                   wcols, n_groups, match, mismatch, gap_open, gap_ext,
                   mode):
    """The r3 path: bitmap forward + traceback walk + finish + reduce."""
    reads = engine_v2._unpack_nibbles(jnp.take(wpk, w_idx, axis=0), wcols)
    rl = jnp.take(wlens, w_idx)
    adps = jnp.take(amat, a_idx, axis=0)
    al = jnp.take(alens, a_idx)
    fwd = engine_v2._forward_mode(reads, rl, adps, al, match, mismatch,
                                  gap_open, gap_ext, mode)
    bits, best_sc, cell_i, cell_j, vflag, hflag = fwd
    walk = engine_v2._traceback_impl(bits, cell_i, cell_j, vflag, hflag)
    matches, full_len, failed = engine_v2._finish_stats_device(
        walk, best_sc, cell_i, cell_j, rl, al)
    ok = (~failed) & (full_len > 0)
    return engine_v2._groupmax_reduce(matches, full_len, ok, g_idx, n_groups)


def main():
    B = int(os.environ.get('DETECT_B', 131072))
    L = int(os.environ.get('DETECT_L', 150))
    A = int(os.environ.get('DETECT_A', 24))
    iters = int(os.environ.get('DETECT_ITERS', 4))
    W, Na, NG = 2048, 48, 48
    rng = np.random.default_rng(0)
    wmat = rng.integers(0, 4, (W + 1, L)).astype(np.int8)
    wlen = np.full(W + 1, L, np.int32)
    amat = rng.integers(0, 4, (Na + 1, A)).astype(np.int8)
    alen = np.full(Na + 1, A, np.int32)
    wpk = engine_v2.pack_nibbles(wmat)
    wlen_d = jnp.asarray(wlen)
    amat_d = jnp.asarray(amat)
    alen_d = jnp.asarray(alen)

    mode = engine_v2._pallas_mode(B, L, A)
    print('pallas mode:', mode, flush=True)

    def fresh():
        w_idx = jnp.asarray(rng.integers(0, W, B).astype(np.int32))
        a_idx = jnp.asarray(rng.integers(0, Na, B).astype(np.int32))
        g_idx = jnp.asarray(rng.integers(0, NG, B).astype(np.int32))
        return w_idx, a_idx, g_idx

    for name, fn in (
        ('stats (r4)', lambda wi, ai, gi: engine_v2._fused_gather_groupmax(
            wpk, wlen_d, amat_d, alen_d, wi, ai, gi, L, NG,
            3, -6, -5, -2, mode)),
        ('bits+walk (r3)', lambda wi, ai, gi: _groupmax_walk(
            wpk, wlen_d, amat_d, alen_d, wi, ai, gi, L, NG,
            3, -6, -5, -2, mode)),
    ):
        wi, ai, gi = fresh()
        t0 = time.perf_counter()
        gm, gl = fn(wi, ai, gi)
        np.asarray(gm)
        print('%s compile+first: %.3fs' % (name, time.perf_counter() - t0),
              flush=True)
        times = []
        for _ in range(iters):
            wi, ai, gi = fresh()
            t0 = time.perf_counter()
            gm, gl = fn(wi, ai, gi)
            np.asarray(gm), np.asarray(gl)     # forced fetch
            times.append(time.perf_counter() - t0)
        times.sort()
        cells = B * (L + 1) * A
        med = times[len(times) // 2]
        print('%s: best %.4fs med %.4fs (%.2e cells/s med) %s'
              % (name, times[0], med, cells / med,
                 ['%.3f' % t for t in times]), flush=True)


if __name__ == '__main__':
    main()
