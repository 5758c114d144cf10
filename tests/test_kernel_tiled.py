"""Column-tiled Pallas forward (ops/kernel_pallas.forward_pallas_tiled):
parity with the jnp forward and the executable spec across tile
boundaries.  Runs in Pallas interpret mode on CPU.

Frozen rows (row > adapter_len) legitimately differ from the jnp engine —
their trace bytes are garbage on every engine and the walker never visits
them (the walk starts at cell_i <= adapter_len and only moves up) — so the
bit comparison is masked per lane to rows <= adapter_len.
"""

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp                                    # noqa: E402
from jax.experimental.pallas import tpu as pltpu          # noqa: E402

from porechop_tpu.ops import engine_v2, kernel_pallas, spec  # noqa: E402


def _cases(seed, B, L, A):
    rng = np.random.default_rng(seed)
    reads = rng.integers(0, 5, (B, L)).astype(np.int8)
    rl = rng.integers(1, L + 1, B).astype(np.int32)
    rl[0] = L                       # full-length lane
    rl[1] = 1                       # degenerate-short lane
    adps = rng.integers(0, 5, (B, A)).astype(np.int8)
    al = rng.integers(1, A + 1, B).astype(np.int32)
    al[0] = A
    return reads, rl, adps, al


def test_tiled_forward_matches_jnp_across_boundary():
    # L spans two tiles (TILE_T = 2048); lengths land on both sides.
    B, L, A = 32, 2100, 17
    reads, rl, adps, al = _cases(7, B, L, A)
    with pltpu.force_tpu_interpret_mode():
        bt, best_t, ci_t, cj_t, vf_t, hf_t = kernel_pallas.forward_pallas_tiled(
            jnp.asarray(reads), jnp.asarray(rl), jnp.asarray(adps),
            jnp.asarray(al), 3, -6, -5, -2)
    # full_window: the tiled kernel's cross-tile carry keeps the full H
    # prefix, so bit-level comparison needs the unwindowed jnp forward
    # (walked results are identical either way).
    bj, best_j, ci_j, cj_j, vf_j, hf_j = engine_v2._forward(
        jnp.asarray(reads), jnp.asarray(rl), jnp.asarray(adps),
        jnp.asarray(al), 3, -6, -5, -2, True)
    bt = np.asarray(bt)[:, :, :L + 1]
    bj = np.asarray(bj)
    for b in range(B):
        rows = int(al[b])
        assert np.array_equal(bt[:rows, b], bj[:rows, b]), b
    for got, want in ((best_t, best_j), (ci_t, ci_j), (cj_t, cj_j),
                      (vf_t, vf_j), (hf_t, hf_j)):
        assert np.array_equal(np.asarray(got), np.asarray(want))


def test_tiled_full_result_matches_spec():
    """End-to-end through the shared traceback + finish."""
    B, L, A = 32, 2080, 12
    reads, rl, adps, al = _cases(8, B, L, A)
    with pltpu.force_tpu_interpret_mode():
        bits, best, ci, cj, vf, hf = kernel_pallas.forward_pallas_tiled(
            jnp.asarray(reads), jnp.asarray(rl), jnp.asarray(adps),
            jnp.asarray(al), 3, -6, -5, -2)
    walk = engine_v2._traceback(bits, jnp.asarray(ci), jnp.asarray(cj),
                                jnp.asarray(vf), jnp.asarray(hf))
    out = engine_v2.finish_v2(walk, best, ci, cj, rl, al)
    codes = 'ACGTN'
    for k in range(B):
        want = spec.align_stats(
            ''.join(codes[c] for c in reads[k, :rl[k]]),
            ''.join(codes[c] for c in adps[k, :al[k]]))
        got = {f: int(out[f][k]) for f in
               ('read_start', 'read_end', 'adapter_start', 'adapter_end',
                'raw_score', 'matches', 'aligned_len', 'full_len')}
        exp = {f: getattr(want, f) for f in got}
        assert got == exp, (k, got, exp)
