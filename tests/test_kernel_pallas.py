"""Pallas forward kernel vs the jnp forward, in interpreter mode on CPU.

The kernel must produce byte-identical trace bits and identical scout
elections; hardware runs are covered by the benchmark path (the driver's
TPU run), while this suite pins semantics without a chip.
"""

import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from porechop_tpu.ops import engine_v2, kernel_pallas


def _cases(seed, B, L, A):
    rng = np.random.default_rng(seed)
    reads = rng.integers(0, 5, (B, L)).astype(np.int8)
    rl = rng.integers(1, L + 1, B).astype(np.int32)
    adps = rng.integers(0, 5, (B, A)).astype(np.int8)
    al = rng.integers(1, A + 1, B).astype(np.int32)
    # Embed some adapters for realistic hits.
    for k in range(0, B, 3):
        a = adps[k, :al[k]]
        if rl[k] > al[k]:
            pos = int(rng.integers(0, rl[k] - al[k]))
            reads[k, pos:pos + al[k]] = a
    return reads, rl, adps, al


@pytest.mark.parametrize('seed,B,L,A', [(5, 32, 60, 12), (9, 64, 150, 28),
                                        (13, 32, 300, 44)])
def test_pallas_forward_matches_jnp(seed, B, L, A):
    reads, rl, adps, al = _cases(seed, B, L, A)
    with pltpu.force_tpu_interpret_mode():
        bits_p, best_p, ci_p, cj_p, vf_p, hf_p = kernel_pallas.forward_pallas(
            reads, rl, adps, al, 3, -6, -5, -2)
    bits_j, best_j, ci_j, cj_j, vf_j, hf_j = engine_v2._forward(
        reads, rl, adps, al, 3, -6, -5, -2)

    assert np.array_equal(np.asarray(best_p), np.asarray(best_j))
    assert np.array_equal(np.asarray(ci_p), np.asarray(ci_j))
    assert np.array_equal(np.asarray(cj_p), np.asarray(cj_j))
    assert np.array_equal(np.asarray(vf_p), np.asarray(vf_j))
    assert np.array_equal(np.asarray(hf_p), np.asarray(hf_j))

    bp = np.asarray(bits_p)[:, :, :L + 1]
    bj = np.asarray(bits_j)
    for b in range(B):
        rows = int(al[b])
        assert np.array_equal(bp[:rows, b], bj[:rows, b]), b


def test_pallas_full_result_matches_spec():
    """End-to-end through the shared traceback + finish."""
    from porechop_tpu.ops import spec
    reads, rl, adps, al = _cases(21, 32, 90, 16)
    with pltpu.force_tpu_interpret_mode():
        bits, best, ci, cj, vf, hf = kernel_pallas.forward_pallas(
            reads, rl, adps, al, 3, -6, -5, -2)
    import jax.numpy as jnp
    bits = bits[:, :, :reads.shape[1] + 1]   # trim column padding
    walk = engine_v2._traceback(bits, jnp.asarray(ci), jnp.asarray(cj),
                                jnp.asarray(vf), jnp.asarray(hf))
    out = engine_v2.finish_v2(walk, best, ci, cj, rl, al)
    codes = 'ACGTN'
    for k in range(len(rl)):
        want = spec.align_stats(
            ''.join(codes[c] for c in reads[k, :rl[k]]),
            ''.join(codes[c] for c in adps[k, :al[k]]))
        got = {f: int(out[f][k]) for f in
               ('read_start', 'read_end', 'adapter_start', 'adapter_end',
                'raw_score', 'matches', 'aligned_len', 'full_len')}
        exp = {f: getattr(want, f) for f in got}
        assert got == exp, (k, got, exp)
