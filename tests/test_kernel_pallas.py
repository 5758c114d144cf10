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


@pytest.mark.parametrize('seed,B,L,A', [(1, 32, 60, 12), (2, 64, 150, 24),
                                        (3, 32, 300, 44), (4, 32, 40, 32),
                                        (5, 32, 700, 24)])
def test_stats_kernel_matches_walk(seed, B, L, A):
    """The stat-carrying detection kernel must report the exact
    (raw_score, matches, full_len) of the SeqAn-traceback path — same
    values the bitmap forward + walk + finish recovers (VERDICT r3
    task 2: the detection phase consumes only these)."""
    rng = np.random.default_rng(seed)
    reads = rng.integers(0, 5, (B, L)).astype(np.int8)
    rl = rng.integers(1, L + 1, B).astype(np.int32)
    adps = rng.integers(0, 5, (B, A)).astype(np.int8)
    al = rng.integers(1, A + 1, B).astype(np.int32)
    for k in range(0, B, 4):        # low-entropy lanes force score ties
        reads[k] = rng.integers(0, 2, L)
        adps[k] = rng.integers(0, 2, A)
    for k in range(1, B, 3):        # embedded adapters for realistic hits
        a = adps[k, :al[k]]
        if rl[k] > al[k]:
            pos = int(rng.integers(0, rl[k] - al[k]))
            reads[k, pos:pos + al[k]] = a
    with pltpu.force_tpu_interpret_mode():
        best, ci, cj, mat, fl = kernel_pallas.forward_stats_pallas(
            reads, rl, adps, al, 3, -6, -5, -2)
    ref = engine_v2.align_batch(reads, rl, adps, al, (3, -6, -5, -2))
    for k in range(B):
        got = (int(np.asarray(best)[k]), int(np.asarray(mat)[k]),
               int(np.asarray(fl)[k]))
        want = (int(ref['raw_score'][k]), int(ref['matches'][k]),
                int(ref['full_len'][k]))
        assert got == want, (k, int(rl[k]), int(al[k]), got, want)


def test_gap_run_window_bound_adversarial():
    """The bounded H-prefix window (kernel_pallas._prefix_window) must not
    change any result even on inputs ENGINEERED to contain long optimal
    gap runs: reads built as adapter-prefix + g junk bases + adapter-suffix
    force the best path to carry an H-run of ~g columns.  Sweeps g through
    and past the bound and checks the full 8-field result of the windowed
    engines (jnp forward + walk, lane-major stats kernel, transposed stats
    kernel) against the full-window executable spec."""
    from porechop_tpu.ops import spec

    scheme = (3, -6, -5, -2)
    A = 24
    # window = 1 + (3*23+5)//2 + 2 = 40 for this scheme/A.
    gaps = [1, 5, 16, 30, 38, 40, 42, 64, 120]
    rng = np.random.default_rng(99)
    lanes = []
    for g in gaps:
        adapter = rng.integers(0, 4, A).astype(np.int8)
        cut = A // 2
        junk = rng.integers(0, 4, g).astype(np.int8)
        read = np.concatenate([adapter[:cut], junk, adapter[cut:]])
        lanes.append((read, adapter))
        # Tie-stress variant: low-entropy read around the same structure.
        read2 = np.concatenate([adapter[:cut], (junk % 2), adapter[cut:]])
        lanes.append((read2, adapter))
    B = 128                 # transposed kernel requires a 128-lane block
    L = max(len(r) for r, _ in lanes)
    reads = np.full((B, L), 4, np.int8)
    rl = np.ones(B, np.int32)
    adps = np.full((B, A), 4, np.int8)
    al = np.full(B, A, np.int32)
    for k, (r, a) in enumerate(lanes):
        reads[k, :len(r)] = r
        rl[k] = len(r)
        adps[k] = a

    codes = 'ACGTN'
    want = [spec.align_stats(''.join(codes[c] for c in reads[k, :rl[k]]),
                             ''.join(codes[c] for c in adps[k]), scheme)
            for k in range(len(lanes))]

    # jnp forward (windowed cummax) through walk + finish.
    full = engine_v2.align_batch(reads, rl, adps, al, scheme)
    for k, w in enumerate(want):
        got = {f: int(full[f][k]) for f in
               ('read_start', 'read_end', 'matches', 'full_len',
                'raw_score')}
        exp = {f: getattr(w, f) for f in got}
        assert got == exp, ('jnp+walk', k, gaps[k // 2], got, exp)

    # Stat-carrying kernels, lane-major and transposed.
    with pltpu.force_tpu_interpret_mode():
        st = kernel_pallas.forward_stats_pallas(reads, rl, adps, al, *scheme)
        st_t = kernel_pallas.forward_stats_pallas_t(reads, rl, adps, al,
                                                    *scheme)
    for name, (best, ci, cj, mat, fl) in (('stats', st), ('stats_t', st_t)):
        for k, w in enumerate(want):
            got = (int(np.asarray(best)[k]), int(np.asarray(mat)[k]),
                   int(np.asarray(fl)[k]))
            exp = (w.raw_score, w.matches, w.full_len)
            assert got == exp, (name, k, gaps[k // 2], got, exp)


def test_fused_groupmax_stats_path_matches_walk_path():
    """The fused gather+group-max launch with the stats kernel (mode 1)
    must return the same per-group (matches, full_len) as the bitmap+walk
    path (mode 0)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(11)
    W, Na, L, A = 12, 6, 150, 24
    wmat = rng.integers(0, 5, (W + 1, L)).astype(np.int8)
    wlen = rng.integers(20, L + 1, W + 1).astype(np.int32)
    amat = rng.integers(0, 5, (Na + 1, A)).astype(np.int8)
    alen = rng.integers(8, A + 1, Na + 1).astype(np.int32)
    B = 64
    w_idx = rng.integers(0, W, B).astype(np.int32)
    a_idx = rng.integers(0, Na, B).astype(np.int32)
    g_idx = rng.integers(0, 5, B).astype(np.int32)
    wpk = engine_v2.pack_nibbles(wmat)
    args = (wpk, jnp.asarray(wlen), jnp.asarray(amat), jnp.asarray(alen),
            jnp.asarray(w_idx), jnp.asarray(a_idx), jnp.asarray(g_idx),
            L, 5, 3, -6, -5, -2)
    gm0, gl0 = (np.asarray(x) for x in
                engine_v2._fused_gather_groupmax(*args, 0))
    with pltpu.force_tpu_interpret_mode():
        gm1, gl1 = (np.asarray(x) for x in
                    engine_v2._fused_gather_groupmax(*args, 1))
    assert np.array_equal(gm0, gm1), (gm0, gm1)
    assert np.array_equal(gl0, gl1), (gl0, gl1)
