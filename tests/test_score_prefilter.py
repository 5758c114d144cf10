"""Score-only kernel + middle-scan score prefilter (VERDICT r4 task 3).

The prefilter's soundness claim: a lane whose best semi-global score is
below coef(threshold) * adapter_len provably has full-span identity below
the threshold (kernel_pallas._score_kernel's bound note), so run_stats may
reject it without computing stats.  These tests pin (1) the score kernel
against the bitmap forward's best score, (2) the bound itself by fuzz
against exact results, and (3) the prefiltered run_stats against the plain
one at the consumer contract (identical >= threshold masks, identical
values for passing lanes).
"""

import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from porechop_tpu.ops import dispatch, engine_v2, kernel_pallas

SCORING = (3, -6, -5, -2)


def _cases(seed, B, L, A, hit_every=3):
    rng = np.random.default_rng(seed)
    reads = rng.integers(0, 5, (B, L)).astype(np.int8)
    rl = rng.integers(1, L + 1, B).astype(np.int32)
    adps = rng.integers(0, 4, (B, A)).astype(np.int8)
    al = rng.integers(max(1, A // 2), A + 1, B).astype(np.int32)
    for k in range(0, B, hit_every):
        a = adps[k, :al[k]].copy()
        # Mutate a couple of bases so identities land near thresholds.
        for p in rng.integers(0, al[k], int(rng.integers(0, 3))):
            a[p] = (a[p] + 1) % 4
        if rl[k] > al[k]:
            pos = int(rng.integers(0, rl[k] - al[k]))
            reads[k, pos:pos + al[k]] = a
    return reads, rl, adps, al


@pytest.mark.parametrize('seed,B,L,A', [(3, 32, 60, 12), (7, 64, 150, 28),
                                        (11, 32, 300, 44)])
def test_score_kernel_matches_forward_best(seed, B, L, A):
    reads, rl, adps, al = _cases(seed, B, L, A)
    with pltpu.force_tpu_interpret_mode():
        best_s = kernel_pallas.forward_score_pallas(
            reads, rl, adps, al, *SCORING)
    _, best_f, _, _, _, _ = engine_v2._forward(reads, rl, adps, al, *SCORING)
    assert np.array_equal(np.asarray(best_s), np.asarray(best_f))


def test_score_prefilter_bound_sound():
    """No pair with exact full_pct >= threshold may score below
    coef * adapter_len — fuzzed over random and planted-hit pairs."""
    rng = np.random.default_rng(17)
    windows, adapters, pairs = [], [], []
    for _ in range(48):
        L = int(rng.integers(40, 400))
        windows.append(rng.integers(0, 4, L).astype(np.int8))
    for _ in range(8):
        adapters.append(rng.integers(0, 4, int(rng.integers(8, 44)))
                        .astype(np.int8))
    # Plant noisy copies (0-4 mutations) of adapters into half the windows.
    for wi in range(0, len(windows), 2):
        ai = int(rng.integers(0, len(adapters)))
        a = adapters[ai].copy()
        for p in rng.integers(0, len(a), int(rng.integers(0, 5))):
            a[p] = (a[p] + 1 + rng.integers(0, 3)) % 4
        w = windows[wi]
        if len(w) > len(a):
            pos = int(rng.integers(0, len(w) - len(a)))
            w[pos:pos + len(a)] = a
    for wi in range(len(windows)):
        for ai in range(len(adapters)):
            pairs.append((wi, ai))
    res = dispatch.AlignJobs(windows, adapters, np.asarray(pairs),
                             SCORING).run()
    alen = np.array([len(adapters[ai]) for _, ai in pairs], np.int64)
    for threshold in (75.0, 85.0, 90.0, 96.0):
        coef = kernel_pallas.score_prefilter_coef(threshold, *SCORING)
        assert coef > 0
        rejected = res['raw_score'].astype(np.float64) < coef * alen
        passing = res['full_pct'] >= threshold
        bad = rejected & passing
        assert not bad.any(), (threshold,
                               np.nonzero(bad)[0][:5],
                               res['full_pct'][bad][:5],
                               res['raw_score'][bad][:5])


def test_score_prefilter_coef_gates():
    # Vacuous below tau = Q/(match+Q) = 6/9 -> 66.7%.
    assert kernel_pallas.score_prefilter_coef(60.0, *SCORING) == 0.0
    assert kernel_pallas.score_prefilter_coef(90.0, *SCORING) > 0
    # Non-positive match score: no bound.
    assert kernel_pallas.score_prefilter_coef(90.0, 0, -1, -1, -1) == 0.0


def test_detection_prefilter_same_selection():
    """find_matching_adapter_sets with exact_scores=False must select the
    SAME adapter sets, with identical best scores on the selected (and
    therefore exactly re-run) sets, as the exact flow — on reads with
    planted real adapters."""
    import copy
    import io

    from porechop_tpu.adapters import ADAPTERS
    from porechop_tpu.pipeline import phases
    from porechop_tpu.pipeline.model import Read

    rng = np.random.default_rng(77)
    nsk_start = 'AATGTACTTCGTTCAGTTACGTATTGCT'
    nsk_end = 'GCAATACGTAACTGAACGAAGT'
    reads = []
    for k in range(24):
        seq = ''.join('ACGT'[c] for c in rng.integers(0, 4, 600))
        if k % 2 == 0:
            seq = nsk_start + seq[len(nsk_start):]
        if k % 3 == 0:
            seq = seq[:-len(nsk_end)] + nsk_end
        reads.append(Read('r%d' % k, seq, 'J' * len(seq)))

    def run(exact):
        for a in ADAPTERS:          # fresh score state
            a.best_start_score = 0.0
            a.best_end_score = 0.0
        sets = phases.find_matching_adapter_sets(
            copy.deepcopy(reads), 0, 150, SCORING, io.StringIO(), 90.0, 1,
            exact_scores=exact)
        return [(s.name, round(s.best_start_score, 6),
                 round(s.best_end_score, 6)) for s in sets]

    exact = run(True)
    pref = run(False)
    assert exact == pref
    assert any('SQK-NSK007' in name for name, _, _ in exact)


def test_run_group_score_max_matches_full():
    """The group max-score pass equals the per-group max of full-run raw
    scores (device/jnp and native folds both exercised via NO_NATIVE)."""
    rng = np.random.default_rng(9)
    windows = [rng.integers(0, 4, 150).astype(np.int8) for _ in range(40)]
    adapters = [rng.integers(0, 4, n).astype(np.int8) for n in (22, 31)]
    pairs = np.array([(w, a) for w in range(40) for a in range(2)])
    gids = pairs[:, 1].astype(np.int64)
    full = dispatch.AlignJobs(windows, adapters, pairs, SCORING).run()
    want = np.full(2, -2 ** 31 + 1, np.int64)
    np.maximum.at(want, gids, full['raw_score'])
    got = dispatch.AlignJobs(windows, adapters, pairs,
                             SCORING).run_group_score_max(gids, 2)
    assert np.array_equal(want, got)


@pytest.mark.parametrize('threshold', [85.0, 90.0, 96.0])
def test_run_stats_prefiltered_agrees(threshold):
    """Consumer contract: identical >= threshold masks and identical
    values for passing lanes, with and without the prefilter."""
    if not dispatch.stats_path_active(SCORING):
        pytest.skip('stats path inactive')
    rng = np.random.default_rng(29)
    windows = [rng.integers(0, 4, int(rng.integers(100, 900))).astype(np.int8)
               for _ in range(40)]
    adapters = [rng.integers(0, 4, n).astype(np.int8) for n in (24, 30, 41)]
    for wi in range(0, len(windows), 2):
        a = adapters[wi % len(adapters)].copy()
        for p in rng.integers(0, len(a), int(rng.integers(0, 4))):
            a[p] = (a[p] + 1) % 4
        w = windows[wi]
        pos = int(rng.integers(0, len(w) - len(a)))
        w[pos:pos + len(a)] = a
    pairs = np.array([(wi, ai) for wi in range(len(windows))
                      for ai in range(len(adapters))])
    plain = dispatch.AlignJobs(windows, adapters, pairs,
                               SCORING).run_stats()
    pref = dispatch.AlignJobs(windows, adapters, pairs, SCORING).run_stats(
        prefilter=threshold)
    m_plain = plain['full_pct'] >= threshold
    m_pref = pref['full_pct'] >= threshold
    assert np.array_equal(m_plain, m_pref)
    assert np.array_equal(plain['full_pct'][m_plain],
                          pref['full_pct'][m_pref])
    assert np.array_equal(plain['matches'][m_plain],
                          pref['matches'][m_pref])
    assert np.array_equal(plain['full_len'][m_plain],
                          pref['full_len'][m_pref])
    assert m_plain.any()          # the fixture must actually produce hits
