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
