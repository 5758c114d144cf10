"""Stats-path / full-path equivalence of the middle-adapter scan
(VERDICT r4 task 6).

The middle phase's fast path (phases.find_adapters_in_read_middles with
stats_path_active) prices every (read, adapter) pair with the bitless
stat-carrying kernel and recomputes coordinates ONLY for each hit read's
first hit — relying on the invariant that the reference masks only after
the first hit, so round-0 results computed on unmasked reads are valid
exactly up to it (reference nanopore_read.py:216-243).  This test pins
"stats path + winner-only coordinate pass == full bitmap path" directly on
adversarial multi-hit, overlapping-adapter reads, so future kernel edits
cannot silently break the invariant while end-to-end fixtures happen to
pass.
"""

import copy
import io

import numpy as np
import pytest

from porechop_tpu.adapters import Adapter
from porechop_tpu.ops.dispatch import stats_path_active
from porechop_tpu.pipeline import phases
from porechop_tpu.pipeline.model import Read

SCORING = (3, -6, -5, -2)

ADAPT_A = 'AATGTACTTCGTTCAGTTACGTATTGCT'          # SQK-NSK007 start
ADAPT_A_END = 'GCAATACGTAACTGAACGAAGT'            # SQK-NSK007 end
ADAPT_B = 'GGTGTACTTCGTTCCAGACTACGTATTA'          # distinct middle adapter


def _mutate(s, positions, base='T'):
    out = list(s)
    for p in positions:
        out[p] = 'A' if out[p] == base else base
    return ''.join(out)


def _rng_seq(rng, n):
    return ''.join('ACGT'[c] for c in rng.integers(0, 4, n))


def _make_reads():
    """Adversarial middle-hit layouts.  Each read is a (name, seq) pair of
    random sequence with adapters embedded at known offsets."""
    rng = np.random.default_rng(42)
    reads = []

    # 1. Same adapter twice, 200 bp apart (k-hit chain: mask + realign).
    s = _rng_seq(rng, 1200)
    s = s[:300] + ADAPT_A + s[300:528] + ADAPT_A + s[528:]
    reads.append(('double_same', s))

    # 2. Two different adapters with OVERLAPPING hit regions: B's embedded
    # copy overlaps the tail of A's, so masking A's hit mutilates B's and
    # the replay must re-score B on the masked read (round-0's unmasked
    # B score is a lie after the mask — the invariant under test).
    s = _rng_seq(rng, 1000)
    chim = ADAPT_A[:20] + ADAPT_B          # B starts inside A's span
    s = s[:400] + ADAPT_A[:20] + ADAPT_B + s[400 + len(chim):]
    reads.append(('overlap_ab', s))

    # 3. B occurs earlier in the read than A: scan order (A first) differs
    # from positional order, so first-hit bookkeeping is exercised.
    s = _rng_seq(rng, 1100)
    s = s[:150] + ADAPT_B + s[150:600] + ADAPT_A + s[600:]
    reads.append(('b_before_a', s))

    # 4. Hits hugging both boundaries of the (end-trimmed) sequence.
    s = _rng_seq(rng, 900)
    s = ADAPT_A + s[len(ADAPT_A):820] + ADAPT_A_END + s[820 + len(ADAPT_A_END):]
    reads.append(('edges', s))

    # 5. Noisy occurrence near the threshold (2 mismatches) plus an exact
    # one — the noisy score must agree bit-for-bit between the two paths
    # for the >= threshold branch to match.
    s = _rng_seq(rng, 1000)
    noisy = _mutate(ADAPT_A, [5, 17])
    s = s[:200] + noisy + s[200:560] + ADAPT_A + s[560:]
    reads.append(('noisy_plus_exact', s))

    # 6. Triple occurrence of one adapter (longest replay chain).
    s = _rng_seq(rng, 1500)
    for pos in (250, 700, 1150):
        s = s[:pos] + ADAPT_A + s[pos + len(ADAPT_A):]
    reads.append(('triple', s))

    # 7. Clean read: no hits, must remain untouched on both paths.
    reads.append(('clean', _rng_seq(rng, 800)))

    return [Read(name, seq, 'J' * len(seq)) for name, seq in reads]


def _matching_sets():
    return [Adapter('SQK-NSK007',
                    start_sequence=('SQK-NSK007_Y_Top', ADAPT_A),
                    end_sequence=('SQK-NSK007_Y_Bottom', ADAPT_A_END)),
            Adapter('Synthetic-B',
                    start_sequence=('Synthetic_B_start', ADAPT_B))]


def _run_middle(reads, stats_on, monkeypatch, threshold=85.0):
    monkeypatch.setattr(
        phases, 'stats_path_active',
        (lambda scoring, **kw: stats_path_active(scoring, **kw)) if stats_on
        else (lambda scoring, **kw: False))
    dest = io.StringIO()
    dumps = phases.find_adapters_in_read_middles(
        reads, _matching_sets(), verbosity=0, middle_threshold=threshold,
        extra_trim_good_side=10, extra_trim_bad_side=100,
        scoring_scheme_vals=SCORING, print_dest=dest, threads=1,
        discard_middle=False, collect_dumps=3)
    return dumps


@pytest.mark.parametrize('no_native', [False, True],
                         ids=['hybrid', 'device-only'])
@pytest.mark.parametrize('threshold', [85.0, 90.0, 96.0])
def test_stats_path_equals_full_path(monkeypatch, threshold, no_native):
    if not stats_path_active(SCORING):
        pytest.skip('stats path not active in this environment')
    if no_native:
        # Force every chunk through the device/jnp stats kernel, so the
        # stat-carrying forward itself (not just the native fallback that
        # small hybrid chunks normally route to) is pinned to the full
        # engine's results.
        monkeypatch.setenv('PORECHOP_TPU_NO_NATIVE', '1')
    base = _make_reads()
    r_stats = copy.deepcopy(base)
    r_full = copy.deepcopy(base)
    d_stats = _run_middle(r_stats, True, monkeypatch, threshold)
    d_full = _run_middle(r_full, False, monkeypatch, threshold)

    hit_reads = 0
    for a, b in zip(r_stats, r_full):
        assert a.middle_adapter_ranges == b.middle_adapter_ranges, a.name
        assert a.middle_trim_ranges == b.middle_trim_ranges, a.name
        assert a.middle_hit_str == b.middle_hit_str, a.name
        hit_reads += bool(a.middle_adapter_ranges)
    assert d_stats == d_full
    # The fixture must actually exercise the multi-hit paths it claims to.
    if threshold <= 90.0:
        assert hit_reads >= 5
        assert not r_stats[-1].middle_adapter_ranges          # clean read
        assert len(r_stats[0].middle_adapter_ranges) == 2     # double_same
        assert len(r_stats[5].middle_adapter_ranges) == 3     # triple


def test_noisy_hit_threshold_sensitivity(monkeypatch):
    """The 2-mismatch occurrence flips from hit to miss as the threshold
    rises; both paths must flip at the same threshold."""
    if not stats_path_active(SCORING):
        pytest.skip('stats path not active in this environment')
    for threshold in (85.0, 95.0):
        r_stats = _make_reads()
        r_full = _make_reads()
        _run_middle(r_stats, True, monkeypatch, threshold)
        _run_middle(r_full, False, monkeypatch, threshold)
        a, b = r_stats[4], r_full[4]                          # noisy_plus_exact
        assert a.middle_adapter_ranges == b.middle_adapter_ranges
        assert a.middle_hit_str == b.middle_hit_str
