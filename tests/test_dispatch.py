"""Dispatch-layer parity: the batch planner must produce identical results
whichever engine a chunk lands on (device gather path, native host engine,
or the executable spec), across bucketing, lane padding, and hybrid routing.

Reference semantics: porechop/cpp_function_wrappers.py:42-53 returns the
7-tuple per (read, adapter) job; the dispatcher reproduces it for arbitrary
job mixes in dense batches.
"""

import os

import numpy as np
import pytest

from porechop_tpu.ops import dispatch, spec

CODES = 'ACGTN'


def _random_jobs(rng, n_windows=23, n_adapters=7, n_pairs=160,
                 wlen_range=(1, 300), alen_range=(1, 40)):
    windows = [spec.encode(''.join(rng.choice(list('ACGT'),
                                              rng.integers(*wlen_range))))
               for _ in range(n_windows)]
    adapters = [spec.encode(''.join(rng.choice(list('ACGT'),
                                               rng.integers(*alen_range))))
                for _ in range(n_adapters)]
    pairs = np.column_stack([rng.integers(0, n_windows, n_pairs),
                             rng.integers(0, n_adapters, n_pairs)])
    return windows, adapters, pairs


def _spec_expected(windows, adapters, pairs):
    rows = []
    for wi, ai in pairs:
        w = ''.join(CODES[c] for c in windows[wi])
        a = ''.join(CODES[c] for c in adapters[ai])
        r = spec.align_stats(w, a)
        rows.append((r.read_start, r.read_end, r.adapter_start,
                     r.adapter_end, r.raw_score, r.matches, r.aligned_len,
                     r.full_len))
    return np.array(rows, dtype=np.int64)


FIELDS = ('read_start', 'read_end', 'adapter_start', 'adapter_end',
          'raw_score', 'matches', 'aligned_len', 'full_len')


def _check(res, want):
    got = np.column_stack([res[f] for f in FIELDS])
    bad = np.nonzero(~np.all(got == want, axis=1))[0]
    assert bad.size == 0, (bad[:5], got[bad[:5]], want[bad[:5]])


def test_gather_path_matches_spec(monkeypatch):
    """Pure device path (hybrid routing off): every chunk goes through
    engine_v2.align_batch_gather with dedup'd device tables."""
    monkeypatch.setattr(dispatch, '_HYBRID_CELLS', 0)
    monkeypatch.delenv('PORECHOP_TPU_FORCE_HOST', raising=False)
    rng = np.random.default_rng(11)
    windows, adapters, pairs = _random_jobs(rng)
    want = _spec_expected(windows, adapters, pairs)
    res = dispatch.AlignJobs(windows, adapters, pairs).run()
    _check(res, want)


def test_hybrid_routing_matches_spec(monkeypatch):
    """Default hybrid routing (small chunks -> native engine) must be
    indistinguishable from the device path."""
    monkeypatch.delenv('PORECHOP_TPU_FORCE_HOST', raising=False)
    rng = np.random.default_rng(12)
    windows, adapters, pairs = _random_jobs(rng, n_pairs=97)
    want = _spec_expected(windows, adapters, pairs)
    res = dispatch.AlignJobs(windows, adapters, pairs).run()
    _check(res, want)


def test_chunked_launches_match_spec(monkeypatch):
    """Tiny cell budget forces many chunks per bucket; the per-bucket device
    tables must still map every lane to the right window/adapter rows."""
    monkeypatch.setattr(dispatch, '_HYBRID_CELLS', 0)
    monkeypatch.setattr(dispatch, '_CELL_BUDGET', 200_000)
    monkeypatch.delenv('PORECHOP_TPU_FORCE_HOST', raising=False)
    rng = np.random.default_rng(13)
    windows, adapters, pairs = _random_jobs(rng, n_pairs=300,
                                            wlen_range=(100, 160))
    want = _spec_expected(windows, adapters, pairs)
    res = dispatch.AlignJobs(windows, adapters, pairs).run()
    _check(res, want)


def test_fused_single_device_gather_matches_spec(monkeypatch):
    """With the mesh disabled, the fused gather->forward->traceback single
    launch (the production single-chip path) must match the spec, including
    the nibble pack/unpack round trip."""
    from porechop_tpu.parallel import mesh as pmesh
    monkeypatch.setattr(pmesh, '_AUTO_MESH', None)
    monkeypatch.setattr(pmesh, '_AUTO_MESH_SET', True)
    monkeypatch.setattr(dispatch, '_HYBRID_CELLS', 0)
    monkeypatch.delenv('PORECHOP_TPU_FORCE_HOST', raising=False)
    rng = np.random.default_rng(15)
    windows, adapters, pairs = _random_jobs(rng, n_pairs=130,
                                            wlen_range=(1, 151))
    want = _spec_expected(windows, adapters, pairs)
    res = dispatch.AlignJobs(windows, adapters, pairs).run()
    _check(res, want)


def _group_expected(windows, adapters, pairs, gids, n_groups):
    """Host reference for run_group_max: per group, max full identity by
    exact fraction; (0, 1) baseline for empty/failed groups."""
    want = _spec_expected(windows, adapters, pairs)
    acc = np.zeros((n_groups, 2), dtype=np.int64)
    acc[:, 1] = 1
    for k in range(len(pairs)):
        m, ln = want[k, 5], want[k, 7]
        if want[k, 0] == -1 or ln <= 0:
            continue
        g = gids[k]
        if m * acc[g, 1] > acc[g, 0] * ln:
            acc[g] = (m, ln)
    return acc


@pytest.mark.parametrize('device_path', [False, True])
def test_run_group_max_matches_spec(monkeypatch, device_path):
    """The detection phase's group reduction must produce identical best
    identities whichever engine folds each lane (device segment-max vs
    host fold of native results)."""
    if device_path:
        from porechop_tpu.parallel import mesh as pmesh
        monkeypatch.setattr(pmesh, '_AUTO_MESH', None)
        monkeypatch.setattr(pmesh, '_AUTO_MESH_SET', True)
        monkeypatch.setattr(dispatch, '_HYBRID_CELLS', 0)
    monkeypatch.delenv('PORECHOP_TPU_FORCE_HOST', raising=False)
    rng = np.random.default_rng(16)
    windows, adapters, pairs = _random_jobs(rng, n_pairs=240,
                                            wlen_range=(1, 151))
    n_groups = 17
    gids = rng.integers(0, n_groups, len(pairs))
    res = dispatch.AlignJobs(windows, adapters, pairs).run_group_max(
        gids, n_groups)
    acc = _group_expected(windows, adapters, pairs, gids, n_groups)
    # Identical fractions may come from different (m, l) pairs; the
    # contract is the identity value, compared after seqan rounding.
    want_pct = dispatch.seqan_pct_vec(acc[:, 0], acc[:, 1])
    assert np.allclose(res['full_pct'], want_pct, atol=0), (
        res['full_pct'], want_pct)


def test_work_sharing_matches_spec(monkeypatch):
    """Engine work-sharing (device-bound slices diverted to the native
    queue to balance the two engines' finish times) must be result-
    invisible, and must actually divert under equal rates."""
    monkeypatch.delenv('PORECHOP_TPU_FORCE_HOST', raising=False)
    monkeypatch.setattr(dispatch, '_HYBRID_CELLS', 0)
    monkeypatch.setattr(dispatch.AlignJobs, '_HOST_CELLS_S', 1e9)
    monkeypatch.setattr(dispatch.AlignJobs, '_DEV_CELLS_S', 1e9)
    counted = {'n': 0}
    orig = dispatch.AlignJobs._run_native

    def spy(self, todo, out):
        counted['n'] += len(todo)
        return orig(self, todo, out)

    monkeypatch.setattr(dispatch.AlignJobs, '_run_native', spy)
    rng = np.random.default_rng(31)
    windows, adapters, pairs = _random_jobs(rng, n_pairs=400)
    want = _spec_expected(windows, adapters, pairs)
    res = dispatch.AlignJobs(windows, adapters, pairs).run()
    _check(res, want)
    assert counted['n'] > 0, 'equal rates must divert work to native'


@pytest.mark.parametrize('device_path', [True, False])
def test_run_stats_matches_run(monkeypatch, device_path):
    """run_stats (per-lane stat-carrying launches, no coordinate recovery)
    must return the exact (matches, full_len, full_pct) of the full run —
    the middle phase's round-0 threshold decisions ride on it."""
    monkeypatch.delenv('PORECHOP_TPU_FORCE_HOST', raising=False)
    if device_path:
        monkeypatch.setattr(dispatch, '_HYBRID_CELLS', 0)
    rng = np.random.default_rng(21)
    windows, adapters, pairs = _random_jobs(rng, n_pairs=130)
    # A couple of degenerate jobs: empty window -> failure -> full_pct 0.
    windows[0] = np.zeros(0, dtype=np.int8)
    full = dispatch.AlignJobs(windows, adapters, pairs).run()
    st = dispatch.AlignJobs(windows, adapters, pairs).run_stats()
    deg = np.asarray(pairs)[:, 0] == 0
    assert np.array_equal(st['matches'][~deg], full['matches'][~deg])
    assert np.array_equal(st['full_len'][~deg], full['full_len'][~deg])
    assert np.array_equal(st['full_pct'], full['full_pct'])
    assert (st['full_pct'][deg] == 0.0).all()


def test_degenerate_jobs():
    """Empty windows/adapters resolve host-side as failures (read_start=-1
    -> zeroed percentages, reference nanopore_read.py:481-485)."""
    windows = [spec.encode('ACGTACGT'), spec.encode('')]
    adapters = [spec.encode('ACG'), spec.encode('')]
    pairs = np.array([[0, 0], [1, 0], [0, 1], [1, 1]])
    res = dispatch.AlignJobs(windows, adapters, pairs).run()
    assert res['read_start'][0] != -1
    assert list(res['read_start'][1:]) == [-1, -1, -1]
    assert list(res['full_pct'][1:]) == [0.0, 0.0, 0.0]


@pytest.mark.skipif(os.environ.get('PORECHOP_TPU_NO_NATIVE') == '1',
                    reason='native engine disabled')
def test_native_fallback_equals_device(monkeypatch):
    """FORCE_HOST (native engine for everything) and the pure device path
    agree field-for-field on the same job list."""
    rng = np.random.default_rng(14)
    windows, adapters, pairs = _random_jobs(rng, n_pairs=120)
    monkeypatch.setenv('PORECHOP_TPU_FORCE_HOST', '1')
    host = dispatch.AlignJobs(windows, adapters, pairs).run()
    monkeypatch.delenv('PORECHOP_TPU_FORCE_HOST')
    monkeypatch.setattr(dispatch, '_HYBRID_CELLS', 0)
    dev = dispatch.AlignJobs(windows, adapters, pairs).run()
    for f in FIELDS + ('read_end_excl',):
        assert np.array_equal(host[f], dev[f]), f
    # equal_nan: an empty aligned region yields NaN partial identity on
    # every engine (the reference's C++ divides by zero there too).
    assert np.allclose(host['full_pct'], dev['full_pct'], equal_nan=True)
    assert np.allclose(host['partial_pct'], dev['partial_pct'],
                       equal_nan=True)


def test_native_failure_pushback_rebuilds_tables(monkeypatch):
    """VERDICT r2 #3: when the native engine fails AFTER the rung's device
    tables were built from the device chunks, the pushed-back small chunks
    contain windows/adapters absent from those tables; the dispatcher must
    rebuild (not map them to the dummy row and return wrong alignments)."""
    from porechop_tpu import native as native_mod

    monkeypatch.delenv('PORECHOP_TPU_FORCE_HOST', raising=False)
    # Bucket (150, 24): per_launch = pow2floor(max(32, budget/(151*24))) = 64,
    # so 96 pairs split into a 64-lane device chunk and a 32-lane chunk that
    # routes native (116k cells < hybrid threshold 200k).
    monkeypatch.setattr(dispatch, '_CELL_BUDGET', 151 * 24 * 64)
    monkeypatch.setattr(dispatch, '_HYBRID_CELLS', 200_000)
    # Native engine present for routing purposes, but dies when called.
    monkeypatch.setattr(dispatch.AlignJobs, '_native_available',
                        lambda self: True)
    monkeypatch.setattr(native_mod, 'align_host_batch',
                        lambda *a, **k: None)
    rng = np.random.default_rng(17)
    n = 96
    windows = [spec.encode(''.join(rng.choice(list('ACGT'), 150)))
               for _ in range(n)]
    adapters = [spec.encode(''.join(rng.choice(list('ACGT'),
                                               rng.integers(18, 25))))
                for _ in range(4)]
    # Job k uses window k: the last 32 jobs' windows appear ONLY in the
    # pushed-back chunk, so a stale table maps them to the dummy row.
    pairs = np.column_stack([np.arange(n),
                             rng.integers(0, len(adapters), n)])
    want = _spec_expected(windows, adapters, pairs)
    res = dispatch.AlignJobs(windows, adapters, pairs).run()
    _check(res, want)


def test_merge_respects_post_split_routing(monkeypatch):
    """_merge_adapter_rungs must evaluate device-boundness on post-split
    chunks (ADVICE r3): sub-threshold tail chunks that run() would route
    to the native engine stay behind in their original bucket instead of
    being dragged onto the device by a whole-bucket merge."""
    monkeypatch.setattr(dispatch, '_CELL_BUDGET', 32 * 257 * 64)
    monkeypatch.setattr(dispatch, '_HYBRID_CELLS', 32 * 257 * 24)
    jobs = dispatch.AlignJobs([], [], np.zeros((0, 2)))

    lb = 256
    # Rung 16: 40 jobs -> chunks of 32 (device at 32*257*16 cells? no:
    # 32*257*16 < hybrid) — per_launch = budget // (257*16) = 128 -> one
    # 40-lane chunk, padded to 64 lanes = 64*257*16 cells < hybrid ->
    # ALL native: no device work, so no merge candidate from this rung.
    # Rung 24: 80 jobs, per_launch = 85 -> pow2 64 -> one 64-lane device
    # chunk (64*257*24 >= hybrid) + one 16-lane tail (32*257*24 cells,
    # not < hybrid... adjust): make hybrid strictly between.
    buckets = {
        (lb, 16): np.arange(0, 40),
        (lb, 24): np.arange(100, 180),
        (lb, 64): np.arange(200, 264),
    }
    # Compute what run() would route pre-merge, for reference.
    pre = {}
    for (l, a), idxs in buckets.items():
        pre[(l, a)] = [(len(c), cells >= dispatch._HYBRID_CELLS)
                       for c, cells in jobs._chunk_split(idxs, l, a)]

    merged = {k: v.copy() for k, v in buckets.items()}
    jobs._merge_adapter_rungs(merged, route_small=True)

    # Invariant: every index that pre-split routing sent native must stay
    # in a bucket whose post-merge split still routes it native OR at
    # minimum must not appear in a wider-amax bucket than before unless it
    # was device-bound.
    native_pre = set()
    for (l, a), idxs in buckets.items():
        for c, cells in jobs._chunk_split(idxs, l, a):
            if cells < dispatch._HYBRID_CELLS:
                native_pre.update(int(x) for x in c)
    for (l, a), idxs in merged.items():
        for x in idxs:
            orig_a = next(aa for (ll, aa), ii in buckets.items()
                          if int(x) in set(int(v) for v in ii))
            if int(x) in native_pre and a > orig_a:
                raise AssertionError(
                    f'native-bound job {x} merged from rung {orig_a} '
                    f'into wider device rung {a}')
    # All indices preserved exactly once.
    all_pre = sorted(int(x) for v in buckets.values() for x in v)
    all_post = sorted(int(x) for v in merged.values() for x in v)
    assert all_pre == all_post
