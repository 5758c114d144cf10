"""Fuzz parity: bitmap engine (device traceback AND native C++ walker)
against the executable spec (ops/spec.py) and, where available, the
compiled SeqAn oracle."""

import numpy as np
import pytest

from porechop_tpu.ops import engine_v2, spec

from . import oracle

CODES = 'ACGTN'
FIELDS = ('read_start', 'read_end', 'adapter_start', 'adapter_end',
          'raw_score', 'matches', 'aligned_len', 'full_len')


def _random_cases(seed, n, max_lr=80, max_la=40):
    rng = np.random.default_rng(seed)
    cases = []
    for trial in range(n):
        lr = int(rng.integers(1, max_lr))
        la = int(rng.integers(1, max_la))
        r = rng.integers(0, 5 if trial % 3 else 4, lr).astype(np.int8)
        a = rng.integers(0, 5 if trial % 3 else 4, la).astype(np.int8)
        if trial % 4 == 0 and lr > la:
            pos = int(rng.integers(0, lr - la))
            r[pos:pos + la] = a
            for _ in range(int(rng.integers(0, 3))):
                r[int(rng.integers(0, lr))] = rng.integers(0, 4)
        cases.append((r, a))
    return cases


def _batch(cases):
    L = max(len(r) for r, _ in cases)
    A = max(len(a) for _, a in cases)
    B = len(cases)
    reads = np.full((B, L), 4, np.int8)
    adps = np.full((B, A), 4, np.int8)
    rl = np.zeros(B, np.int32)
    al = np.zeros(B, np.int32)
    for k, (r, a) in enumerate(cases):
        reads[k, :len(r)] = r
        adps[k, :len(a)] = a
        rl[k] = len(r)
        al[k] = len(a)
    return reads, rl, adps, al


def _expected(cases):
    exp = []
    for r, a in cases:
        w = spec.align_stats(''.join(CODES[c] for c in r),
                             ''.join(CODES[c] for c in a))
        exp.append({f: getattr(w, f) for f in FIELDS})
    return exp


def _check(out, cases):
    exp = _expected(cases)
    for k in range(len(cases)):
        got = {f: int(out[f][k]) for f in FIELDS}
        assert got == exp[k], (
            k, ''.join(CODES[c] for c in cases[k][0]),
            ''.join(CODES[c] for c in cases[k][1]), got, exp[k])


def test_v2_device_traceback_matches_spec():
    cases = _random_cases(7, 400)
    out = engine_v2.align_batch(*_batch(cases))
    _check(out, cases)


def test_v2_native_walker_matches_spec():
    cases = _random_cases(11, 400)
    out = engine_v2.align_batch_native(*_batch(cases))
    _check(out, cases)


@pytest.mark.skipif(not oracle.available(), reason='SeqAn oracle unavailable')
def test_v2_matches_oracle_end_windows():
    """Adapter-in-window cases shaped like the end-trim phase."""
    rng = np.random.default_rng(3)
    cases = []
    raws = []
    for _ in range(120):
        lr = int(rng.integers(20, 150))
        la = int(rng.integers(5, 40))
        r = rng.integers(0, 4, lr).astype(np.int8)
        a = rng.integers(0, 4, la).astype(np.int8)
        if lr > la and rng.random() < 0.7:
            pos = int(rng.integers(0, lr - la))
            r[pos:pos + la] = a
            for _ in range(int(rng.integers(0, 4))):
                r[int(rng.integers(0, lr))] = rng.integers(0, 4)
        cases.append((r, a))
        raws.append((''.join(CODES[c] for c in r),
                     ''.join(CODES[c] for c in a)))
    out = engine_v2.align_batch(*_batch(cases))
    for k, (rs, as_) in enumerate(raws):
        ints, floats = oracle.parse_csv(oracle.oracle_align(rs, as_))
        got = [int(out[f][k]) for f in
               ('read_start', 'read_end', 'adapter_start', 'adapter_end',
                'raw_score')]
        assert got == ints, (k, rs, as_, got, ints)
        want_aln = spec.seqan_pct(int(out['matches'][k]),
                                  int(out['aligned_len'][k]))
        want_full = spec.seqan_pct(int(out['matches'][k]),
                                   int(out['full_len'][k]))
        assert abs(want_aln - floats[0]) < 1e-9 or (
            np.isnan(want_aln) and np.isnan(floats[0]))
        assert abs(want_full - floats[1]) < 1e-9 or (
            np.isnan(want_full) and np.isnan(floats[1]))


def test_probe_cache_verdicts(tmp_path):
    """Probe cache-file logic: 'ok' persists forever, 'bad' expires after
    the retry TTL (VERDICT r3 weak #7 — one transient tunnel wedge must not
    permanently demote the Pallas kernel)."""
    import os

    marker = str(tmp_path / 'pallas_probe_test')

    # Absent file -> re-probe.
    assert engine_v2._read_probe_cache(marker) is None

    with open(marker, 'w') as f:
        f.write('ok')
    mtime = os.path.getmtime(marker)
    assert engine_v2._read_probe_cache(marker) is True
    # 'ok' never expires.
    assert engine_v2._read_probe_cache(
        marker, now=mtime + 10 * engine_v2._PROBE_BAD_TTL_S) is True

    with open(marker, 'w') as f:
        f.write('bad')
    mtime = os.path.getmtime(marker)
    # Fresh 'bad' -> skip pallas without re-probing.
    assert engine_v2._read_probe_cache(marker, now=mtime + 1) is False
    # Expired 'bad' -> re-probe.
    assert engine_v2._read_probe_cache(
        marker, now=mtime + engine_v2._PROBE_BAD_TTL_S + 1) is None

    # A probe that merely timed out (device contention on a shared host,
    # not a kernel defect) expires on the much shorter timeout TTL.
    with open(marker, 'w') as f:
        f.write('bad-timeout')
    mtime = os.path.getmtime(marker)
    assert engine_v2._read_probe_cache(marker, now=mtime + 1) is False
    assert engine_v2._read_probe_cache(
        marker, now=mtime + engine_v2._PROBE_TIMEOUT_TTL_S + 1) is None


def test_groupmax_reduce_pairs_come_from_one_lane():
    """The group-max reduction must return a (matches, full_len) pair some
    lane actually produced — under exact-fraction ties the max-matches lane
    (which is also the max-full_len lane), never a cross-lane mixture
    (ADVICE r3: independent per-field maxes could mix lanes)."""
    import jax.numpy as jnp

    # Group 0: exact tie 2/4 == 3/6 -> must elect (3, 6) whole.
    # Group 1: distinct fractions 5/7 > 2/3 -> must elect (5, 7).
    # Group 2: no ok lane -> (0, 0).
    matches = jnp.asarray([2, 3, 5, 2, 9], jnp.int32)
    full_len = jnp.asarray([4, 6, 7, 3, 9], jnp.int32)
    ok = jnp.asarray([True, True, True, True, False])
    g_idx = jnp.asarray([0, 0, 1, 1, 2], jnp.int32)
    gm, gl = engine_v2._groupmax_reduce(matches, full_len, ok, g_idx, 3)
    assert list(np.asarray(gm)) == [3, 5, 0]
    assert list(np.asarray(gl)) == [6, 7, 0]

    # Fuzz: every returned pair must equal one input pair of its group.
    rng = np.random.default_rng(7)
    n_groups = 16
    B = 512
    m = rng.integers(0, 300, B).astype(np.int32)
    l = np.maximum(m, rng.integers(1, 2000, B)).astype(np.int32)
    okv = rng.random(B) < 0.9
    g = rng.integers(0, n_groups, B).astype(np.int32)
    gm, gl = (np.asarray(x) for x in engine_v2._groupmax_reduce(
        jnp.asarray(m), jnp.asarray(l), jnp.asarray(okv), jnp.asarray(g),
        n_groups))
    for gi in range(n_groups):
        lanes = [(int(m[k]), int(l[k])) for k in range(B)
                 if okv[k] and g[k] == gi]
        if not lanes:
            assert (gm[gi], gl[gi]) == (0, 0)
            continue
        assert (int(gm[gi]), int(gl[gi])) in lanes, gi
        # And it is the fraction-max (exact integer comparison).
        for mm, ll in lanes:
            assert int(gm[gi]) * ll >= mm * int(gl[gi]), (gi, mm, ll)
