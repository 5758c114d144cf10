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
