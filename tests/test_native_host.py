"""Native C++ host engine vs the executable spec (and the SeqAn oracle).

The native engine implements the affine (Gotoh) profile for ANY
gap_open != gap_extend — including open > ext, which the vectorized scan
engines cannot handle — so both regimes are fuzzed here.
"""

import numpy as np
import pytest

from porechop_tpu import native
from porechop_tpu.ops import spec

from . import oracle

CODES = 'ACGTN'
FIELDS = ('read_start', 'read_end', 'adapter_start', 'adapter_end',
          'raw_score', 'matches', 'aligned_len', 'full_len')


def _cases(seed, n):
    rng = np.random.default_rng(seed)
    cases = []
    for trial in range(n):
        lr = int(rng.integers(1, 100))
        la = int(rng.integers(1, 40))
        r = rng.integers(0, 5 if trial % 3 else 4, lr).astype(np.int8)
        a = rng.integers(0, 5 if trial % 3 else 4, la).astype(np.int8)
        if trial % 4 == 0 and lr > la:
            pos = int(rng.integers(0, lr - la))
            r[pos:pos + la] = a
            for _ in range(int(rng.integers(0, 3))):
                r[int(rng.integers(0, lr))] = rng.integers(0, 4)
        cases.append((r, a))
    return cases


@pytest.mark.parametrize('scoring', [(3, -6, -5, -2), (2, -4, -3, -1),
                                     (3, -6, -1, -3)])
def test_native_matches_spec(scoring):
    cases = _cases(sum(abs(s) for s in scoring), 250)
    windows = [r for r, _ in cases]
    adapters = [a for _, a in cases]
    pairs = np.column_stack([np.arange(len(cases)), np.arange(len(cases))])
    res = native.align_host_batch(windows, adapters, pairs, scoring)
    assert res is not None, 'native engine unavailable'
    for k, (r, a) in enumerate(cases):
        want = spec.align_stats(''.join(CODES[c] for c in r),
                                ''.join(CODES[c] for c in a), scoring)
        got = {f: int(res[k, c]) for c, f in enumerate(FIELDS)}
        exp = {f: getattr(want, f) for f in FIELDS}
        assert got == exp, (k, scoring, got, exp)


@pytest.mark.skipif(not oracle.available(), reason='SeqAn oracle unavailable')
def test_native_matches_oracle():
    cases = _cases(77, 60)
    windows = [r for r, _ in cases]
    adapters = [a for _, a in cases]
    pairs = np.column_stack([np.arange(len(cases)), np.arange(len(cases))])
    res = native.align_host_batch(windows, adapters, pairs, (3, -6, -5, -2))
    for k, (r, a) in enumerate(cases):
        rs = ''.join(CODES[c] for c in r)
        as_ = ''.join(CODES[c] for c in a)
        ints, _ = oracle.parse_csv(oracle.oracle_align(rs, as_))
        got = [int(res[k, c]) for c in range(5)]
        assert got == ints, (k, rs, as_, got, ints)


def test_native_linear_scheme_returns_none():
    res = native.align_host_batch([np.zeros(4, np.int8)],
                                  [np.zeros(2, np.int8)],
                                  np.array([[0, 0]]), (3, -6, -2, -2))
    assert res is None
