"""Fuzz the two host spec implementations (ops/spec.py) against the compiled
reference engine.  These tests pin the exact alignment semantics every fast
engine must reproduce."""

import math
import random

import pytest

from porechop_tpu.ops import spec

from . import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason='oracle unavailable')


def check_case(read, adapter, scoring=(3, -6, -5, -2)):
    want = oracle.oracle_align(read, adapter, scoring)
    w_ints, w_floats = oracle.parse_csv(want)
    for name, fn in (('traceback', spec.align_traceback),
                     ('stats', spec.align_stats)):
        got = fn(read, adapter, scoring)
        g_ints = [got.read_start, got.read_end, got.adapter_start,
                  got.adapter_end, got.raw_score]
        g_floats = [got.aligned_pct, got.full_pct]
        assert g_ints == w_ints, (
            f'{name}: ints differ\n read={read}\n adapter={adapter}\n'
            f' scoring={scoring}\n want={want}\n got={got.csv()}')
        for gw, gf in zip(w_floats, g_floats):
            if math.isnan(gw):
                assert math.isnan(gf), (name, read, adapter, want, got.csv())
            else:
                assert abs(gw - gf) < 1e-9, (name, read, adapter, want, got.csv())


def mutate(seq, rng, sub=0.1, ind=0.05):
    out = []
    for ch in seq:
        r = rng.random()
        if r < ind / 2:
            continue
        if r < ind:
            out.append(rng.choice('ACGT'))
        if rng.random() < sub:
            out.append(rng.choice('ACGT'))
        else:
            out.append(ch)
    return ''.join(out)


def rand_seq(rng, n):
    return ''.join(rng.choice('ACGTN') for _ in range(n))


def test_basic_cases():
    check_case('ACGTACGTACGTTTTTGGGG', 'ACGTACGT')
    check_case('TTTTTGGGGACGTACGAACG', 'ACGTACGT')
    check_case('AAAA', 'GGGG')
    check_case('ACGT', 'ACGT')
    check_case('A', 'A')
    check_case('A', 'C')
    check_case('ACGTN', 'NNGT')
    check_case('N' * 10, 'N' * 4)           # N==N is a match in Dna5


def test_adapter_longer_than_read():
    rng = random.Random(1)
    for _ in range(50):
        check_case(rand_seq(rng, rng.randint(1, 8)),
                   rand_seq(rng, rng.randint(8, 30)))


def test_fuzz_random_default_scheme():
    rng = random.Random(42)
    for _ in range(300):
        read = rand_seq(rng, rng.randint(1, 120))
        adapter = rand_seq(rng, rng.randint(1, 40))
        check_case(read, adapter)


def test_fuzz_planted_adapter():
    """Realistic cases: adapter (mutated) embedded in a read."""
    rng = random.Random(7)
    for _ in range(300):
        adapter = rand_seq(rng, rng.randint(10, 40)).replace('N', 'A')
        pos = rng.randint(0, 80)
        read = (rand_seq(rng, pos).replace('N', 'C') + mutate(adapter, rng)
                + rand_seq(rng, rng.randint(0, 80)).replace('N', 'G'))
        if not read:
            read = 'A'
        check_case(read, adapter)


def test_fuzz_other_affine_schemes():
    rng = random.Random(9)
    schemes = [(3, -6, -5, -2), (1, -1, -2, -1), (5, -4, -10, -1),
               (2, -3, -4, -3), (3, -6, -1, -4)]  # last: open > ext
    for scoring in schemes:
        for _ in range(80):
            read = rand_seq(rng, rng.randint(1, 60))
            adapter = rand_seq(rng, rng.randint(1, 25))
            check_case(read, adapter, scoring)


def test_fuzz_linear_scheme():
    rng = random.Random(11)
    for scoring in [(3, -6, -2, -2), (1, -1, -1, -1)]:
        for _ in range(80):
            read = rand_seq(rng, rng.randint(1, 60))
            adapter = rand_seq(rng, rng.randint(1, 25))
            check_case(read, adapter, scoring)


def test_fuzz_tie_heavy():
    """Low-entropy alphabets produce many equal-score paths; this stresses
    every tie-breaking rule (diag/gap, V/H, extend/open, scout order,
    _correctTraceValue at the start cell)."""
    rng = random.Random(21)
    for _ in range(400):
        alpha = rng.choice(['A', 'AC', 'ACG', 'AT'])
        read = ''.join(rng.choice(alpha) for _ in range(rng.randint(1, 50)))
        adapter = ''.join(rng.choice(alpha) for _ in range(rng.randint(1, 20)))
        check_case(read, adapter)
    for _ in range(150):
        alpha = 'AC'
        read = ''.join(rng.choice(alpha) for _ in range(rng.randint(1, 40)))
        adapter = ''.join(rng.choice(alpha) for _ in range(rng.randint(1, 15)))
        check_case(read, adapter, (1, -1, -2, -1))


def test_masked_middle_reads():
    """Middle-pass style: masked '-' runs become N in Dna5."""
    rng = random.Random(13)
    for _ in range(60):
        adapter = rand_seq(rng, 20).replace('N', 'T')
        read = (rand_seq(rng, 40) + '-' * rng.randint(5, 30)
                + mutate(adapter, rng) + rand_seq(rng, 40))
        check_case(read, adapter)
