"""Exactness tests for the batched JAX engine against the host spec engine
(and transitively the SeqAn oracle, which pins ops/spec.py)."""

import random

import numpy as np
import pytest

from porechop_tpu.ops import spec
from porechop_tpu.ops import engine_jax


def rand_seq(rng, n, alpha='ACGTN'):
    return ''.join(rng.choice(alpha) for _ in range(n))


def run_batch(pairs, scoring=(3, -6, -5, -2)):
    """pairs: list of (read, adapter) strings with arbitrary lengths."""
    B = len(pairs)
    L = max(len(r) for r, _ in pairs)
    A = max(len(a) for _, a in pairs)
    reads = np.full((B, L), 4, dtype=np.int8)
    adapters = np.full((B, A), 4, dtype=np.int8)
    rlens = np.zeros(B, dtype=np.int32)
    alens = np.zeros(B, dtype=np.int32)
    for k, (r, a) in enumerate(pairs):
        reads[k, :len(r)] = spec.encode(r)
        adapters[k, :len(a)] = spec.encode(a)
        rlens[k] = len(r)
        alens[k] = len(a)
    return engine_jax.align_batch(reads, rlens, adapters, alens, scoring)


def check_pairs(pairs, scoring=(3, -6, -5, -2)):
    out = run_batch(pairs, scoring)
    for k, (r, a) in enumerate(pairs):
        want = spec.align_stats(r, a, scoring)
        got = {f: int(out[f][k]) for f in
               ('read_start', 'read_end', 'adapter_start', 'adapter_end',
                'raw_score', 'matches', 'aligned_len', 'full_len')}
        want_d = dict(read_start=want.read_start, read_end=want.read_end,
                      adapter_start=want.adapter_start,
                      adapter_end=want.adapter_end, raw_score=want.raw_score,
                      matches=want.matches, aligned_len=want.aligned_len,
                      full_len=want.full_len)
        if want.read_start == -1:
            assert got['read_start'] == -1, (k, r, a, got)
            continue
        assert got == want_d, (
            f'lane {k}\n read={r}\n adapter={a}\n want={want_d}\n got={got}')


def test_batch_basic():
    check_pairs([
        ('ACGTACGTACGTTTTTGGGG', 'ACGTACGT'),
        ('TTTTTGGGGACGTACGAACG', 'ACGTACGT'),
        ('AAAA', 'GGGG'),
        ('ACGT', 'ACGT'),
        ('A', 'A'),
        ('A', 'C'),
        ('ACGTN', 'NNGT'),
        ('N' * 10, 'N' * 4),
    ])


def test_batch_mixed_lengths():
    rng = random.Random(3)
    pairs = [(rand_seq(rng, rng.randint(1, 150)), rand_seq(rng, rng.randint(1, 40)))
             for _ in range(64)]
    check_pairs(pairs)


def test_batch_tie_heavy():
    rng = random.Random(5)
    pairs = []
    for _ in range(96):
        alpha = rng.choice(['A', 'AC', 'ACG', 'AT'])
        pairs.append((''.join(rng.choice(alpha) for _ in range(rng.randint(1, 60))),
                      ''.join(rng.choice(alpha) for _ in range(rng.randint(1, 20)))))
    check_pairs(pairs)


def test_batch_planted_adapters():
    rng = random.Random(8)
    pairs = []
    for _ in range(64):
        adapter = rand_seq(rng, rng.randint(10, 40), 'ACGT')
        read = (rand_seq(rng, rng.randint(0, 120), 'ACGT') + adapter
                + rand_seq(rng, rng.randint(0, 120), 'ACGT'))
        pairs.append((read, adapter))
    check_pairs(pairs)


def test_batch_masked_and_other_scheme():
    rng = random.Random(9)
    pairs = []
    for _ in range(32):
        adapter = rand_seq(rng, 20, 'ACGT')
        read = (rand_seq(rng, 40, 'ACGT') + '-' * rng.randint(3, 20)
                + adapter + rand_seq(rng, 40, 'ACGT'))
        pairs.append((read, adapter))
    check_pairs(pairs)
    check_pairs(pairs, scoring=(5, -4, -10, -1))


def test_long_read_middle():
    rng = random.Random(10)
    adapter = rand_seq(rng, 25, 'ACGT')
    read = (rand_seq(rng, 3000, 'ACGT') + adapter + rand_seq(rng, 3000, 'ACGT'))
    check_pairs([(read, adapter), (rand_seq(rng, 6025, 'ACGT'), adapter)])


def test_unsupported_scheme_rejected():
    with pytest.raises(AssertionError):
        run_batch([('ACGT', 'AC')], scoring=(3, -6, -2, -2))
