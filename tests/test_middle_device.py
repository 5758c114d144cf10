"""Device-resident middle-pass replay (ops/middle.py): parity with the
host replay and the zero-repeat-h2d contract (VERDICT r3 task 3)."""

import numpy as np
import pytest

from porechop_tpu.ops import dispatch, middle, spec


def _mk_reads(rng, n, lo=200, hi=900):
    reads = []
    for _ in range(n):
        reads.append(rng.integers(0, 4, int(rng.integers(lo, hi))).astype(np.int8))
    return reads


def test_replay_round_matches_alignjobs():
    """One runner round == one AlignJobs launch over the same masked reads
    (same engines underneath; this pins the mask-application and padding)."""
    rng = np.random.default_rng(3)
    adapters = [rng.integers(0, 4, 28).astype(np.int8),
                rng.integers(0, 4, 22).astype(np.int8)]
    reads = _mk_reads(rng, 7)
    for r in reads[:4]:                      # embed hits
        a = adapters[0]
        pos = int(rng.integers(0, len(r) - len(a)))
        r[pos:pos + len(a)] = a
    runner = middle.ReplayRunner(reads, adapters)

    # Round 1: no masks, every lane aligns adapter 0.
    a_idx = np.zeros(len(reads), np.int32)
    res = runner.round(a_idx, np.zeros(len(reads), np.int32),
                       np.zeros(len(reads), np.int32))
    want = dispatch.AlignJobs(
        reads, adapters,
        np.column_stack([np.arange(len(reads)), np.zeros(len(reads), int)])
    ).run()
    for f in ('read_start', 'read_end_excl', 'matches', 'full_len'):
        assert np.array_equal(res[f], want[f]), f
    assert np.allclose(res['full_pct'], want['full_pct'], equal_nan=True)

    # Round 2: mask each lane's round-1 hit region on device; the host
    # twin masks the same region in numpy.
    ms = np.where(res['read_start'] >= 0, res['read_start'], 0).astype(np.int32)
    me = res['read_end_excl'].astype(np.int32)
    res2 = runner.round(a_idx, ms, me)
    masked = [r.copy() for r in reads]
    for k in range(len(reads)):
        masked[k][ms[k]:me[k]] = 4
    want2 = dispatch.AlignJobs(
        masked, adapters,
        np.column_stack([np.arange(len(reads)), np.zeros(len(reads), int)])
    ).run()
    for f in ('read_start', 'read_end_excl', 'matches', 'full_len'):
        assert np.array_equal(res2[f], want2[f]), f


def test_replay_transfer_counting():
    """Read data uploads once; every subsequent round ships only O(B)
    scalars (the zero-repeat-h2d contract)."""
    rng = np.random.default_rng(5)
    adapters = [rng.integers(0, 4, 24).astype(np.int8)]
    reads = _mk_reads(rng, 5, 300, 600)
    runner = middle.ReplayRunner(reads, adapters)
    read_bytes_after_init = runner.h2d_read_bytes
    assert read_bytes_after_init >= sum(len(r) for r in reads)
    a_idx = np.zeros(len(reads), np.int32)
    z = np.zeros(len(reads), np.int32)
    for _ in range(4):
        runner.round(a_idx, z, z)
    # No further read-scale uploads; per-round traffic is 3 int32 per lane.
    assert runner.h2d_read_bytes == read_bytes_after_init
    assert runner.h2d_round_bytes == 4 * 3 * 4 * runner.Bp
    assert runner.h2d_round_bytes < read_bytes_after_init


def test_should_use_device_rules(monkeypatch):
    monkeypatch.setenv('PORECHOP_TPU_MIDDLE_DEVICE', '1')
    assert middle.should_use_device(1, 100, 24)
    monkeypatch.setenv('PORECHOP_TPU_MIDDLE_DEVICE', '0')
    assert not middle.should_use_device(10 ** 6, 10 ** 5, 256)
    monkeypatch.delenv('PORECHOP_TPU_MIDDLE_DEVICE')
    # auto: tiny replay set routes host, huge one routes device.
    assert not middle.should_use_device(4, 500, 24)
    assert middle.should_use_device(4096, 10000, 32)
