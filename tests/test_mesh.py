"""Data-parallel mesh path: the production engine sharded over the 8
virtual CPU devices must match the executable spec exactly."""

import numpy as np

import jax

from porechop_tpu.ops import engine_v2, spec
from porechop_tpu.parallel import mesh as pmesh

CODES = 'ACGTN'


def test_align_batch_sharded_matches_spec(monkeypatch):
    assert len(jax.devices()) == 8
    monkeypatch.setenv('PORECHOP_TPU_MESH', '1')
    monkeypatch.setattr(pmesh, '_AUTO_MESH_SET', False)
    monkeypatch.setattr(pmesh, '_AUTO_MESH', None)

    rng = np.random.default_rng(17)
    B, L, A = 64, 120, 24
    reads = rng.integers(0, 5, (B, L)).astype(np.int8)
    rl = rng.integers(1, L + 1, B).astype(np.int32)
    adps = rng.integers(0, 5, (B, A)).astype(np.int8)
    al = rng.integers(1, A + 1, B).astype(np.int32)
    for k in range(0, B, 3):
        if rl[k] > al[k]:
            pos = int(rng.integers(0, rl[k] - al[k]))
            reads[k, pos:pos + al[k]] = adps[k, :al[k]]

    assert pmesh.auto_mesh() is not None
    out = engine_v2.align_batch(reads, rl, adps, al)

    for k in range(B):
        want = spec.align_stats(
            ''.join(CODES[c] for c in reads[k, :rl[k]]),
            ''.join(CODES[c] for c in adps[k, :al[k]]))
        got = {f: int(out[f][k]) for f in
               ('read_start', 'read_end', 'adapter_start', 'adapter_end',
                'raw_score', 'matches', 'aligned_len', 'full_len')}
        exp = {f: getattr(want, f) for f in got}
        assert got == exp, (k, got, exp)


def test_dispatch_gather_sharded_matches_spec(monkeypatch):
    """The dispatcher's dedup'd-table fast path (plain + group-max) under a
    forced 8-device mesh: dense fallback must NOT kick in (VERDICT r1 item
    3), and results must equal the executable spec / host fold."""
    monkeypatch.setenv('PORECHOP_TPU_MESH', '1')
    monkeypatch.setenv('PORECHOP_TPU_NO_NATIVE', '1')   # keep jobs on device
    monkeypatch.setattr(pmesh, '_AUTO_MESH_SET', False)
    monkeypatch.setattr(pmesh, '_AUTO_MESH', None)
    from porechop_tpu.ops.dispatch import AlignJobs

    rng = np.random.default_rng(23)
    windows = [rng.integers(0, 5, rng.integers(40, 120)).astype(np.int8)
               for _ in range(24)]
    adapters = [rng.integers(0, 5, rng.integers(8, 26)).astype(np.int8)
                for _ in range(5)]
    pairs = np.array([(w, a) for w in range(len(windows))
                      for a in range(len(adapters))], dtype=np.int64)

    res = AlignJobs(windows, adapters, pairs).run()
    for k in range(0, len(pairs), 17):
        w, a = pairs[k]
        want = spec.align_stats(''.join(CODES[c] for c in windows[w]),
                                ''.join(CODES[c] for c in adapters[a]))
        assert int(res['read_start'][k]) == want.read_start, k
        assert int(res['matches'][k]) == want.matches, k
        assert int(res['full_len'][k]) == want.full_len, k

    # Group-max (detection) path: group by adapter.
    gids = pairs[:, 1]
    gm = AlignJobs(windows, adapters, pairs).run_group_max(
        gids, len(adapters))
    for a in range(len(adapters)):
        best = (0, 1)
        for w in range(len(windows)):
            s = spec.align_stats(''.join(CODES[c] for c in windows[w]),
                                 ''.join(CODES[c] for c in adapters[a]))
            if s.full_len > 0 and s.matches * best[1] > best[0] * s.full_len:
                best = (s.matches, s.full_len)
        assert (int(gm['matches'][a]), int(gm['full_len'][a])) == best, a


def test_detection_step_collective():
    """The detection phase's cross-shard per-set max reduction."""
    mesh = pmesh.make_mesh()
    rng = np.random.default_rng(3)
    B, L, A = 32, 64, 16
    reads = rng.integers(0, 4, (B, L)).astype(np.int8)
    rl = np.full(B, L, np.int32)
    adps = rng.integers(0, 4, (B, A)).astype(np.int8)
    al = np.full(B, A, np.int32)
    set_ids = (np.arange(B) % 4).astype(np.int32)
    seg, best_m, best_l = pmesh.detection_step(
        mesh, reads, rl, adps, al, set_ids, 4)
    assert seg.shape == (4,)
    # Cross-check one set against the host spec.
    import math
    codes = 'ACGTN'
    for s in range(4):
        best = -1.0
        for k in np.nonzero(set_ids == s)[0]:
            w = spec.align_stats(''.join(codes[c] for c in reads[k]),
                                 ''.join(codes[c] for c in adps[k]))
            best = max(best, w.matches / max(w.full_len, 1))
        assert math.isclose(float(seg[s]), best, rel_tol=1e-6), (s, seg[s], best)
