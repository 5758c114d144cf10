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
