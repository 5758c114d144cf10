"""Device-resident middle-pass replay (SURVEY §7.3 step 3).

The middle phase's reference semantics are an iterative mask-and-retry
loop per read (reference porechop/nanopore_read.py:221-243): align each
adapter against the read, and while the full-adapter %id clears the
threshold, mask the hit with '-' (Dna5 'N') and re-align the SAME adapter.
Round 0 runs as one dense launch for all reads (pipeline/phases.py); reads
with any hit then replay the reference's exact per-read order in global
rounds.

Through round 3 every replay round rebuilt a fresh AlignJobs from the
host-side masked arrays — re-shipping read-scale data to the device every
round.  This module instead keeps the masked code tensor RESIDENT on the
device across rounds: the reads of the replay set upload once, and each
round ships only O(B) scalars down — (adapter row, mask_start, mask_end,
active) per lane — applying the mask with a `where()` on the device tensor
(the donated carry of a jitted round step) before the forward+traceback.
Zero repeat h2d of read data across rounds; `h2d_read_bytes` /
`h2d_round_bytes` count every upload so tests can assert it.

Routing: phases.find_adapters_in_read_middles uses this runner when the
first replay round's padded cells clear the dispatcher's hybrid threshold
(the same rule that routes any launch to the device), or when
PORECHOP_TPU_MIDDLE_DEVICE=1 forces it; =0 forces the host replay.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from . import _jax_setup

import jax
import jax.numpy as jnp

_jax_setup.configure()

from . import dispatch, engine_v2


def replay_mode() -> str:
    """'device', 'host', or 'auto' (threshold rule)."""
    v = os.environ.get('PORECHOP_TPU_MIDDLE_DEVICE', '').strip()
    if v == '1':
        return 'device'
    if v == '0':
        return 'host'
    return 'auto'


def should_use_device(n_lanes: int, max_len: int, max_alen: int) -> bool:
    """The dispatcher's hybrid rule applied to one replay round: device
    when a round's padded cells clear the break-even (ops/dispatch.py
    _HYBRID_CELLS), i.e. exactly when round 0 itself would have routed its
    launches to the device."""
    mode = replay_mode()
    if mode != 'auto':
        return mode == 'device'
    if not dispatch._use_jax():
        return False
    lb = dispatch._bucket_len(max_len)
    amax = dispatch._bucket_adapter_len(max_alen)
    cells = dispatch._bucket_lanes(n_lanes) * (lb + 1) * amax
    return cells >= dispatch._HYBRID_CELLS


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11),
                   donate_argnums=(0,))
def _round_step(masked, rl, amat, alens, a_idx, m_start, m_end,
                match, mismatch, gap_open, gap_ext, mode):
    """One replay round: apply last round's hit masks on device, then
    forward + traceback for every lane against its current adapter row.
    `masked` is donated — the updated tensor is returned as the next
    round's carry, so the read data never leaves the device."""
    B, L = masked.shape
    jcol = jnp.arange(L, dtype=jnp.int32)[None, :]
    hit = (jcol >= m_start[:, None]) & (jcol < m_end[:, None])
    masked = jnp.where(hit, jnp.int8(4), masked)
    adps = jnp.take(amat, a_idx, axis=0)
    al = jnp.take(alens, a_idx)
    fwd = engine_v2._forward_mode(masked, rl, adps, al, match, mismatch,
                                  gap_open, gap_ext, mode)
    bits, best_sc, cell_i, cell_j, vflag, hflag = fwd
    walk = engine_v2._traceback_impl(bits, cell_i, cell_j, vflag, hflag)
    return masked, walk, best_sc, cell_i, cell_j


class ReplayRunner:
    """Holds the device-resident masked read tensor for one replay set.

    reads: list of np.int8 code arrays (round-0 first hit already masked).
    adapters: list of np.int8 code arrays (the phase's adapter order).
    """

    def __init__(self, reads, adapters, scoring=(3, -6, -5, -2)):
        assert engine_v2.supports(scoring)
        self.scoring = tuple(int(x) for x in scoring)
        B = len(reads)
        self.B = B
        self.Bp = dispatch._bucket_lanes(B)
        max_len = max((len(r) for r in reads), default=1)
        self.L = dispatch._bucket_len(max(max_len, 1))
        max_alen = max((len(a) for a in adapters), default=1)
        self.A = dispatch._bucket_adapter_len(max(max_alen, 1))
        self.h2d_read_bytes = 0
        self.h2d_round_bytes = 0

        mat = np.full((self.Bp, self.L), 4, np.int8)
        rl = np.ones(self.Bp, np.int32)
        for k, r in enumerate(reads):
            mat[k, :len(r)] = r
            rl[k] = max(len(r), 1)
        amat = np.full((len(adapters) + 1, self.A), 4, np.int8)
        alen = np.ones(len(adapters) + 1, np.int32)
        for k, a in enumerate(adapters):
            amat[k, :len(a)] = a
            alen[k] = max(len(a), 1)
        self._dummy_row = len(adapters)
        self.rl_host = rl
        self.al_host = alen
        # The one and only read-data upload; rounds carry it on device.
        self.masked_d = jnp.asarray(mat)
        self.h2d_read_bytes += mat.nbytes
        self.rl_d = jnp.asarray(rl)
        self.amat_d = jnp.asarray(amat)
        self.alen_d = jnp.asarray(alen)
        self.h2d_read_bytes += rl.nbytes + amat.nbytes + alen.nbytes
        self._mode = engine_v2._pallas_mode(self.Bp, self.L, self.A)

    def round(self, a_idx, m_start, m_end):
        """a_idx: (B,) adapter row per lane (use dummy_row() for finished
        lanes); m_start/m_end: the hit region each lane's PREVIOUS round
        found (0/0 when none — first round, or the lane advanced to the
        next adapter without a hit).  Returns the finish_v2 dict plus
        'full_pct' for the threshold test."""
        Bp = self.Bp
        ai = np.full(Bp, self._dummy_row, np.int32)
        ai[:self.B] = a_idx
        ms = np.zeros(Bp, np.int32)
        me = np.zeros(Bp, np.int32)
        ms[:self.B] = m_start
        me[:self.B] = m_end
        self.h2d_round_bytes += ai.nbytes + ms.nbytes + me.nbytes
        m, mm, go, ge = self.scoring
        self.masked_d, walk, best_sc, cell_i, cell_j = _round_step(
            self.masked_d, self.rl_d, self.amat_d, self.alen_d,
            jnp.asarray(ai), jnp.asarray(ms), jnp.asarray(me),
            m, mm, go, ge, self._mode)
        res = engine_v2.finish_v2(walk, best_sc, cell_i, cell_j,
                                  self.rl_host, self.al_host[ai])
        failed = res['read_start'] == -1
        full_pct = dispatch.seqan_pct_vec(res['matches'], res['full_len'])
        res['full_pct'] = np.where(failed, 0.0, full_pct)
        res['read_end_excl'] = np.where(failed, 0, res['read_end'] + 1)
        return {k: v[:self.B] for k, v in res.items()}

    def dummy_row(self) -> int:
        return self._dummy_row
