"""Batched TPU-native alignment engine (pure jax.numpy + lax).

Production role: the detection group-max fallback — wherever the Pallas
stat-carrying kernel is unavailable (CPU backends, probe-failed chips),
ops/engine_v2._groupmax_stats_fwd runs this core + stats_device to get
per-lane (matches, full_len) with no trace-bits materialization and no
traceback walk.  PORECHOP_TPU_ENGINE=v1 also selects it for full
coordinate-carrying alignment (a second opinion on the bitmap engine).

Implements the forward stat-carrying formulation of ops/spec.py as a single
jitted program:

* the DP is scanned over the ADAPTER axis (the short one, <= ~110 rows), so
  the sequential depth is tiny;
* every step is vectorized over (batch, read_length) on the VPU;
* the in-row horizontal-gap recurrence is solved with an associative
  cumulative-max (log2(L) passes) instead of a sequential sweep, valid for
  SeqAn-style affine schemes with gap_open < gap_extend (the default
  3,-6,-5,-2; other schemes fall back to the host engines);
* variable read and adapter lengths are handled with per-lane masking — one
  compiled program serves every (read_len, adapter_len) combination within a
  padded (L, A) bucket, so XLA compiles O(#buckets) programs, not O(#shapes).

Exactness: integer arithmetic end to end; reproduces the reference's
coordinates and match counts bit for bit (cross-checked against ops/spec.py
and the SeqAn oracle in tests/test_engine_jax.py).

Reference behaviour being reproduced: porechop/src/adapter_align.cpp:11-31
plus the SeqAn Gotoh kernel (see ops/spec.py for the full citation list).
"""

from __future__ import annotations

import functools

import numpy as np

from . import _jax_setup

import jax
import jax.numpy as jnp
from jax import lax

_jax_setup.configure()

from .spec import NEG, BIG, AlignResult

# Stats channel indices (match ops/spec.py).
S_COLS, S_MATCH, S_FRC, S_FAC, S_LRC, S_LAC, S_RA, S_AR = range(8)
N_STATS = 8


def _cummax_with_argmax(f, k):
    """Running (max, argmax-with-smallest-index-tiebreak) along axis 1.

    combine((f1,k1),(f2,k2)) keeps the strictly larger f; ties keep the
    SMALLER index, which encodes SeqAn's preference for the longest gap run
    (extension beats opening on equal scores).
    """
    def combine(a, b):
        fa, ka = a
        fb, kb = b
        take_b = (fb > fa) | ((fb == fa) & (kb < ka))
        return jnp.where(take_b, fb, fa), jnp.where(take_b, kb, ka)

    # Log-shift passes instead of lax.associative_scan: equivalent result,
    # far smaller HLO (associative_scan's recursion at non-power-of-two
    # lengths compiles for minutes at L ~ 10k).
    L1 = f.shape[1]
    jcol = jnp.arange(L1, dtype=f.dtype)[None, :]
    n_pass = max(1, (L1 - 1).bit_length())
    for p in range(n_pass):
        sh = 1 << p
        fr = jnp.where(jcol < sh, NEG, jnp.roll(f, sh, axis=1))
        kr = jnp.where(jcol < sh, 0, jnp.roll(k, sh, axis=1))
        f, k = combine((f, k), (fr, kr))
    return f, k


def _gather_cols(st, idx):
    """Gather stats columns: st (B, S, L1), idx (B, L1) -> (B, S, L1)."""
    return jnp.take_along_axis(st, idx[:, None, :], axis=2)


def _gather_one(arr, idx):
    """arr (B, L1) or (B, S, L1), idx (B,) -> (B,) or (B, S)."""
    if arr.ndim == 2:
        return jnp.take_along_axis(arr, idx[:, None], axis=1)[:, 0]
    return jnp.take_along_axis(arr, idx[:, None, None], axis=2)[:, :, 0]


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _align_core(reads, read_lens, adapters, adapter_lens,
                match, mismatch, gap_open, gap_ext):
    """Batched DP.  reads (B, L) int8, adapters (B, A) int8.

    Returns (best_score (B,), best_stats (B, 8), cell_i (B,), cell_j (B,)),
    all int32.  Requires gap_open < gap_ext (checked by the caller).
    """
    B, L = reads.shape
    A = adapters.shape[1]
    L1 = L + 1
    dtype = jnp.int32

    reads = reads.astype(dtype)                       # (B, L)
    read_lens = read_lens.astype(dtype)
    adapter_lens = adapter_lens.astype(dtype)

    j_idx = jnp.arange(L1, dtype=dtype)[None, :]      # (1, L1)
    jcols = jnp.broadcast_to(j_idx, (B, L1))

    # Initial carries derive from read_lens (x*0 terms) so that under
    # shard_map they carry the same varying-axis type as the loop outputs
    # (jax >= 0.9 rejects unvarying-in / varying-out scan carries) — the
    # group-max fallback runs this core inside the sharded launches.
    zb = read_lens * 0                                # (B,) zeros, varying
    zb2 = zb[:, None]

    # ---- row 0 boundary: M(0,j) = 0, path = j horizontal columns ----
    m_sc = jnp.zeros((B, L1), dtype) + zb2
    m_st = jnp.zeros((B, N_STATS, L1), dtype) + zb2[:, None]
    m_st = m_st.at[:, S_COLS].set(jcols)
    m_st = m_st.at[:, S_FRC].set(jnp.where(jcols > 0, 0, BIG))
    m_st = m_st.at[:, S_FAC].set(BIG)
    m_st = m_st.at[:, S_LRC].set(jcols - 1)
    m_st = m_st.at[:, S_LAC].set(-1)

    v_sc = jnp.full((B, L1), NEG, dtype) + zb2
    v_st = jnp.zeros((B, N_STATS, L1), dtype) + zb2[:, None]
    h_sc = jnp.full((B, L1), NEG, dtype) + zb2
    h_st = jnp.zeros((B, N_STATS, L1), dtype) + zb2[:, None]

    # ---- final-column (j = read_len) candidate from row 0 ----
    col_best_sc = zb                                       # M(0, len) = 0
    col_best_st = _gather_one(m_st, read_lens)             # (B, 8)
    col_best_i = zb

    def choose_stats(m_score, v_score, v_stats, h_score, h_stats, m_stats):
        """_correctTraceValue start-cell rule: V==M -> V stats,
        elif H==M -> H stats, else M stats.  Shapes (B,), (B,8)."""
        use_v = v_score == m_score
        use_h = (~use_v) & (h_score == m_score)
        st = jnp.where(use_v[:, None], v_stats,
                       jnp.where(use_h[:, None], h_stats, m_stats))
        return st

    def step(carry, xs):
        (m_sc, m_st, v_sc, v_st, h_sc_keep, h_st_keep,
         col_best_sc, col_best_st, col_best_i) = carry
        a_codes, row = xs                                 # (B,), scalar row index (1-based)
        active = (row <= adapter_lens)                    # (B,)
        act2 = active[:, None]
        act3 = active[:, None, None]

        # ---------- V matrix (elementwise; depends on previous row only) ----
        v_ext = v_sc + gap_ext
        v_open = m_sc + gap_open
        take_ext = v_ext >= v_open
        nv_sc = jnp.where(take_ext, v_ext, v_open)
        nv_st = jnp.where(take_ext[:, None, :], v_st, m_st)
        c0 = nv_st[:, S_COLS]
        nv_st = nv_st.at[:, S_FAC].set(jnp.minimum(nv_st[:, S_FAC], c0))
        nv_st = nv_st.at[:, S_LAC].set(c0)
        nv_st = nv_st.at[:, S_RA].set(jcols)
        nv_st = nv_st.at[:, S_COLS].set(c0 + 1)
        nv_sc = nv_sc.at[:, 0].set(NEG)                    # boundary V(i,0)

        # ---------- diagonal candidates ----------
        sub = jnp.where(reads == a_codes[:, None], match, mismatch)  # (B, L)
        d_sc = jnp.concatenate(
            [jnp.full((B, 1), NEG, dtype), m_sc[:, :-1] + sub], axis=1)
        d_st = jnp.concatenate(
            [jnp.zeros((B, N_STATS, 1), dtype), m_st[:, :, :-1]], axis=2)
        c0 = d_st[:, S_COLS]
        eq = jnp.concatenate(
            [jnp.zeros((B, 1), dtype),
             (reads == a_codes[:, None]).astype(dtype)], axis=1)
        d_st = d_st.at[:, S_MATCH].add(eq)
        d_st = d_st.at[:, S_FRC].set(jnp.minimum(d_st[:, S_FRC], c0))
        d_st = d_st.at[:, S_FAC].set(jnp.minimum(d_st[:, S_FAC], c0))
        d_st = d_st.at[:, S_LRC].set(c0)
        d_st = d_st.at[:, S_LAC].set(c0)
        d_st = d_st.at[:, S_RA].set(jcols - 1)
        d_st = d_st.at[:, S_AR].set(row - 1)
        d_st = d_st.at[:, S_COLS].set(c0 + 1)

        # ---------- boundary M(i, 0) = 0 with vertical-head path ----------
        st0 = jnp.zeros((B, N_STATS), dtype)
        st0 = st0.at[:, S_COLS].set(row)
        st0 = st0.at[:, S_FRC].set(BIG)
        st0 = st0.at[:, S_LRC].set(-1)
        st0 = st0.at[:, S_LAC].set(row - 1)
        # S_FAC = 0, S_RA = 0, S_AR = 0, S_MATCH = 0 already.

        # ---------- pre = max-tiebreak(diag, V); diag wins ties ----------
        use_d = d_sc >= nv_sc
        pre_sc = jnp.where(use_d, d_sc, nv_sc)
        pre_st = jnp.where(use_d[:, None, :], d_st, nv_st)
        pre_sc = pre_sc.at[:, 0].set(0)                     # boundary column
        pre_st = pre_st.at[:, :, 0].set(st0)

        # ---------- H matrix via cumulative max over opening points ----------
        # H(i,j) = max_{k<j} pre(i,k) + open + (j-k-1)*ext
        #        = cummax_k [pre(k) + open - (k+1)*ext] + j*ext
        f = pre_sc + gap_open - (jcols + 1) * gap_ext
        cum_f, cum_k = _cummax_with_argmax(f, jcols)
        # shift right: H(j) sees candidates k <= j-1
        h_val = jnp.concatenate(
            [jnp.full((B, 1), NEG, dtype), cum_f[:, :-1] + (jcols[:, 1:]) * gap_ext],
            axis=1)
        k_star = jnp.concatenate(
            [jnp.zeros((B, 1), dtype), cum_k[:, :-1]], axis=1)
        nh_st = _gather_cols(pre_st, k_star)
        rlen = jcols - k_star                               # run length >= 1
        c0 = nh_st[:, S_COLS]
        nh_st = nh_st.at[:, S_FRC].set(jnp.minimum(nh_st[:, S_FRC], c0))
        nh_st = nh_st.at[:, S_LRC].set(c0 + rlen - 1)
        nh_st = nh_st.at[:, S_AR].set(row)
        nh_st = nh_st.at[:, S_COLS].set(c0 + rlen)
        nh_sc = h_val

        # ---------- M = diag >= max(V,H) ? diag : (V >= H ? V : H) ----------
        use_v_gap = nv_sc >= nh_sc
        gap_sc = jnp.where(use_v_gap, nv_sc, nh_sc)
        gap_st = jnp.where(use_v_gap[:, None, :], nv_st, nh_st)
        use_diag = pre_sc >= nh_sc                          # pre already folds V
        nm_sc = jnp.where(use_diag, pre_sc, gap_sc)
        nm_st = jnp.where(use_diag[:, None, :], pre_st, gap_st)
        nm_sc = nm_sc.at[:, 0].set(0)
        nm_st = nm_st.at[:, :, 0].set(st0)

        # ---------- freeze lanes whose adapter already ended ----------
        m_sc = jnp.where(act2, nm_sc, m_sc)
        m_st = jnp.where(act3, nm_st, m_st)
        v_sc = jnp.where(act2, nv_sc, v_sc)
        v_st = jnp.where(act3, nv_st, v_st)
        h_sc_keep = jnp.where(act2, nh_sc, h_sc_keep)
        h_st_keep = jnp.where(act3, nh_st, h_st_keep)

        # ---------- final-column candidate at (row, read_len) ----------
        cand_m = _gather_one(nm_sc, read_lens)
        cand_v = _gather_one(nv_sc, read_lens)
        cand_h = _gather_one(nh_sc, read_lens)
        cand_st = choose_stats(cand_m, cand_v, _gather_one(nv_st, read_lens),
                               cand_h, _gather_one(nh_st, read_lens),
                               _gather_one(nm_st, read_lens))
        better = active & (cand_m > col_best_sc)
        col_best_sc = jnp.where(better, cand_m, col_best_sc)
        col_best_st = jnp.where(better[:, None], cand_st, col_best_st)
        col_best_i = jnp.where(better, row, col_best_i)

        return (m_sc, m_st, v_sc, v_st, h_sc_keep, h_st_keep,
                col_best_sc, col_best_st, col_best_i), None

    rows = jnp.arange(1, A + 1, dtype=dtype)
    carry = (m_sc, m_st, v_sc, v_st, h_sc, h_st,
             col_best_sc, col_best_st, col_best_i)
    carry, _ = lax.scan(step, carry, (adapters.T.astype(dtype), rows))
    (m_sc, m_st, v_sc, v_st, h_sc, h_st,
     col_best_sc, col_best_st, col_best_i) = carry

    # ---------- last-row candidates: first max over j in [0, read_len) ----
    valid = jcols < read_lens[:, None]
    masked = jnp.where(valid, m_sc, NEG - 1)
    j_star = jnp.argmax(masked, axis=1).astype(dtype)      # first max
    row_sc = _gather_one(m_sc, j_star)
    row_st = choose_stats(row_sc,
                          _gather_one(v_sc, j_star), _gather_one(v_st, j_star),
                          _gather_one(h_sc, j_star), _gather_one(h_st, j_star),
                          _gather_one(m_st, j_star))

    # Last-row candidates precede final-column candidates in scout order:
    # the column wins only with a strictly greater score.
    col_wins = col_best_sc > row_sc
    best_sc = jnp.where(col_wins, col_best_sc, row_sc)
    best_st = jnp.where(col_wins[:, None], col_best_st, row_st)
    cell_i = jnp.where(col_wins, col_best_i, adapter_lens)
    cell_j = jnp.where(col_wins, read_lens, j_star)
    return best_sc, best_st, cell_i, cell_j


def stats_device(best_st, cell_i, cell_j, read_lens, adapter_lens):
    """jnp twin of the (matches, full_len) fragment of finish_batch, kept
    on device: the detection group-max fallback (ops/engine_v2
    ._groupmax_stats_fwd, mode 0) consumes only these two per lane, so the
    stat-carrying core + this finisher replaces the bitmap forward + walk
    on backends without the Pallas stats kernel.  Returns
    (matches, full_len, ok) int32/bool device arrays."""
    cell_i = cell_i.astype(jnp.int32)
    cell_j = cell_j.astype(jnp.int32)
    lr = read_lens.astype(jnp.int32)
    la = adapter_lens.astype(jnp.int32)
    cols = best_st[:, S_COLS]
    matches = best_st[:, S_MATCH]
    fac = best_st[:, S_FAC]
    lac = best_st[:, S_LAC]
    has_rtail = cell_j < lr
    cols = cols + jnp.where(has_rtail, lr - cell_j, 0)
    has_atail = cell_i < la
    fac = jnp.where(has_atail, jnp.minimum(fac, cols), fac)
    lac = jnp.where(has_atail, cols + (la - cell_i) - 1, lac)
    full_len = lac - fac + 1
    ok = (lr > 0) & (la > 0) & (full_len > 0)
    return matches, full_len, ok


def finish_batch(best_sc, best_st, cell_i, cell_j, read_lens, adapter_lens):
    """Vectorized tail/head resolution (numpy, host): appends the free tail
    segments and derives the 7-tuple fields.  Mirrors spec._finish_stats."""
    best_sc = np.asarray(best_sc).astype(np.int64)
    st = np.asarray(best_st).astype(np.int64)
    cell_i = np.asarray(cell_i).astype(np.int64)
    cell_j = np.asarray(cell_j).astype(np.int64)
    lr = np.asarray(read_lens).astype(np.int64)
    la = np.asarray(adapter_lens).astype(np.int64)

    cols = st[:, S_COLS].copy()
    matches = st[:, S_MATCH].copy()
    frc = st[:, S_FRC].copy()
    fac = st[:, S_FAC].copy()
    lrc = st[:, S_LRC].copy()
    lac = st[:, S_LAC].copy()
    s_ra = st[:, S_RA].copy()
    s_ar = st[:, S_AR].copy()

    has_rtail = cell_j < lr
    frc = np.where(has_rtail, np.minimum(frc, cols), frc)
    lrc = np.where(has_rtail, cols + (lr - cell_j) - 1, lrc)
    s_ar = np.where(has_rtail, cell_i, s_ar)
    cols = cols + np.where(has_rtail, lr - cell_j, 0)

    has_atail = cell_i < la
    fac = np.where(has_atail, np.minimum(fac, cols), fac)
    lac = np.where(has_atail, cols + (la - cell_i) - 1, lac)
    s_ra = np.where(has_atail, lr, s_ra)

    aln_start = np.maximum(frc, fac)
    aln_end = np.minimum(lrc, lac)
    read_start = np.where(fac >= frc, fac, 0)
    adapter_start = np.where(frc >= fac, frc, 0)
    read_end = np.where(lrc <= lac, lr - 1, s_ra)
    adapter_end = np.where(lac <= lrc, la - 1, s_ar)
    aligned_len = aln_end - aln_start + 1
    matches = np.where(aligned_len <= 0, 0, matches)
    aligned_len = np.maximum(aligned_len, 0)
    full_len = lac - fac + 1

    failed = (lr == 0) | (la == 0)
    read_start = np.where(failed, -1, read_start)
    return dict(read_start=read_start, read_end=read_end,
                adapter_start=adapter_start, adapter_end=adapter_end,
                raw_score=np.where(failed, -(2 ** 31), best_sc),
                matches=np.where(failed, 0, matches),
                aligned_len=np.where(failed, 0, aligned_len),
                full_len=np.where(failed, 0, full_len))


def supports(scoring) -> bool:
    """The scan formulation requires affine gaps with open < extend."""
    _, _, gap_open, gap_ext = scoring
    return gap_open < gap_ext


def align_batch(reads_pad, read_lens, adapters_pad, adapter_lens,
                scoring=(3, -6, -5, -2)):
    """Batched exact alignment.  reads_pad (B, L) int8 Dna5 codes (pad with
    4), adapters_pad (B, A) int8, lens int32.  Returns a dict of numpy int64
    arrays: read_start, read_end (INCLUSIVE, as the C++ reports it),
    adapter_start, adapter_end, raw_score, matches, aligned_len, full_len.
    """
    assert supports(scoring), 'use the host engine for this scoring scheme'
    match, mismatch, gap_open, gap_ext = (int(x) for x in scoring)
    best_sc, best_st, cell_i, cell_j = _align_core(
        jnp.asarray(reads_pad, dtype=jnp.int8),
        jnp.asarray(read_lens, dtype=jnp.int32),
        jnp.asarray(adapters_pad, dtype=jnp.int8),
        jnp.asarray(adapter_lens, dtype=jnp.int32),
        match, mismatch, gap_open, gap_ext)
    return finish_batch(best_sc, best_st, cell_i, cell_j,
                        read_lens, adapter_lens)


def results_to_alignresults(out):
    """Convert an align_batch dict to a list of spec.AlignResult."""
    n = len(out['read_start'])
    return [AlignResult(out['read_start'][k], out['read_end'][k],
                        out['adapter_start'][k], out['adapter_end'][k],
                        out['raw_score'][k], out['matches'][k],
                        out['aligned_len'][k], out['full_len'][k])
            for k in range(n)]
