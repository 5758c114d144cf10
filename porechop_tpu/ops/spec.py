"""Exact algorithm specification of the reference aligner, plus two host
(numpy) implementations used as ground truth by every faster engine.

Porechop's single compute primitive is a semi-global ("overlap") pairwise
alignment of a short adapter against a read window with affine gap costs:
SeqAn `globalAlignment(align, Score(match, mismatch, ext, open),
AlignConfig<true,true,true,true>)` — free end gaps on all four sides
(reference: porechop/src/adapter_align.cpp:20-29).

The reference's behaviour is fully pinned by the following facts, each
verified against the vendored SeqAn 2.x headers and empirically against a
compiled oracle (tests/oracle.py):

Profile
-------
* Default traceback config is ``TracebackOn<TracebackConfig_<SingleTrace,
  GapsLeft>>`` (include/seqan/align/dp_profile.h:335-337).
* gapOpen != gapExtend dispatches Gotoh/AffineGaps; equality dispatches
  NeedlemanWunsch/LinearGaps (global_alignment_unbanded.h:213-220).
* SeqAn gap semantics: a gap of length k costs ``open + (k-1)*ext``.
* Sequences are Dna5: every non-ACGT character (including the '-' used by
  Porechop's middle-pass masking) becomes 'N', and 'N' == 'N' counts as a
  match both for scoring and for percent-identity counting.

DP recurrences and per-cell trace bits (AffineGaps, SingleTrace)
----------------------------------------------------------------
Read is seqH (matrix columns j=0..Lr), adapter is seqV (rows i=0..La).
NEG = MinValue<int>/2 = -2**30 (dp_cell.h:117-124).

Boundary (free end gaps => RecursionDirectionZero, dp_meta_info.h:187-193):
  M[0][j] = M[i][0] = 0;  V[0][j] = V[i][0] = H[0][j] = H[i][0] = NEG;
  trace bits of row 0 / column 0 are NONE.

Inner cell (i,j), sub = match if read[j-1]==adapter[i-1] (Dna5) else mismatch
(dp_formula_affine.h:193-224,300-331,396-419,89-104):
  hExt = H[i][j-1] + ext ; hOpen = M[i][j-1] + open
  H[i][j] = max(hExt, hOpen);      hbit = H_EXT if hExt >= hOpen else H_OPEN
  vExt = V[i-1][j] + ext ; vOpen = M[i-1][j] + open
  V[i][j] = max(vExt, vOpen);      vbit = V_EXT if vExt >= vOpen else V_OPEN
  gap  = max(V[i][j], H[i][j]);    mbit = MAX_V if V >= H else MAX_H
  diag = M[i-1][j-1] + sub
  M[i][j] = max(diag, gap);
  bits[i][j] = (DIAG if diag >= gap else mbit) | hbit | vbit

Tie-break summary: diagonal beats gaps; vertical beats horizontal;
gap-extension beats gap-open (longest runs win).

Scout (max-cell election, dp_scout.h:168-177: strict ``>`` => the FIRST
tracked cell with the maximal score wins).  Tracked cells in order
(dp_meta_info.h:208-216, all four free-end flags true):
  (La, 0), (La, 1), ..., (La, Lr-1),          # last row, left to right
  (0, Lr), (1, Lr), ..., (La, Lr)             # final column, top to bottom

Traceback (dp_traceback_impl.h) from the max cell (i*, j*):
* Before traceback, ``_correctTraceValue`` (dp_algorithm_impl.h:1354-1369)
  rewrites the max cell's bits: if V[i*][j*] == M[i*][j*] the DIAGONAL bit
  is cleared and MAX_V forced; else if H[i*][j*] == M[i*][j*], MAX_H is
  forced.  The traceback therefore PREFERS ENDING WITH A GAP on ties at the
  start cell (vertical before horizontal before diagonal), unlike interior
  cells where the diagonal wins ties.
* Interior dispatch (GapsLeft, :388-417): DIAG first, then (MAX_V and V_EXT)
  => vertical run, (MAX_V and V_OPEN) => single vertical step, then the
  horizontal analogues.
* A vertical run (:225-265) walks upward consuming cells while the CURRENT
  cell's vbit is V_EXT, then consumes one final (gap-opening) step when it
  reads V_OPEN.  Horizontal runs mirror this along the row.
* The loop stops when i==0 or j==0 (:133-138).  Leading free gaps become a
  head segment (vertical if i>0 else horizontal, :544-551); trailing free
  gaps become tail segments with the READ tail placed before the ADAPTER
  tail (:528-536): gapped layout is [head][path][read tail][adapter tail].

Outputs (src/alignment.cpp:26-121) from the gapped rows:
  alnStart = max(first read-base col, first adapter-base col)
  alnEnd   = min(last  read-base col, last  adapter-base col)
  readStartPos / adapterStartPos = #bases of that sequence in cols [0, alnStart)
  readEndPos   / adapterEndPos   = #bases of that sequence in cols [0, alnEnd)
  alignedPct = 100 * matches(alnStart..alnEnd) / (alnEnd - alnStart + 1)
  fullPct    = 100 * matches(adapter span)     / (adapter-span length)
  Since a column never holds two gaps, the two match counts are equal.
  Serialized with C++ std::to_string => 6 decimal places ("%f" rounding);
  a zero-length aligned region yields "-nan" which Python parses as NaN.

The Python caller (porechop/nanopore_read.py:476-491) consumes
(readStart, readEnd+1, alignedPct, fullPct) and treats readStart == -1 as
total failure.
"""

from __future__ import annotations

import numpy as np

NEG = -(2 ** 30)
BIG = 2 ** 30

# Trace bit flags (values arbitrary; semantics mirror SeqAn's TraceBitMap_).
H_EXT, H_OPEN, V_EXT, V_OPEN, DIAG, MAX_V, MAX_H = 1, 2, 4, 8, 16, 32, 64

# Dna5 encoding: everything that is not ACGTU (including '-') is N; SeqAn's
# char->Dna5 translation maps 'U'/'u' to T (verified against the oracle).
_CODE = np.full(256, 4, dtype=np.int8)
for _i, _b in enumerate('ACGT'):
    _CODE[ord(_b)] = _i
    _CODE[ord(_b.lower())] = _i
_CODE[ord('U')] = _CODE[ord('u')] = 3


def encode(seq: str) -> np.ndarray:
    """Encode a sequence string to Dna5 codes A,C,G,T,N -> 0..4."""
    return _CODE[np.frombuffer(seq.encode('ascii'), dtype=np.uint8)]


def encode_many(seqs) -> list:
    """Bulk twin of encode: one join + one table lookup for a whole list.

    Per-call numpy overhead on encode() is ~10 us, which at phase scale
    (tens of thousands of windows) costs more than the encoding itself —
    measured 0.4 s of a 6 s 8192-read run.  Returns a list of per-sequence
    views into one freshly-allocated code array; the views are writable
    and disjoint, so callers (the middle phase masks hits in place) may
    mutate them safely."""
    if not seqs:
        return []
    codes = _CODE[np.frombuffer(''.join(seqs).encode('ascii'),
                                dtype=np.uint8)]
    offs = np.cumsum([len(s) for s in seqs])
    return np.split(codes, offs[:-1])


def seqan_pct(matches: int, length: int) -> float:
    """Percent identity with the reference's round trip through
    C++ std::to_string (6 decimals) and Python float()."""
    if length <= 0:
        return float('nan')
    return float('%.6f' % (100.0 * matches / length))


class AlignResult:
    """The 7-tuple of src/alignment.cpp plus the integer stats behind it."""

    __slots__ = ('read_start', 'read_end', 'adapter_start', 'adapter_end',
                 'raw_score', 'matches', 'aligned_len', 'full_len')

    def __init__(self, read_start, read_end, adapter_start, adapter_end,
                 raw_score, matches, aligned_len, full_len):
        self.read_start = int(read_start)
        self.read_end = int(read_end)
        self.adapter_start = int(adapter_start)
        self.adapter_end = int(adapter_end)
        self.raw_score = int(raw_score)
        self.matches = int(matches)
        self.aligned_len = int(aligned_len)
        self.full_len = int(full_len)

    @property
    def aligned_pct(self) -> float:
        return seqan_pct(self.matches, self.aligned_len)

    @property
    def full_pct(self) -> float:
        return seqan_pct(self.matches, self.full_len)

    def csv(self) -> str:
        """Reproduce the C-string of adapter_align.cpp / alignment.cpp."""
        if self.read_start == -1:
            # Empty input: SeqAn's _isValidDPSettings bails with MinValue<int>
            # and the stat fields stay at their (zero) defaults.
            return '-1,0,-1,0,-2147483648,0.000000,0.000000'

        def fmt(m, ln):
            if ln <= 0:
                return '-nan'
            return '%.6f' % (100.0 * m / ln)
        return ','.join([str(self.read_start), str(self.read_end),
                         str(self.adapter_start), str(self.adapter_end),
                         str(self.raw_score),
                         fmt(self.matches, self.aligned_len),
                         fmt(self.matches, self.full_len)])

    def porechop_tuple(self):
        """(full_pct, aligned_pct, read_start, read_end_exclusive) as used by
        nanopore_read.align_adapter (reference nanopore_read.py:476-491)."""
        if self.read_start == -1:
            return 0.0, 0.0, -1, 0
        return self.full_pct, self.aligned_pct, self.read_start, self.read_end + 1

    def __repr__(self):
        return 'AlignResult(%s)' % self.csv()


def _stats_from_gapped(read_row: list, adapter_row: list, raw_score: int) -> AlignResult:
    """Direct re-expression of alignment.cpp:26-121 over gapped char rows."""
    n = len(read_row)
    first_r = first_a = -1
    last_r = last_a = -1
    for idx in range(n):
        if read_row[idx] != '-' and first_r < 0:
            first_r = idx
        if adapter_row[idx] != '-' and first_a < 0:
            first_a = idx
    for idx in range(n - 1, -1, -1):
        if read_row[idx] != '-' and last_r < 0:
            last_r = idx
        if adapter_row[idx] != '-' and last_a < 0:
            last_a = idx
    if first_r < 0 or first_a < 0:
        return AlignResult(-1, -1, -1, -1, raw_score, 0, 0, 0)
    aln_start = max(first_r, first_a)
    aln_end = min(last_r, last_a)
    matches = sum(1 for idx in range(aln_start, aln_end + 1)
                  if read_row[idx] == adapter_row[idx])
    aligned_len = aln_end - aln_start + 1
    full_len = last_a - first_a + 1
    read_start = sum(1 for idx in range(aln_start) if read_row[idx] != '-')
    adapter_start = sum(1 for idx in range(aln_start) if adapter_row[idx] != '-')
    read_end = sum(1 for idx in range(aln_end) if read_row[idx] != '-')
    adapter_end = sum(1 for idx in range(aln_end) if adapter_row[idx] != '-')
    return AlignResult(read_start, read_end, adapter_start, adapter_end,
                       raw_score, matches, aligned_len, full_len)


def align_traceback(read: str, adapter: str, scoring=(3, -6, -5, -2)) -> AlignResult:
    """Reference implementation #1: full trace-bit matrix + explicit
    traceback, mirroring SeqAn's control flow step for step.  O(Lr*La) memory;
    slow; exists purely as executable specification."""
    match, mismatch, open_, ext = scoring
    r = encode(read)
    a = encode(adapter)
    lr, la = len(r), len(a)
    if lr == 0 or la == 0:
        return AlignResult(-1, -1, -1, -1, 0, 0, 0, 0)
    if open_ == ext:
        return _align_traceback_linear(r, a, match, mismatch, open_)

    m = np.zeros((la + 1, lr + 1), dtype=np.int64)
    v = np.full((la + 1, lr + 1), NEG, dtype=np.int64)
    h = np.full((la + 1, lr + 1), NEG, dtype=np.int64)
    bits = np.zeros((la + 1, lr + 1), dtype=np.uint8)

    # Vectorized over j (no in-row dependency along j for V; H handled by
    # rolling the row loop over i with columns vectorized is NOT possible
    # since H depends on j-1 within the row; keep the plain double loop: this
    # module is specification, not speed).
    for i in range(1, la + 1):
        sub = np.where(r == a[i - 1], match, mismatch)
        for j in range(1, lr + 1):
            h_ext = h[i, j - 1] + ext
            h_open = m[i, j - 1] + open_
            if h_ext >= h_open:
                hval, hbit = h_ext, H_EXT
            else:
                hval, hbit = h_open, H_OPEN
            v_ext = v[i - 1, j] + ext
            v_open = m[i - 1, j] + open_
            if v_ext >= v_open:
                vval, vbit = v_ext, V_EXT
            else:
                vval, vbit = v_open, V_OPEN
            if vval >= hval:
                gap, mbit = vval, MAX_V
            else:
                gap, mbit = hval, MAX_H
            diag = m[i - 1, j - 1] + sub[j - 1]
            if diag >= gap:
                m[i, j] = diag
                bits[i, j] = DIAG | hbit | vbit
            else:
                m[i, j] = gap
                bits[i, j] = mbit | hbit | vbit
            v[i, j] = vval
            h[i, j] = hval

    # Scout: first max in tracked-cell order (strict >).
    best = m[la, 0]
    bi, bj = la, 0
    for j in range(1, lr):
        if m[la, j] > best:
            best, bi, bj = m[la, j], la, j
    for i in range(0, la + 1):
        if m[i, lr] > best:
            best, bi, bj = m[i, lr], i, lr

    # _correctTraceValue (dp_algorithm_impl.h:1354-1369): at the max cell,
    # prefer ending in a gap: vertical first, then horizontal.
    tv0 = int(bits[bi, bj])
    if v[bi, bj] == best:
        tv0 = (tv0 & ~DIAG) | MAX_V
    elif h[bi, bj] == best:
        tv0 = (tv0 & ~DIAG) | MAX_H
    bits[bi, bj] = tv0
    moves = _traceback_moves(bits, bi, bj, prefer_gaps_at_end=True)
    return _assemble(read, adapter, moves, bi, bj, lr, la, int(best))


def _align_traceback_linear(r, a, match, mismatch, gap) -> AlignResult:
    """LinearGaps profile (NeedlemanWunsch dispatch when open == ext).
    dp_formula_linear.h SingleTrace tie-breaks: diagonal beats vertical beats
    horizontal; PreferGapsAtEnd_ is False for LinearGaps+GapsLeft."""
    lr, la = len(r), len(a)
    m = np.zeros((la + 1, lr + 1), dtype=np.int64)
    bits = np.zeros((la + 1, lr + 1), dtype=np.uint8)
    for i in range(1, la + 1):
        sub = np.where(r == a[i - 1], match, mismatch)
        for j in range(1, lr + 1):
            diag = m[i - 1, j - 1] + sub[j - 1]
            vert = m[i - 1, j] + gap
            horiz = m[i, j - 1] + gap
            # dp_formula_linear.h SingleTrace: horizontal computed first,
            # vertical replaces on >=... pinned by oracle fuzzing in
            # tests/test_spec_vs_oracle.py (linear scheme cases).
            if vert >= horiz:
                gbest, gbit = vert, V_EXT | MAX_V
            else:
                gbest, gbit = horiz, H_EXT | MAX_H
            if diag >= gbest:
                m[i, j] = diag
                bits[i, j] = DIAG
            else:
                m[i, j] = gbest
                bits[i, j] = gbit
    best = m[la, 0]
    bi, bj = la, 0
    for j in range(1, lr):
        if m[la, j] > best:
            best, bi, bj = m[la, j], la, j
    for i in range(0, la + 1):
        if m[i, lr] > best:
            best, bi, bj = m[i, lr], i, lr
    moves = _traceback_moves(bits, bi, bj, prefer_gaps_at_end=False,
                             linear=True)
    read_s = ''.join(chr(b) for b in _decode_bytes(r))
    adapter_s = ''.join(chr(b) for b in _decode_bytes(a))
    return _assemble(read_s, adapter_s, moves, bi, bj, lr, la, int(best))


def _decode_bytes(codes):
    return [b'ACGTN'[c] for c in codes]


def _traceback_moves(bits, i, j, prefer_gaps_at_end, linear=False):
    """Walk the trace bits exactly as dp_traceback_impl.h does; returns the
    move list in traceback (end-first) order."""
    moves = []
    tv = int(bits[i, j])
    if prefer_gaps_at_end:
        if tv & MAX_V:
            tv &= (V_EXT | V_OPEN | MAX_V)
        elif tv & MAX_H:
            tv &= (H_EXT | H_OPEN | MAX_H)
    while i > 0 and j > 0 and tv != 0:
        if tv & DIAG:
            moves.append('D')
            i -= 1
            j -= 1
            tv = int(bits[i, j])
        elif (tv & MAX_V) and (tv & V_EXT):
            if linear:
                moves.append('V')
                i -= 1
                tv = int(bits[i, j])
            else:
                while ((not (tv & V_OPEN)) or (tv & V_EXT)) and i != 1:
                    moves.append('V')
                    i -= 1
                    tv = int(bits[i, j])
                moves.append('V')
                i -= 1
                tv = int(bits[i, j])
        elif (tv & MAX_V) and (tv & V_OPEN):
            moves.append('V')
            i -= 1
            tv = int(bits[i, j])
        elif (tv & MAX_H) and (tv & H_EXT):
            if linear:
                moves.append('H')
                j -= 1
                tv = int(bits[i, j])
            else:
                while ((not (tv & H_OPEN)) or (tv & H_EXT)) and j != 1:
                    moves.append('H')
                    j -= 1
                    tv = int(bits[i, j])
                moves.append('H')
                j -= 1
                tv = int(bits[i, j])
        elif (tv & MAX_H) and (tv & H_OPEN):
            moves.append('H')
            j -= 1
            tv = int(bits[i, j])
        else:
            break
    moves.append(('END', i, j))
    return moves


def _assemble(read, adapter, moves, bi, bj, lr, la, raw_score) -> AlignResult:
    """Build gapped rows: [head][path][read tail][adapter tail]."""
    end = moves[-1]
    i0, j0 = end[1], end[2]
    path = [mv for mv in moves[:-1]][::-1]
    read_row, adapter_row = [], []
    # Head: leading free gaps (only one of i0/j0 can be nonzero).
    for k in range(i0):
        read_row.append('-')
        adapter_row.append(_dna5(adapter[k]))
    for k in range(j0):
        read_row.append(_dna5(read[k]))
        adapter_row.append('-')
    ri, ai = j0, i0
    for mv in path:
        if mv == 'D':
            read_row.append(_dna5(read[ri]))
            adapter_row.append(_dna5(adapter[ai]))
            ri += 1
            ai += 1
        elif mv == 'H':
            read_row.append(_dna5(read[ri]))
            adapter_row.append('-')
            ri += 1
        else:
            read_row.append('-')
            adapter_row.append(_dna5(adapter[ai]))
            ai += 1
    assert ri == bj and ai == bi, (ri, bj, ai, bi)
    # Tail: read tail first, adapter tail last (dp_traceback_impl.h:528-536).
    for k in range(bj, lr):
        read_row.append(_dna5(read[k]))
        adapter_row.append('-')
    for k in range(bi, la):
        read_row.append('-')
        adapter_row.append(_dna5(adapter[k]))
    return _stats_from_gapped(read_row, adapter_row, raw_score)


def _dna5(ch: str) -> str:
    up = ch.upper()
    return up if up in 'ACGT' else 'N'


# ---------------------------------------------------------------------------
# Implementation #2: forward stat-carrying DP (the formulation every fast
# engine uses — no trace matrix, no traceback).
# ---------------------------------------------------------------------------

# Stats vector layout (int64): see _stats_* helpers.
S_COLS, S_MATCH, S_FRC, S_FAC, S_LRC, S_LAC, S_RA, S_AR = range(8)


def align_stats(read: str, adapter: str, scoring=(3, -6, -5, -2)) -> AlignResult:
    """Reference implementation #2: forward-carried path statistics.

    Each DP matrix (M, V, H) carries, besides its score, the statistics of
    the alignment path that SeqAn's traceback WOULD produce from that cell:
    (total gapped cols, matches, first/last read-base col, first/last
    adapter-base col, read bases strictly before last adapter col, adapter
    bases strictly before last read col).  Selections use the same
    tie-breaking as the trace bits, so the carried stats equal the traced
    path's stats by induction.  This is the formulation used by the
    vectorized engines (ops/engine_jax.py, ops/engine_pallas.py); it needs
    O(La*Lr) time but only O(Lr) live state when scanned row-major.
    """
    match, mismatch, open_, ext = scoring
    r = encode(read).astype(np.int64)
    a = encode(adapter).astype(np.int64)
    lr, la = len(r), len(a)
    if lr == 0 or la == 0:
        return AlignResult(-1, -1, -1, -1, 0, 0, 0, 0)
    if open_ == ext:
        # Linear profile: fall back to the executable spec (rare; custom
        # schemes only).  Fast engines do the same.
        return _align_traceback_linear(r, a, match, mismatch, open_)
    if open_ > ext:
        # Gap openings cheaper than extensions: SeqAn still runs Gotoh.  The
        # scan trick below assumes open < ext (strict domination of
        # gap-through-gap candidates); use the executable spec instead.
        return align_traceback(read, adapter, scoring)

    j_idx = np.arange(lr + 1, dtype=np.int64)

    def fresh_stats():
        s = np.zeros((8, lr + 1), dtype=np.int64)
        return s

    # Row 0 state: M(0,j) = 0 with path = j horizontal columns.
    m_sc = np.zeros(lr + 1, dtype=np.int64)
    m_st = fresh_stats()
    m_st[S_COLS] = j_idx
    m_st[S_FRC] = np.where(j_idx > 0, 0, BIG)
    m_st[S_FAC] = BIG
    m_st[S_LRC] = j_idx - 1          # -1 when j == 0
    m_st[S_LAC] = -1
    m_st[S_RA] = 0
    m_st[S_AR] = 0

    v_sc = np.full(lr + 1, NEG, dtype=np.int64)
    v_st = fresh_stats()

    best_sc = None
    best_st = None
    best_cell = None

    def consider(score, v_score, v_stats, h_score, h_stats, m_stats, cell):
        """Track the first strict max; on selection apply the start-cell
        rule of _correctTraceValue: V==M -> vertical stats, elif H==M ->
        horizontal stats, else the (diagonal-preferring) M stats."""
        nonlocal best_sc, best_st, best_cell
        if best_sc is None or score > best_sc:
            if v_score == score:
                st = v_stats
            elif h_score == score:
                st = h_stats
            else:
                st = m_stats
            best_sc, best_st, best_cell = score, st.copy(), cell

    # Tracked: (La, 0) first.  Row-major scan visits rows i=1..La; the last
    # row's cells are exactly the final M state; final-column cells are
    # snapshots of M/V/H[lr] per row.  Ordering: all last-row cells (by j)
    # come before final-column cells (by i); last-row tracking covers
    # j=0..Lr-1 and the final column covers i=0..La at j=Lr.
    final_col = []  # (i, m, v, v_st, h, h_st, m_st) snapshots at j = Lr
    zst = np.zeros(8, dtype=np.int64)
    final_col.append((0, int(m_sc[lr]), NEG, zst, NEG, zst, m_st[:, lr].copy()))

    for i in range(1, la + 1):
        sub = np.where(r == a[i - 1], match, mismatch)
        prev_m_sc, prev_m_st = m_sc, m_st
        prev_v_sc, prev_v_st = v_sc, v_st

        # V matrix: extend from V(i-1,j) or open from M(i-1,j); tie => extend.
        v_ext = prev_v_sc + ext
        v_open = prev_m_sc + open_
        take_ext = v_ext >= v_open
        v_sc = np.where(take_ext, v_ext, v_open)
        v_st = np.where(take_ext, prev_v_st, prev_m_st)
        # Apply one vertical column: col index = cols (pre-increment).
        c0 = v_st[S_COLS]
        v_st = v_st.copy()
        v_st[S_FAC] = np.minimum(v_st[S_FAC], c0)
        v_st[S_LAC] = c0
        v_st[S_RA] = j_idx
        v_st[S_COLS] = c0 + 1
        # Boundary j=0: V(i,0) stays NEG with dummy stats.
        v_sc[0] = NEG

        # Diagonal candidates: M(i-1, j-1) + sub.
        d_sc = np.empty(lr + 1, dtype=np.int64)
        d_sc[0] = NEG
        d_sc[1:] = prev_m_sc[:-1] + sub
        d_st = np.zeros_like(m_st)
        d_st[:, 1:] = prev_m_st[:, :-1]
        c0 = d_st[S_COLS]
        eq = np.zeros(lr + 1, dtype=np.int64)
        eq[1:] = (r == a[i - 1]).astype(np.int64)
        d_st[S_MATCH] = d_st[S_MATCH] + eq
        d_st[S_FRC] = np.minimum(d_st[S_FRC], c0)
        d_st[S_FAC] = np.minimum(d_st[S_FAC], c0)
        d_st[S_LRC] = c0
        d_st[S_LAC] = c0
        d_st[S_RA] = j_idx - 1
        d_st[S_AR] = i - 1
        d_st[S_COLS] = c0 + 1

        # H matrix + M assembled left to right (H has an in-row dependency).
        new_m_sc = np.empty(lr + 1, dtype=np.int64)
        new_m_st = np.zeros_like(m_st)
        new_m_sc[0] = 0      # M(i, 0) free boundary
        st0 = np.zeros(8, dtype=np.int64)
        st0[S_COLS] = i
        st0[S_FRC] = BIG
        st0[S_FAC] = 0
        st0[S_LRC] = -1
        st0[S_LAC] = i - 1
        new_m_st[:, 0] = st0
        h_sc_row = np.full(lr + 1, NEG, dtype=np.int64)
        h_st_row = np.zeros((8, lr + 1), dtype=np.int64)
        h_sc_prev = NEG
        h_st_prev = np.zeros(8, dtype=np.int64)
        for j in range(1, lr + 1):
            h_ext = h_sc_prev + ext
            h_open = new_m_sc[j - 1] + open_
            if h_ext >= h_open:
                h_sc, h_st = h_ext, h_st_prev.copy()
            else:
                h_sc, h_st = h_open, new_m_st[:, j - 1].copy()
            c0h = h_st[S_COLS]
            h_st[S_FRC] = min(h_st[S_FRC], c0h)
            h_st[S_LRC] = c0h
            h_st[S_AR] = i
            h_st[S_COLS] = c0h + 1
            # M = diag if diag >= max(V,H); elif V >= H: V else H.
            if v_sc[j] >= h_sc:
                gap_sc, gap_st = v_sc[j], v_st[:, j]
            else:
                gap_sc, gap_st = h_sc, h_st
            if d_sc[j] >= gap_sc:
                new_m_sc[j] = d_sc[j]
                new_m_st[:, j] = d_st[:, j]
            else:
                new_m_sc[j] = gap_sc
                new_m_st[:, j] = gap_st
            h_sc_prev, h_st_prev = h_sc, h_st
            h_sc_row[j] = h_sc
            h_st_row[:, j] = h_st
        m_sc, m_st = new_m_sc, new_m_st
        h_sc_last, h_st_last = h_sc_row, h_st_row
        final_col.append((i, int(m_sc[lr]),
                          int(v_sc[lr]), v_st[:, lr].copy(),
                          int(h_sc_row[lr]), h_st_row[:, lr].copy(),
                          m_st[:, lr].copy()))

    # Scout order: last row j=0..Lr-1 then final column i=0..La.
    for j in range(0, lr):
        if la >= 1:
            consider(int(m_sc[j]), int(v_sc[j]), v_st[:, j],
                     int(h_sc_last[j]), h_st_last[:, j], m_st[:, j], (la, j))
        else:
            consider(int(m_sc[j]), NEG, zst, NEG, zst, m_st[:, j], (la, j))
    for i, sc, vv, vst, hh, hst, mst in final_col:
        consider(sc, vv, vst, hh, hst, mst, (i, lr))

    return _finish_stats(best_sc, best_st, best_cell, lr, la)


def _finish_stats(score, st, cell, lr, la) -> AlignResult:
    """Append free-tail segments to the carried stats and derive the 7-tuple."""
    i_s, j_s = cell
    cols, matches = int(st[S_COLS]), int(st[S_MATCH])
    frc, fac = int(st[S_FRC]), int(st[S_FAC])
    lrc, lac = int(st[S_LRC]), int(st[S_LAC])
    s_ra, s_ar = int(st[S_RA]), int(st[S_AR])
    if j_s < lr:                      # read tail
        frc = min(frc, cols)
        lrc = cols + (lr - j_s) - 1
        s_ar = i_s
        cols += lr - j_s
    if i_s < la:                      # adapter tail (after the read tail)
        fac = min(fac, cols)
        lac = cols + (la - i_s) - 1
        s_ra = lr
        cols += la - i_s
    if frc >= BIG or fac >= BIG:
        return AlignResult(-1, -1, -1, -1, int(score), 0, 0, 0)
    aln_start = max(frc, fac)
    aln_end = min(lrc, lac)
    read_start = fac if fac >= frc else 0
    adapter_start = frc if frc >= fac else 0
    read_end = (lr - 1) if lrc <= lac else s_ra
    adapter_end = (la - 1) if lac <= lrc else s_ar
    aligned_len = aln_end - aln_start + 1
    full_len = lac - fac + 1
    if aligned_len <= 0:
        matches = 0
        aligned_len = max(aligned_len, 0)
    return AlignResult(read_start, read_end, adapter_start, adapter_end,
                       int(score), matches, aligned_len, full_len)
