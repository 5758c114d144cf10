"""Pallas TPU kernel for the bitmap forward DP.

The jnp scan in ops/engine_v2.py is HBM-bound: every adapter row re-reads
and re-writes the (B, L1) score state from HBM, and the in-row cumulative
max costs log2(L) more full passes.  This kernel keeps the whole DP state
of a 32-lane block resident in VMEM for the entire adapter loop, so HBM
traffic collapses to: read the codes once, write one trace byte per cell,
and a few scalars per lane.

Semantics are identical to engine_v2._forward (same trace-bit encoding,
same scout/tie-break rules — see ops/spec.py for the reference derivation
into SeqAn, porechop/include/seqan/align/*); parity is enforced by
tests/test_kernel_pallas.py which runs both forwards against the
executable spec.

Layout notes (see the Pallas TPU guide):
* grid = (B / LANES, A): the adapter-row axis is the inner (fastest) grid
  dimension; the DP state lives in VMEM scratch, which persists across
  inner grid steps on the same core (the standard accumulator pattern), so
  each row step reads/writes only VMEM while the per-row bits block
  pipelines out to HBM;
* LANES per grid program adapts to the window length (_lanes_for): a
  power of two >= 32 (uint8 tile alignment) sized so the DP scratch fills
  ~24 MB — short windows get thousands of lanes per block so the grid-step
  dispatch overhead doesn't dominate;
* all row vectors are (LANES, L1p) with L1p = L+1 rounded up to 128;
* the in-row H recurrence uses a log-shift prefix max over VMEM;
* per-lane dynamic columns (j = read_len) are resolved with masked
  reductions instead of gathers (TPU-friendly);
* the last-row "first maximum" scout uses an integer key
  m * 2^14 + (2^14 - 1 - j), valid because |scores| <= ~330 * gap bound
  inside the tracked region and L1p <= 2^14 (the dispatcher routes larger
  buckets to the jnp engine).
"""

from __future__ import annotations

import functools

from . import _jax_setup

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_jax_setup.configure()

from .spec import NEG

LANES = 32                 # minimum lane block (uint8 tile alignment)
MAX_L1P = 1 << 14          # key-trick bound; larger buckets use the jnp path
_JKEY = 1 << 14

# int16 DP state STORAGE: the sentinel for -infinity.  Every REAL score
# stays within R of zero (scores accumulate only along the <= A adapter
# rows — see native/align_simd.cpp:11-16 for the same argument on the host
# engine), so a floor this deep is never confused with a real value; the H
# chain is clamped at it (exact: a clamped H still loses every comparison
# it should lose, because its competitors are >= -R - |open| >> NEG16).
# Arithmetic stays int32 (Mosaic has no packed-int16 rotates/reductions on
# this toolchain); int16 is the at-rest format of the m/v/h VMEM scratch,
# halving state bytes so wider lane blocks fit, and reads/adapter codes
# store as int8 (codes 0..4).
NEG16 = -8192

# Cap on LANES * L1p int32-equivalent elements per block.  Bigger blocks
# mean fewer grid steps (each step has fixed Mosaic dispatch cost, which
# dominates at short window lengths: detection windows are 150 bp ->
# L1p=256, where 32-lane blocks would mean ~50k tiny grid steps per launch).
# The cap is set by VMEM: the row computation keeps ~15 temporaries of this
# size live (the Mosaic register allocator spills them to scoped VMEM), so
# 2^19 int32 elements ~= 30 MB of spill + 6 MB state + block buffers, safely
# under the 100 MB limit.  int16 state halves every per-element byte, so the
# element budget doubles.
_BLOCK_ELEMS = 1 << 19


def _score_range(match, mismatch, gap_ext, gap_open, A):
    """Upper bound on |any tracked DP value|: paths have <= A adapter rows,
    so diagonal/vertical chains contribute <= A*(max|sub| + |ext|) and at
    most two opens matter along any compared pair."""
    return (A * (max(abs(match), abs(mismatch)) + abs(gap_ext))
            + 2 * abs(gap_open))


def _sdt_for(match, mismatch, gap_open, gap_ext, A):
    """Storage dtype election: int16 when real values stay well above the
    NEG16 floor (so the H clamp is exact and every stored value fits).
    Arithmetic is int32 either way; only the at-rest state narrows."""
    R = _score_range(match, mismatch, gap_ext, gap_open, A)
    if R + 2 * abs(gap_open) + abs(gap_ext) < -NEG16 - 64:
        return jnp.int16, NEG16
    return jnp.int32, NEG


def _lanes_for(B, L1p, sdt=jnp.int32):
    # The block budget is set by the ~15 spilled int32 TEMPORARIES, which
    # don't narrow with the storage dtype — so no int16 bonus (measured:
    # lane count is perf-neutral from 512 to 8192 at L1p=256 anyway, and
    # 2x once blew the 100 MB scoped-VMEM limit).
    del sdt
    lanes = max(32, _BLOCK_ELEMS // L1p)
    lanes = 1 << (lanes.bit_length() - 1)          # pow2 floor
    while lanes > 32 and B % lanes:
        lanes //= 2
    return lanes


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _forward_kernel(reads_ref, alens_ref, rlens_ref, acode_ref,
                    bits_ref, best_ref, celli_ref, cellj_ref,
                    vflag_ref, hflag_ref,
                    m_ref, v_ref, h_ref,
                    tsc_ref, ti_ref, tvf_ref, thf_ref,
                    *, A, L1p, LANES, match, mismatch, gap_open, gap_ext,
                    sdt, neg, window):
    """Grid program (b, i): DP row i+1 for lane block b.

    reads_ref:    (LANES, L1p) sdt — read code at column j is read[j-1]
                  (pre-shifted by one; col 0 and padding hold code 4).
    alens_ref:    (LANES, 1) int32 adapter lengths.
    rlens_ref:    (LANES, 1) int32 read lengths.
    acode_ref:    (1, LANES, 1) sdt — this row's adapter code per lane
                  (blocked over the row grid axis; avoids unaligned dynamic
                  slices, which Mosaic rejects).
    bits_ref:     (1, LANES, L1p) uint8 — this row's trace bytes.
    best/celli/cellj/vflag/hflag: (LANES, 1) int32 outputs (final row only).
    m/v/h_ref:    (LANES, L1p) sdt VMEM scratch (DP state, carried); sdt is
                  int16 whenever _sdt_for proves the range fits (H clamped
                  at `neg`, which is exact — see NEG16).
    tsc/ti/tvf/thf_ref: (LANES, 1) int32 VMEM scratch — the running
                  final-column scout candidate (score, row, V==M, H==M).
    """
    i = pl.program_id(1)
    row = i + 1                                          # 1-based DP row
    jcol = lax.broadcasted_iota(jnp.int32, (LANES, L1p), 1)
    rlen = rlens_ref[:, 0][:, None]                      # (LANES, 1)
    alen = alens_ref[:, 0][:, None]
    col_is_len = jcol == rlen
    col0 = jcol == 0
    negs = jnp.int32(neg)

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.zeros((LANES, L1p), sdt)
        v_ref[:] = jnp.full((LANES, L1p), neg, sdt)
        h_ref[:] = jnp.full((LANES, L1p), neg, sdt)
        tsc_ref[:] = jnp.zeros((LANES, 1), jnp.int32)    # col best=M(0,len)=0
        ti_ref[:] = jnp.zeros((LANES, 1), jnp.int32)
        tvf_ref[:] = jnp.zeros((LANES, 1), jnp.int32)
        thf_ref[:] = jnp.zeros((LANES, 1), jnp.int32)

    m = m_ref[:].astype(jnp.int32)                       # int16 at rest,
    v = v_ref[:].astype(jnp.int32)                       # int32 in flight
    a_code = acode_ref[0].astype(jnp.int32)              # (LANES, 1)

    # V matrix.
    v_ext = v + gap_ext
    v_open = m + gap_open
    vbit = v_ext >= v_open
    nv = jnp.where(vbit, v_ext, v_open)
    nv = jnp.where(col0, negs, nv)

    # Diagonal: d[j] = m[j-1] + sub[j]  (reads pre-shifted by one column).
    eq = reads_ref[:].astype(jnp.int32) == a_code
    sub = jnp.where(eq, match, mismatch)
    m_shift = pltpu.roll(m, 1, 1)
    d = jnp.where(col0, negs, m_shift + sub)

    pre = jnp.maximum(d, nv)
    pre = jnp.where(col0, 0, pre)

    # H row: prefix max of f, then shift right one column.  The prefix
    # window is bounded by the provable optimal-path gap-run cap (see the
    # transposed-kernel note before _prefix_window): runs longer than the
    # window are strictly suboptimal, so truncated H values never sit on —
    # or tie into — an elected path, and neither the elected cell nor any
    # trace bit the walker consults can change.  14 -> 6 passes at the
    # 10 kb middle shape with the default scheme.
    f = pre + gap_open - (jcol + 1) * gap_ext
    n_pass = max(1, (window - 1).bit_length())

    cum = f
    for k in range(n_pass):            # static shifts — keep Mosaic happy
        sh = 1 << k
        rolled = pltpu.roll(cum, sh, 1)
        rolled = jnp.where(jcol < sh, negs, rolled)
        cum = jnp.maximum(cum, rolled)
    cum_shift = pltpu.roll(cum, 1, 1)
    nh = jnp.where(col0, negs, cum_shift + jcol * gap_ext)
    nh = jnp.maximum(nh, negs)         # storage floor (exact, see NEG16)

    nm = jnp.maximum(pre, nh)
    nm = jnp.where(col0, 0, nm)

    # Trace bits.
    nh_shift = pltpu.roll(nh, 1, 1)
    nm_shift = pltpu.roll(nm, 1, 1)
    hbit = (~col0) & (nh_shift + gap_ext >= nm_shift + gap_open)
    dbit = d >= jnp.maximum(nv, nh)
    mvbit = nv >= nh
    # int32 arithmetic, one cast at the end (int8 shifts don't legalize).
    bits32 = (hbit.astype(jnp.int32) + vbit.astype(jnp.int32) * 2
              + dbit.astype(jnp.int32) * 4 + mvbit.astype(jnp.int32) * 8
              + jnp.where(col0, 0, eq.astype(jnp.int32)) * 16)
    bits_ref[0] = bits32.astype(jnp.uint8)

    # Freeze lanes whose adapter already ended.
    active = row <= alen                                 # (LANES, 1)
    m_ref[:] = jnp.where(active, nm, m).astype(sdt)
    v_ref[:] = jnp.where(active, nv, v).astype(sdt)
    h_ref[:] = jnp.where(active, nh,
                         h_ref[:].astype(jnp.int32)).astype(sdt)

    # Final-column scout candidate via masked reductions (no gathers).
    cand_m = jnp.max(jnp.where(col_is_len, nm, negs), axis=1)    # (LANES,)
    cand_v = jnp.max(jnp.where(col_is_len, nv, negs), axis=1)
    cand_h = jnp.max(jnp.where(col_is_len, nh, negs), axis=1)
    act1 = active[:, 0]
    better = act1 & (cand_m > tsc_ref[:, 0])
    uv = cand_v == cand_m
    uh = (~uv) & (cand_h == cand_m)
    b2 = better[:, None]
    tsc_ref[:] = jnp.where(b2, cand_m[:, None], tsc_ref[:])
    ti_ref[:] = jnp.where(b2, row, ti_ref[:])
    tvf_ref[:] = jnp.where(b2, uv.astype(jnp.int32)[:, None], tvf_ref[:])
    thf_ref[:] = jnp.where(b2, uh.astype(jnp.int32)[:, None], thf_ref[:])

    # Scout election on the last row.
    @pl.when(i == A - 1)
    def _():
        mf = m_ref[:].astype(jnp.int32)
        vf = v_ref[:].astype(jnp.int32)
        hf = h_ref[:].astype(jnp.int32)
        valid = jcol < rlen
        key = jnp.where(valid, mf * _JKEY + (_JKEY - 1 - jcol),
                        jnp.int32(-2 ** 31) + 1)
        best_key = jnp.max(key, axis=1)                  # (LANES,)
        row_sc = best_key >> 14                          # floor-div decode
        j_star = (_JKEY - 1) - (best_key - row_sc * _JKEY)
        sel = valid & (key == best_key[:, None])
        row_v = jnp.max(jnp.where(sel, vf, negs), axis=1)
        row_h = jnp.max(jnp.where(sel, hf, negs), axis=1)
        row_vf = row_v == row_sc
        row_hf = (~row_vf) & (row_h == row_sc)

        col_sc, col_i = tsc_ref[:, 0], ti_ref[:, 0]
        col_vf, col_hf = tvf_ref[:, 0] != 0, thf_ref[:, 0] != 0
        col_wins = col_sc > row_sc
        best_ref[:, 0] = jnp.where(col_wins, col_sc, row_sc)
        celli_ref[:, 0] = jnp.where(col_wins, col_i, alen[:, 0])
        cellj_ref[:, 0] = jnp.where(col_wins, rlen[:, 0], j_star)
        vflag_ref[:, 0] = jnp.where(col_wins, col_vf.astype(jnp.int32),
                                    row_vf.astype(jnp.int32))
        hflag_ref[:, 0] = jnp.where(col_wins, col_hf.astype(jnp.int32),
                                    row_hf.astype(jnp.int32))


def forward_pallas_impl(reads, read_lens, adapters, adapter_lens,
                        match, mismatch, gap_open, gap_ext):
    """Drop-in replacement for engine_v2._forward (bits come back as
    (A, B, L1p) with L1p >= L+1; the extra columns are padding the
    traceback never visits).

    reads (B, L) int8, adapters (B, A) int8; B must be a multiple of LANES.
    """
    B, L = reads.shape
    A = adapters.shape[1]
    L1p = _round_up(L + 1, 128)
    assert L1p <= MAX_L1P, (L1p, 'bucket too large for the pallas kernel')
    sdt, neg = _sdt_for(match, mismatch, gap_open, gap_ext, A)
    LANES = _lanes_for(B, L1p, sdt)
    assert B % LANES == 0, (B, LANES)

    # Pre-shift reads by one column: column j holds read[j-1].  Codes store
    # as int8 (values 0..4) and widen on load.
    reads_s = jnp.pad(reads.astype(jnp.int8), ((0, 0), (1, L1p - L - 1)),
                      constant_values=4)
    # Per-row adapter codes, blocked over the row grid axis: (A, B, 1).
    acodes = adapters.astype(jnp.int32).T[:, :, None]
    rlens = read_lens.astype(jnp.int32).reshape(B, 1)
    alens = adapter_lens.astype(jnp.int32).reshape(B, 1)

    kernel = functools.partial(
        _forward_kernel, A=A, L1p=L1p, LANES=LANES, match=match,
        mismatch=mismatch, gap_open=gap_open, gap_ext=gap_ext,
        sdt=sdt, neg=neg,
        window=_prefix_window(match, gap_open, gap_ext, A, L1p))

    out_shapes = (
        jax.ShapeDtypeStruct((A, B, L1p), jnp.uint8),     # bits
        jax.ShapeDtypeStruct((B, 1), jnp.int32),          # best score
        jax.ShapeDtypeStruct((B, 1), jnp.int32),          # cell_i
        jax.ShapeDtypeStruct((B, 1), jnp.int32),          # cell_j
        jax.ShapeDtypeStruct((B, 1), jnp.int32),          # vflag
        jax.ShapeDtypeStruct((B, 1), jnp.int32),          # hflag
    )

    def small():
        return pl.BlockSpec((LANES, 1), lambda b, i: (b, 0),
                            memory_space=pltpu.VMEM)

    bits, best, celli, cellj, vflag, hflag = pl.pallas_call(
        kernel,
        grid=(B // LANES, A),
        in_specs=[
            pl.BlockSpec((LANES, L1p), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            small(),
            small(),
            pl.BlockSpec((1, LANES, 1), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, LANES, L1p), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
            small(), small(), small(), small(), small(),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((LANES, L1p), sdt),
            pltpu.VMEM((LANES, L1p), sdt),
            pltpu.VMEM((LANES, L1p), sdt),
            pltpu.VMEM((LANES, 1), jnp.int32),
            pltpu.VMEM((LANES, 1), jnp.int32),
            pltpu.VMEM((LANES, 1), jnp.int32),
            pltpu.VMEM((LANES, 1), jnp.int32),
        ],
        # The DP scratch is 3 score-dtype rows of L1p per lane block (~6.3 MB
        # at the 16k cap in int32) — over Mosaic's default 16 MB scoped-VMEM
        # budget once block double-buffering is added, but far under the
        # 128 MB chip VMEM.  Raise the cap; actual usage stays bounded by
        # MAX_L1P.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(reads_s, alens, rlens, acodes)
    return (bits, best[:, 0], celli[:, 0], cellj[:, 0],
            vflag[:, 0] != 0, hflag[:, 0] != 0)


forward_pallas = jax.jit(forward_pallas_impl, static_argnums=(4, 5, 6, 7))


# ---------------------------------------------------------------------------
# Column-tiled variant: arbitrary read length (nanopore reads reach ~1 Mb).
#
# Grid (B/LANES, n_tiles, A) with the adapter-row axis innermost and tiles
# left-to-right.  The DP rows live in VMEM for the current tile only; what
# crosses tiles is one small per-(lane, row) carry record, exactly the
# quantities the recurrences read from column c0-1 / c0:
#   cm[i]  = M(i, c1-1)            (next tile's diagonal for row i+1 and
#                                   h-chain start for row i)
#   ch[i]  = H(i, c1) = max(H(i, c1-1)+ext, pre(i, c1-1)+open)
#            (the H value at the next tile's first column; extending it by
#             t*ext dominates every opening left of the tile, so the in-tile
#             prefix-max trick stays exact)
#   cb[i]  = the t=0 H_EXT trace bit of the next tile
#            (= H(c1-1)+ext >= M(c1-1)+open, row i's own edge)
# double-buffered on tile parity because row i+1 consumes row i's edge from
# the PREVIOUS tile after row i has already written this tile's.
# Frozen rows (i > adapter_len) carry their stored (frozen) edges; their
# consumers are all frozen too, so the values only need to be defined.
# The last-row scout keeps its leftmost-max key trick per tile (local t
# fits 2^14) and folds tiles left-to-right with a strict >, which preserves
# the global leftmost-first-maximum election.
# ---------------------------------------------------------------------------

TILE_T = 2048          # columns per tile: ~15 int32 temps x (LANES, T) fits


def _tiled_kernel(reads_ref, alens_ref, rlens_ref, acode_ref,
                  bits_ref, best_ref, celli_ref, cellj_ref,
                  vflag_ref, hflag_ref,
                  m_ref, v_ref, h_ref,
                  cm_ref, ch_ref, cb_ref,
                  tsc_ref, ti_ref, tvf_ref, thf_ref,
                  rsc_ref, rj_ref, rvf_ref, rhf_ref,
                  *, A, T, NT, LANES, match, mismatch, gap_open, gap_ext,
                  sdt, neg, window):
    """Grid program (b, tile, i): DP row i+1 over columns [tile*T, +T).

    cm/ch_ref: (LANES, 2*AP) int32 — tile-edge carries, parity-buffered
               (slot p*AP + i); AP = A+1 rounded up to 128.  Values live in
               the sdt range (H clamped at `neg`), so the int32<->sdt casts
               at the edges are lossless.
    cb_ref:    (LANES, 2*AP) int32 — carried t=0 H_EXT bit.
    rsc/rj/rvf/rhf_ref: (LANES, 1) int32 — running last-row scout.
    Everything else matches _forward_kernel.
    """
    tile = pl.program_id(1)
    i = pl.program_id(2)
    row = i + 1
    AP = cm_ref.shape[1] // 2
    p_old = (tile % 2) * AP
    p_new = ((tile + 1) % 2) * AP
    jloc = lax.broadcasted_iota(jnp.int32, (LANES, T), 1)
    jcol = jloc + tile * T                              # global column
    rlen = rlens_ref[:, 0][:, None]
    alen = alens_ref[:, 0][:, None]
    col_is_len = jcol == rlen
    col0 = jcol == 0
    t0col = jloc == 0
    negs = jnp.int32(neg)
    slot = lax.broadcasted_iota(jnp.int32, (LANES, 2 * AP), 1)

    @pl.when((tile == 0) & (i == 0))
    def _():
        # Column-0 boundary: M(i, 0) = 0, H(i, 0) = neg for every row.
        cm_ref[:] = jnp.zeros((LANES, 2 * AP), jnp.int32)
        ch_ref[:] = jnp.full((LANES, 2 * AP), neg, jnp.int32)
        cb_ref[:] = jnp.zeros((LANES, 2 * AP), jnp.int32)
        tsc_ref[:] = jnp.zeros((LANES, 1), jnp.int32)
        ti_ref[:] = jnp.zeros((LANES, 1), jnp.int32)
        tvf_ref[:] = jnp.zeros((LANES, 1), jnp.int32)
        thf_ref[:] = jnp.zeros((LANES, 1), jnp.int32)
        rsc_ref[:] = jnp.zeros((LANES, 1), jnp.int32)   # M(last row, 0) = 0
        rj_ref[:] = jnp.zeros((LANES, 1), jnp.int32)
        rvf_ref[:] = jnp.zeros((LANES, 1), jnp.int32)
        rhf_ref[:] = jnp.zeros((LANES, 1), jnp.int32)

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.zeros((LANES, T), sdt)           # row 0 of this tile
        v_ref[:] = jnp.full((LANES, T), neg, sdt)
        h_ref[:] = jnp.full((LANES, T), neg, sdt)

    def carry_read(ref, idx):
        sel = slot == (p_old + idx)
        return jnp.max(jnp.where(sel, ref[:], jnp.int32(-2 ** 31)), axis=1)

    m = m_ref[:].astype(jnp.int32)                      # int16 at rest,
    v = v_ref[:].astype(jnp.int32)                      # int32 in flight
    a_code = acode_ref[0].astype(jnp.int32)             # (LANES, 1)

    # V matrix.
    v_ext = v + gap_ext
    v_open = m + gap_open
    vbit = v_ext >= v_open
    nv = jnp.where(vbit, v_ext, v_open)
    nv = jnp.where(col0, negs, nv)

    # Diagonal: within-tile shift; t=0 takes row i-1's previous-tile edge.
    eq = reads_ref[:].astype(jnp.int32) == a_code
    sub = jnp.where(eq, match, mismatch)
    cm_im1 = carry_read(cm_ref, i)[:, None]             # M(i-1, c0-1)
    m_shift = pltpu.roll(m, 1, 1)
    d = jnp.where(t0col, cm_im1, m_shift) + sub
    d = jnp.where(col0, negs, d)

    pre = jnp.maximum(d, nv)
    pre = jnp.where(col0, 0, pre)

    # H row: in-tile prefix max of f, chained through the tile-entry carry
    # ch = H(i, c0); t = 0 takes the carry itself.  The in-tile prefix
    # window is bounded by the provable optimal-path gap-run cap (see the
    # transposed-kernel note before _prefix_window): an in-tile opening
    # more than `window` columns back implies a run longer than the cap,
    # which is strictly beaten by simply ending at the run start (free end
    # gaps) — so truncated H values never sit on, or tie into, an elected
    # path, and every H value the walker consults along an elected path is
    # within the window and therefore exact.  The carry path (ch_in,
    # openings in earlier tiles) stays exact and unwindowed — its own
    # truncations from prior tiles are covered by the same argument.
    # 11 -> 6 passes at T=2048 with the default scheme.
    ch_in = carry_read(ch_ref, row)[:, None]            # H(i, c0)
    f = pre + gap_open - (jloc + 1) * gap_ext
    n_pass = max(1, (min(window, T) - 1).bit_length())
    cum = f
    for k in range(n_pass):
        sh = 1 << k
        rolled = pltpu.roll(cum, sh, 1)
        rolled = jnp.where(jloc < sh, negs, rolled)
        cum = jnp.maximum(cum, rolled)
    cum_shift = pltpu.roll(cum, 1, 1)
    body_h = jnp.maximum(cum_shift, ch_in) + jloc * gap_ext
    nh = jnp.where(t0col, ch_in, body_h)
    nh = jnp.where(col0, negs, nh)
    nh = jnp.maximum(nh, negs)         # storage floor (exact, see NEG16)

    nm = jnp.maximum(pre, nh)
    nm = jnp.where(col0, 0, nm)

    # Trace bits; the t=0 H_EXT bit was computed by the previous tile.
    # (int32 throughout — mixing bool branches in where() makes Mosaic
    # emit an unsupported i8->i1 truncation.)
    nh_shift = pltpu.roll(nh, 1, 1)
    nm_shift = pltpu.roll(nm, 1, 1)
    cb_in = carry_read(cb_ref, row)[:, None]            # 0/1 int32
    hb_body = (nh_shift + gap_ext >= nm_shift + gap_open).astype(jnp.int32)
    hbit32 = jnp.where(t0col, cb_in, hb_body)
    hbit32 = jnp.where(col0, 0, hbit32)
    dbit = d >= jnp.maximum(nv, nh)
    mvbit = nv >= nh
    bits32 = (hbit32 + vbit.astype(jnp.int32) * 2
              + dbit.astype(jnp.int32) * 4 + mvbit.astype(jnp.int32) * 8
              + jnp.where(col0, 0, eq.astype(jnp.int32)) * 16)
    bits_ref[0] = bits32.astype(jnp.uint8)

    active = row <= alen
    m_out = jnp.where(active, nm, m)
    v_out = jnp.where(active, nv, v)
    h_out = jnp.where(active, nh, h_ref[:].astype(jnp.int32))
    m_ref[:] = m_out.astype(sdt)
    v_ref[:] = v_out.astype(sdt)
    h_ref[:] = h_out.astype(sdt)

    # Carries for the next tile (stored values => frozen rows carry frozen
    # edges; their consumers are frozen too).
    m_last = m_out[:, T - 1]
    h_last = h_out[:, T - 1]
    pre_last = jnp.where(active[:, 0], pre[:, T - 1],
                         m_last + 0)        # frozen: value unused downstream
    ch_next = jnp.maximum(jnp.maximum(h_last + gap_ext,
                                      pre_last + gap_open), neg)
    cb_next = (h_last + gap_ext >= m_last + gap_open).astype(jnp.int32)
    wsel = slot == (p_new + row)
    cm_ref[:] = jnp.where(wsel, m_last[:, None], cm_ref[:])
    ch_ref[:] = jnp.where(wsel, ch_next[:, None], ch_ref[:])
    cb_ref[:] = jnp.where(wsel, cb_next[:, None], cb_ref[:])

    @pl.when(i == 0)
    def _():
        # Row-0 edges for the next tile: M(0, j) = 0, H(0, j) = neg.
        wsel0 = slot == (p_new + 0)
        cm_ref[:] = jnp.where(wsel0, 0, cm_ref[:])
        ch_ref[:] = jnp.where(wsel0, neg, ch_ref[:])
        cb_ref[:] = jnp.where(wsel0, 0, cb_ref[:])

    # Final-column scout (lanes whose read ends inside this tile).
    cand_m = jnp.max(jnp.where(col_is_len, nm, negs), axis=1)
    cand_v = jnp.max(jnp.where(col_is_len, nv, negs), axis=1)
    cand_h = jnp.max(jnp.where(col_is_len, nh, negs), axis=1)
    act1 = active[:, 0]
    better = act1 & (cand_m > tsc_ref[:, 0])
    uv = cand_v == cand_m
    uh = (~uv) & (cand_h == cand_m)
    b2 = better[:, None]
    tsc_ref[:] = jnp.where(b2, cand_m[:, None], tsc_ref[:])
    ti_ref[:] = jnp.where(b2, row, ti_ref[:])
    tvf_ref[:] = jnp.where(b2, uv.astype(jnp.int32)[:, None], tvf_ref[:])
    thf_ref[:] = jnp.where(b2, uh.astype(jnp.int32)[:, None], thf_ref[:])

    # Last-row scout: fold this tile's leftmost max into the running one.
    @pl.when(i == A - 1)
    def _():
        mf = m_ref[:].astype(jnp.int32)
        vf_ = v_ref[:].astype(jnp.int32)
        hf_ = h_ref[:].astype(jnp.int32)
        valid = jcol < rlen
        key = jnp.where(valid, mf * _JKEY + (_JKEY - 1 - jloc),
                        jnp.int32(-2 ** 31) + 1)
        best_key = jnp.max(key, axis=1)
        t_sc = best_key >> 14
        t_loc = (_JKEY - 1) - (best_key - t_sc * _JKEY)
        sel = valid & (key == best_key[:, None])
        t_v = jnp.max(jnp.where(sel, vf_, negs), axis=1)
        t_h = jnp.max(jnp.where(sel, hf_, negs), axis=1)
        any_valid = jnp.any(valid, axis=1)
        better_r = any_valid & (t_sc > rsc_ref[:, 0])
        br2 = better_r[:, None]
        rsc_ref[:] = jnp.where(br2, t_sc[:, None], rsc_ref[:])
        rj_ref[:] = jnp.where(br2, (t_loc + tile * T)[:, None], rj_ref[:])
        rvf_ref[:] = jnp.where(br2, (t_v == t_sc).astype(jnp.int32)[:, None],
                               rvf_ref[:])
        rhf_ref[:] = jnp.where(
            br2, ((t_v != t_sc) & (t_h == t_sc)).astype(jnp.int32)[:, None],
            rhf_ref[:])

    # Election at the very end.
    @pl.when((tile == NT - 1) & (i == A - 1))
    def _():
        col_sc, col_i = tsc_ref[:, 0], ti_ref[:, 0]
        col_vf, col_hf = tvf_ref[:, 0] != 0, thf_ref[:, 0] != 0
        row_sc = rsc_ref[:, 0]
        col_wins = col_sc > row_sc
        best_ref[:, 0] = jnp.where(col_wins, col_sc, row_sc)
        celli_ref[:, 0] = jnp.where(col_wins, col_i, alen[:, 0])
        cellj_ref[:, 0] = jnp.where(col_wins, rlen[:, 0], rj_ref[:, 0])
        vflag_ref[:, 0] = jnp.where(col_wins, col_vf.astype(jnp.int32),
                                    rvf_ref[:, 0])
        hflag_ref[:, 0] = jnp.where(col_wins, col_hf.astype(jnp.int32),
                                    rhf_ref[:, 0])


def forward_pallas_tiled_impl(reads, read_lens, adapters, adapter_lens,
                              match, mismatch, gap_open, gap_ext):
    """Column-tiled forward for reads longer than the single-tile kernel's
    16 K cap; same outputs as forward_pallas_impl with L1p = NT * TILE_T."""
    B, L = reads.shape
    A = adapters.shape[1]
    T = TILE_T
    NT = (L + 1 + T - 1) // T
    L1p = NT * T
    sdt, neg = _sdt_for(match, mismatch, gap_open, gap_ext, A)
    LANES = _lanes_for(B, T, sdt)
    assert B % LANES == 0, (B, LANES)
    AP = _round_up(A + 1, 128)

    reads_s = jnp.pad(reads.astype(jnp.int8), ((0, 0), (1, L1p - L - 1)),
                      constant_values=4)
    acodes = adapters.astype(jnp.int32).T[:, :, None]
    rlens = read_lens.astype(jnp.int32).reshape(B, 1)
    alens = adapter_lens.astype(jnp.int32).reshape(B, 1)

    kernel = functools.partial(
        _tiled_kernel, A=A, T=T, NT=NT, LANES=LANES, match=match,
        mismatch=mismatch, gap_open=gap_open, gap_ext=gap_ext,
        sdt=sdt, neg=neg,
        window=_prefix_window(match, gap_open, gap_ext, A, T))

    out_shapes = (
        jax.ShapeDtypeStruct((A, B, L1p), jnp.uint8),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
    )

    def small():
        return pl.BlockSpec((LANES, 1), lambda b, t, i: (b, 0),
                            memory_space=pltpu.VMEM)

    bits, best, celli, cellj, vflag, hflag = pl.pallas_call(
        kernel,
        grid=(B // LANES, NT, A),
        in_specs=[
            pl.BlockSpec((LANES, T), lambda b, t, i: (b, t),
                         memory_space=pltpu.VMEM),
            small(),
            small(),
            pl.BlockSpec((1, LANES, 1), lambda b, t, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, LANES, T), lambda b, t, i: (i, b, t),
                         memory_space=pltpu.VMEM),
            small(), small(), small(), small(), small(),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((LANES, T), sdt),
            pltpu.VMEM((LANES, T), sdt),
            pltpu.VMEM((LANES, T), sdt),
            pltpu.VMEM((LANES, 2 * AP), jnp.int32),
            pltpu.VMEM((LANES, 2 * AP), jnp.int32),
            pltpu.VMEM((LANES, 2 * AP), jnp.int32),
            pltpu.VMEM((LANES, 1), jnp.int32),
            pltpu.VMEM((LANES, 1), jnp.int32),
            pltpu.VMEM((LANES, 1), jnp.int32),
            pltpu.VMEM((LANES, 1), jnp.int32),
            pltpu.VMEM((LANES, 1), jnp.int32),
            pltpu.VMEM((LANES, 1), jnp.int32),
            pltpu.VMEM((LANES, 1), jnp.int32),
            pltpu.VMEM((LANES, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(reads_s, alens, rlens, acodes)
    return (bits, best[:, 0], celli[:, 0], cellj[:, 0],
            vflag[:, 0] != 0, hflag[:, 0] != 0)


forward_pallas_tiled = jax.jit(forward_pallas_tiled_impl,
                               static_argnums=(4, 5, 6, 7))


def supports_shape_tiled(B, L, A) -> bool:
    """Tiled-kernel applicability: lane alignment, the last-row key trick
    per tile (always satisfied: t < TILE_T <= 2^14), and the traceback's
    flat int32 indexing bound."""
    NT = (L + 1 + TILE_T - 1) // TILE_T
    lanes = _lanes_for(B, TILE_T)
    return B % lanes == 0 and A * B * NT * TILE_T < 2 ** 31


def supports_shape(B, L, A) -> bool:
    return B % LANES == 0 and _round_up(L + 1, 128) <= MAX_L1P


# ---------------------------------------------------------------------------
# Stat-carrying variant: the detection phase consumes ONLY the best
# full-adapter %identity per (set, side) group (reference
# porechop/src/alignment.cpp:84-90, nanopore_read.py:155-164), i.e. per lane
# just (matches, full_len).  The bitmap kernel pays a 1 byte/cell HBM write
# (~0.8 GB per detection launch) plus a separate HBM-random traceback walk
# to recover them; this kernel instead PROPAGATES the two quantities through
# the forward DP — SeqAn-traceback-equivalent tie-breaking at every
# selection — and emits only (B,) scalars.  No bits, no walk.
#
# Per-state payload, packed into one int32 plane per DP matrix:
#     P = mat * 2^15 + (g + 2^14)
#   mat = diagonal match count along the walker's path to this state;
#   g   = read-only (horizontal-gap) path columns at adapter rows < alen —
#         exactly the gap columns inside the full-adapter span.  With the
#         free tails appended (finish_v2 semantics, alignment.cpp:26-121):
#     full_len = alen + g + (cell_i < alen ? rlen - cell_j : 0)
#   (all alen adapter bases appear as columns; g read-only columns sit
#   strictly inside the span because adapter rows remain below them; a read
#   tail lands inside the span iff an adapter tail follows it; trailing gap
#   columns at row == alen fall outside the span and are never counted.)
#   Field bounds: g <= L <= 2^14 - 1 (enforced by MAX_L1P), mat <= A <= 512,
#   so P < 2^25; the prefix-max carry P - w*k keeps the g field >= 1.
#
# Payload selection mirrors the walker's tie-breaking (ops/spec.py):
#   V: extension >= opening;  pre: diagonal >= vertical;
#   M: pre >= H (diagonal beats gaps, vertical beats horizontal);
#   H prefix-max: ties keep the SMALLEST opening column (longest run);
#   scout start cell: V==M -> V payload, elif H==M -> H payload, else M.
# ---------------------------------------------------------------------------

_PAY_G_BIAS = 1 << 14
_PAY_MAT = 1 << 15


def _stats_kernel(reads_ref, alens_ref, rlens_ref, acode_ref,
                  best_ref, celli_ref, cellj_ref, pay_ref,
                  m_ref, v_ref, h_ref, pm_ref, pv_ref, ph_ref,
                  tsc_ref, ti_ref, tpay_ref,
                  *, A, L1p, LANES, match, mismatch, gap_open, gap_ext,
                  sdt, neg, window):
    """Grid program (b, i): DP row i+1 for lane block b; same scores/scout
    as _forward_kernel, payload planes instead of trace bits."""
    i = pl.program_id(1)
    row = i + 1
    jcol = lax.broadcasted_iota(jnp.int32, (LANES, L1p), 1)
    rlen = rlens_ref[:, 0][:, None]
    alen = alens_ref[:, 0][:, None]
    col_is_len = jcol == rlen
    col0 = jcol == 0
    negs = jnp.int32(neg)
    P0 = jnp.int32(_PAY_G_BIAS)                  # (mat=0, g=0)
    PNEG = jnp.int32(-2 ** 31 + 1)

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.zeros((LANES, L1p), sdt)
        v_ref[:] = jnp.full((LANES, L1p), neg, sdt)
        h_ref[:] = jnp.full((LANES, L1p), neg, sdt)
        pm_ref[:] = jnp.full((LANES, L1p), P0, jnp.int32)
        pv_ref[:] = jnp.full((LANES, L1p), P0, jnp.int32)
        ph_ref[:] = jnp.full((LANES, L1p), P0, jnp.int32)
        tsc_ref[:] = jnp.zeros((LANES, 1), jnp.int32)   # col best=M(0,len)=0
        ti_ref[:] = jnp.zeros((LANES, 1), jnp.int32)
        tpay_ref[:] = jnp.full((LANES, 1), P0, jnp.int32)

    m = m_ref[:].astype(jnp.int32)
    v = v_ref[:].astype(jnp.int32)
    pm = pm_ref[:]
    pv = pv_ref[:]
    a_code = acode_ref[0].astype(jnp.int32)

    # V matrix (payload: extension >= opening).
    v_ext = v + gap_ext
    v_open = m + gap_open
    vbit = v_ext >= v_open
    nv = jnp.where(vbit, v_ext, v_open)
    nv = jnp.where(col0, negs, nv)
    npv = jnp.where(vbit, pv, pm)

    # Diagonal (payload: previous-row M shifted, +1 match on equal codes).
    eq = reads_ref[:].astype(jnp.int32) == a_code
    sub = jnp.where(eq, match, mismatch)
    m_shift = pltpu.roll(m, 1, 1)
    pm_shift = pltpu.roll(pm, 1, 1)
    d = jnp.where(col0, negs, m_shift + sub)
    pd = pm_shift + jnp.where(eq, _PAY_MAT, 0)

    # pre = max(diag, V), diagonal wins ties; boundary col = fresh start.
    dwin = d >= nv
    pre = jnp.where(dwin, d, nv)
    ppre = jnp.where(dwin, pd, npv)
    pre = jnp.where(col0, 0, pre)
    ppre = jnp.where(col0, P0, ppre)

    # H row: prefix max over opening points, carrying the opener's payload;
    # ties keep the earlier (rolled) opener = the longest run.  w = 1 while
    # this row's gap columns sit inside the adapter span (row < alen).
    w = (row <= alen - 1).astype(jnp.int32)                # (LANES, 1)
    f = pre + gap_open - (jcol + 1) * gap_ext
    fp = ppre - w * jcol                                   # payload carry
    n_pass = max(1, (window - 1).bit_length())             # gap-run bound
    cum, cump = f, fp
    for k in range(n_pass):
        sh = 1 << k
        rolled = pltpu.roll(cum, sh, 1)
        rolled = jnp.where(jcol < sh, negs, rolled)
        rolledp = pltpu.roll(cump, sh, 1)
        take = rolled >= cum                               # earlier k wins ties
        cum = jnp.where(take, rolled, cum)
        cump = jnp.where(take, rolledp, cump)
    cum_shift = pltpu.roll(cum, 1, 1)
    cump_shift = pltpu.roll(cump, 1, 1)
    nh = jnp.where(col0, negs, cum_shift + jcol * gap_ext)
    nh = jnp.maximum(nh, negs)         # storage floor (exact, see NEG16)
    nph = jnp.where(col0, P0, cump_shift + w * jcol)

    # M (payload: pre >= H keeps diagonal/vertical, else horizontal).
    prewin = pre >= nh
    nm = jnp.where(prewin, pre, nh)
    nm = jnp.where(col0, 0, nm)
    npm = jnp.where(prewin, ppre, nph)
    npm = jnp.where(col0, P0, npm)

    # Freeze lanes whose adapter already ended.
    active = row <= alen
    m_ref[:] = jnp.where(active, nm, m).astype(sdt)
    v_ref[:] = jnp.where(active, nv, v).astype(sdt)
    h_ref[:] = jnp.where(active, nh,
                         h_ref[:].astype(jnp.int32)).astype(sdt)
    pm_ref[:] = jnp.where(active, npm, pm)
    pv_ref[:] = jnp.where(active, npv, pv)
    ph_ref[:] = jnp.where(active, nph, ph_ref[:])

    # Final-column scout candidate (payload from the walker's start state:
    # V==M -> V, elif H==M -> H, else M).
    cand_m = jnp.max(jnp.where(col_is_len, nm, negs), axis=1)
    cand_v = jnp.max(jnp.where(col_is_len, nv, negs), axis=1)
    cand_h = jnp.max(jnp.where(col_is_len, nh, negs), axis=1)
    cpm = jnp.max(jnp.where(col_is_len, npm, PNEG), axis=1)
    cpv = jnp.max(jnp.where(col_is_len, npv, PNEG), axis=1)
    cph = jnp.max(jnp.where(col_is_len, nph, PNEG), axis=1)
    uv = cand_v == cand_m
    uh = (~uv) & (cand_h == cand_m)
    cand_p = jnp.where(uv, cpv, jnp.where(uh, cph, cpm))
    act1 = active[:, 0]
    better = act1 & (cand_m > tsc_ref[:, 0])
    b2 = better[:, None]
    tsc_ref[:] = jnp.where(b2, cand_m[:, None], tsc_ref[:])
    ti_ref[:] = jnp.where(b2, row, ti_ref[:])
    tpay_ref[:] = jnp.where(b2, cand_p[:, None], tpay_ref[:])

    # Scout election on the last row.
    @pl.when(i == A - 1)
    def _():
        mf = m_ref[:].astype(jnp.int32)
        vf = v_ref[:].astype(jnp.int32)
        hf = h_ref[:].astype(jnp.int32)
        valid = jcol < rlen
        key = jnp.where(valid, mf * _JKEY + (_JKEY - 1 - jcol),
                        jnp.int32(-2 ** 31) + 1)
        best_key = jnp.max(key, axis=1)
        row_sc = best_key >> 14
        j_star = (_JKEY - 1) - (best_key - row_sc * _JKEY)
        sel = valid & (key == best_key[:, None])
        row_v = jnp.max(jnp.where(sel, vf, negs), axis=1)
        row_h = jnp.max(jnp.where(sel, hf, negs), axis=1)
        rpm = jnp.max(jnp.where(sel, pm_ref[:], PNEG), axis=1)
        rpv = jnp.max(jnp.where(sel, pv_ref[:], PNEG), axis=1)
        rph = jnp.max(jnp.where(sel, ph_ref[:], PNEG), axis=1)
        row_uv = row_v == row_sc
        row_uh = (~row_uv) & (row_h == row_sc)
        row_p = jnp.where(row_uv, rpv, jnp.where(row_uh, rph, rpm))

        col_sc, col_i = tsc_ref[:, 0], ti_ref[:, 0]
        col_wins = col_sc > row_sc
        best_ref[:, 0] = jnp.where(col_wins, col_sc, row_sc)
        celli_ref[:, 0] = jnp.where(col_wins, col_i, alen[:, 0])
        cellj_ref[:, 0] = jnp.where(col_wins, rlen[:, 0], j_star)
        pay_ref[:, 0] = jnp.where(col_wins, tpay_ref[:, 0], row_p)


def forward_stats_pallas_impl(reads, read_lens, adapters, adapter_lens,
                              match, mismatch, gap_open, gap_ext):
    """Stat-carrying forward: returns (best_sc, cell_i, cell_j, matches,
    full_len) — (B,) int32 device arrays, free-tail terms already applied.
    Same shape constraints as forward_pallas_impl (supports_shape)."""
    B, L = reads.shape
    A = adapters.shape[1]
    L1p = _round_up(L + 1, 128)
    assert L1p <= MAX_L1P, (L1p, 'bucket too large for the pallas kernel')
    sdt, neg = _sdt_for(match, mismatch, gap_open, gap_ext, A)
    LANES = _lanes_for(B, L1p, sdt)
    assert B % LANES == 0, (B, LANES)

    reads_s = jnp.pad(reads.astype(jnp.int8), ((0, 0), (1, L1p - L - 1)),
                      constant_values=4)
    acodes = adapters.astype(jnp.int32).T[:, :, None]
    rlens = read_lens.astype(jnp.int32).reshape(B, 1)
    alens = adapter_lens.astype(jnp.int32).reshape(B, 1)

    kernel = functools.partial(
        _stats_kernel, A=A, L1p=L1p, LANES=LANES, match=match,
        mismatch=mismatch, gap_open=gap_open, gap_ext=gap_ext,
        sdt=sdt, neg=neg,
        window=_prefix_window(match, gap_open, gap_ext, A, L1p))

    out_shapes = tuple(jax.ShapeDtypeStruct((B, 1), jnp.int32)
                       for _ in range(4))      # best, cell_i, cell_j, pay

    def small():
        return pl.BlockSpec((LANES, 1), lambda b, i: (b, 0),
                            memory_space=pltpu.VMEM)

    best, celli, cellj, pay = pl.pallas_call(
        kernel,
        grid=(B // LANES, A),
        in_specs=[
            pl.BlockSpec((LANES, L1p), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            small(),
            small(),
            pl.BlockSpec((1, LANES, 1), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(small(), small(), small(), small()),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((LANES, L1p), sdt),
            pltpu.VMEM((LANES, L1p), sdt),
            pltpu.VMEM((LANES, L1p), sdt),
            pltpu.VMEM((LANES, L1p), jnp.int32),
            pltpu.VMEM((LANES, L1p), jnp.int32),
            pltpu.VMEM((LANES, L1p), jnp.int32),
            pltpu.VMEM((LANES, 1), jnp.int32),
            pltpu.VMEM((LANES, 1), jnp.int32),
            pltpu.VMEM((LANES, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(reads_s, alens, rlens, acodes)
    best = best[:, 0]
    celli = celli[:, 0]
    cellj = cellj[:, 0]
    pay = pay[:, 0]
    mat = pay >> 15
    g = (pay & (_PAY_MAT - 1)) - _PAY_G_BIAS
    al32 = adapter_lens.astype(jnp.int32)
    rl32 = read_lens.astype(jnp.int32)
    full_len = al32 + g + jnp.where(celli < al32, rl32 - cellj, 0)
    return best, celli, cellj, mat, full_len


forward_stats_pallas = jax.jit(forward_stats_pallas_impl,
                               static_argnums=(4, 5, 6, 7))


# ---------------------------------------------------------------------------
# Transposed (column-major) stats kernel: columns in the SUBLANE dimension.
#
# The lane-major kernels put DP columns in the lane dimension, whose tile is
# 128 wide — a 150-bp detection window pads 151 -> 256 columns, a 41% tax on
# every op (BASELINE.md roofline).  Sublane tiles are 8 wide (32 for int8),
# so the same window pads 151 -> 160: the whole tax collapses to 6%.  Lanes
# (the huge batch axis) move to the lane dimension, where padding is free.
#
# Second lever: a provable cap on horizontal-run length.  With free end
# gaps, a path containing an H-run of g columns at adapter row i scores
#   prefix - (|open| + (g-1)|ext|) + suffix,   suffix <= match*(alen-i),
# while simply ENDING at the run's start cell (free end gaps!) scores
# `prefix`.  So any run with |open| + (g-1)|ext| > match*(alen-1) is
# strictly suboptimal — it can never lie on (or tie into) an elected path,
# and the H prefix-max only needs a window of
#   g_max = 1 + (match*(A-1) - |open|) / |ext|
# columns: ceil(log2(g_max)) passes instead of ceil(log2(L1p)).  Truncated
# H values are only ever <= the true ones and belong to strictly
# suboptimal paths, so no election, tie-break, or trace decision on an
# elected path can change (every H value consulted along an elected path
# is itself elected and therefore within the window).  Fuzzed against the
# full-window engines in tests/test_kernel_pallas.py, including
# adversarial long-gap constructions.
# ---------------------------------------------------------------------------


def _prefix_window(match, gap_open, gap_ext, A, L1p):
    """Columns of H prefix-max window that can influence any elected path
    (see note above); margin +2 for the open column and tie inclusion."""
    if match <= 0:
        return L1p
    g = 1 + (match * (A - 1) + abs(gap_open)) // abs(gap_ext) + 2
    return min(int(g), L1p)


def _stats_kernel_t(reads_ref, alens_ref, rlens_ref, acode_ref,
                    best_ref, celli_ref, cellj_ref, pay_ref,
                    m_ref, v_ref, h_ref, pm_ref, pv_ref, ph_ref,
                    tsc_ref, ti_ref, tpay_ref,
                    *, A, L1p, LANES, match, mismatch, gap_open, gap_ext,
                    window):
    """Grid program (b, i): DP row i+1 for lane block b, columns in
    sublanes.  reads_ref (L1p, LANES) int8 pre-shifted; per-lane vectors
    (1, LANES); outputs (1, LANES); scratch (L1p, LANES) int32."""
    i = pl.program_id(1)
    row = i + 1
    jcol = lax.broadcasted_iota(jnp.int32, (L1p, LANES), 0)
    rlen = rlens_ref[0, :][None, :]
    alen = alens_ref[0, :][None, :]
    col_is_len = jcol == rlen
    col0 = jcol == 0
    negs = jnp.int32(NEG)
    P0 = jnp.int32(_PAY_G_BIAS)
    PNEG = jnp.int32(-2 ** 31 + 1)

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.zeros((L1p, LANES), jnp.int32)
        v_ref[:] = jnp.full((L1p, LANES), NEG, jnp.int32)
        h_ref[:] = jnp.full((L1p, LANES), NEG, jnp.int32)
        pm_ref[:] = jnp.full((L1p, LANES), P0, jnp.int32)
        pv_ref[:] = jnp.full((L1p, LANES), P0, jnp.int32)
        ph_ref[:] = jnp.full((L1p, LANES), P0, jnp.int32)
        tsc_ref[:] = jnp.zeros((1, LANES), jnp.int32)
        ti_ref[:] = jnp.zeros((1, LANES), jnp.int32)
        tpay_ref[:] = jnp.full((1, LANES), P0, jnp.int32)

    m = m_ref[:]
    v = v_ref[:]
    pm = pm_ref[:]
    pv = pv_ref[:]
    a_code = acode_ref[0].astype(jnp.int32)              # (1, LANES)

    v_ext = v + gap_ext
    v_open = m + gap_open
    vbit = v_ext >= v_open
    nv = jnp.where(vbit, v_ext, v_open)
    nv = jnp.where(col0, negs, nv)
    npv = jnp.where(vbit, pv, pm)

    eq = reads_ref[:].astype(jnp.int32) == a_code
    sub = jnp.where(eq, match, mismatch)
    m_shift = pltpu.roll(m, 1, 0)
    pm_shift = pltpu.roll(pm, 1, 0)
    d = jnp.where(col0, negs, m_shift + sub)
    pd = pm_shift + jnp.where(eq, _PAY_MAT, 0)

    dwin = d >= nv
    pre = jnp.where(dwin, d, nv)
    ppre = jnp.where(dwin, pd, npv)
    pre = jnp.where(col0, 0, pre)
    ppre = jnp.where(col0, P0, ppre)

    w = (row <= alen - 1).astype(jnp.int32)              # (1, LANES)
    f = pre + gap_open - (jcol + 1) * gap_ext
    fp = ppre - w * jcol
    n_pass = max(1, (window - 1).bit_length())
    cum, cump = f, fp
    for k in range(n_pass):
        sh = 1 << k
        rolled = pltpu.roll(cum, sh, 0)
        rolled = jnp.where(jcol < sh, negs, rolled)
        rolledp = pltpu.roll(cump, sh, 0)
        take = rolled >= cum
        cum = jnp.where(take, rolled, cum)
        cump = jnp.where(take, rolledp, cump)
    cum_shift = pltpu.roll(cum, 1, 0)
    cump_shift = pltpu.roll(cump, 1, 0)
    nh = jnp.where(col0, negs, cum_shift + jcol * gap_ext)
    nh = jnp.maximum(nh, negs)
    nph = jnp.where(col0, P0, cump_shift + w * jcol)

    prewin = pre >= nh
    nm = jnp.where(prewin, pre, nh)
    nm = jnp.where(col0, 0, nm)
    npm = jnp.where(prewin, ppre, nph)
    npm = jnp.where(col0, P0, npm)

    active = row <= alen                                 # (1, LANES)
    m_ref[:] = jnp.where(active, nm, m)
    v_ref[:] = jnp.where(active, nv, v)
    h_ref[:] = jnp.where(active, nh, h_ref[:])
    pm_ref[:] = jnp.where(active, npm, pm)
    pv_ref[:] = jnp.where(active, npv, pv)
    ph_ref[:] = jnp.where(active, nph, ph_ref[:])

    cand_m = jnp.max(jnp.where(col_is_len, nm, negs), axis=0)   # (LANES,)
    cand_v = jnp.max(jnp.where(col_is_len, nv, negs), axis=0)
    cand_h = jnp.max(jnp.where(col_is_len, nh, negs), axis=0)
    cpm = jnp.max(jnp.where(col_is_len, npm, PNEG), axis=0)
    cpv = jnp.max(jnp.where(col_is_len, npv, PNEG), axis=0)
    cph = jnp.max(jnp.where(col_is_len, nph, PNEG), axis=0)
    uv = cand_v == cand_m
    uh = (~uv) & (cand_h == cand_m)
    cand_p = jnp.where(uv, cpv, jnp.where(uh, cph, cpm))
    act1 = active[0, :]
    better = act1 & (cand_m > tsc_ref[0, :])
    b2 = better[None, :]
    tsc_ref[:] = jnp.where(b2, cand_m[None, :], tsc_ref[:])
    ti_ref[:] = jnp.where(b2, row, ti_ref[:])
    tpay_ref[:] = jnp.where(b2, cand_p[None, :], tpay_ref[:])

    @pl.when(i == A - 1)
    def _():
        mf = m_ref[:]
        vf = v_ref[:]
        hf = h_ref[:]
        valid = jcol < rlen
        key = jnp.where(valid, mf * _JKEY + (_JKEY - 1 - jcol),
                        jnp.int32(-2 ** 31) + 1)
        best_key = jnp.max(key, axis=0)                  # (LANES,)
        row_sc = best_key >> 14
        j_star = (_JKEY - 1) - (best_key - row_sc * _JKEY)
        sel = valid & (key == best_key[None, :])
        row_v = jnp.max(jnp.where(sel, vf, negs), axis=0)
        row_h = jnp.max(jnp.where(sel, hf, negs), axis=0)
        rpm = jnp.max(jnp.where(sel, pm_ref[:], PNEG), axis=0)
        rpv = jnp.max(jnp.where(sel, pv_ref[:], PNEG), axis=0)
        rph = jnp.max(jnp.where(sel, ph_ref[:], PNEG), axis=0)
        row_uv = row_v == row_sc
        row_uh = (~row_uv) & (row_h == row_sc)
        row_p = jnp.where(row_uv, rpv, jnp.where(row_uh, rph, rpm))

        col_sc, col_i = tsc_ref[0, :], ti_ref[0, :]
        col_wins = col_sc > row_sc
        best_ref[0, :] = jnp.where(col_wins, col_sc, row_sc)
        celli_ref[0, :] = jnp.where(col_wins, col_i, alen[0, :])
        cellj_ref[0, :] = jnp.where(col_wins, rlen[0, :], j_star)
        pay_ref[0, :] = jnp.where(col_wins, tpay_ref[0, :], row_p)


def _lanes_for_t(B, L1p):
    """Lane-block width for the transposed kernel: a multiple of 128 (the
    lane tile) sized to the same element budget as the lane-major kernels."""
    lanes = max(128, _BLOCK_ELEMS // L1p)
    lanes = 1 << (lanes.bit_length() - 1)
    while lanes > 128 and B % lanes:
        lanes //= 2
    return lanes


def forward_stats_pallas_t_impl(reads, read_lens, adapters, adapter_lens,
                                match, mismatch, gap_open, gap_ext):
    """Transposed twin of forward_stats_pallas_impl (same outputs)."""
    B, L = reads.shape
    A = adapters.shape[1]
    L1p = _round_up(L + 1, 32)          # int8 sublane tile
    assert L1p <= MAX_L1P
    LANES = _lanes_for_t(B, L1p)
    assert B % LANES == 0, (B, LANES)
    window = _prefix_window(match, gap_open, gap_ext, A, L1p)

    reads_s = jnp.pad(reads.astype(jnp.int8), ((0, 0), (1, L1p - L - 1)),
                      constant_values=4).T                # (L1p, B)
    acodes = adapters.astype(jnp.int32).T[:, None, :]     # (A, 1, B)
    rlens = read_lens.astype(jnp.int32).reshape(1, B)
    alens = adapter_lens.astype(jnp.int32).reshape(1, B)

    kernel = functools.partial(
        _stats_kernel_t, A=A, L1p=L1p, LANES=LANES, match=match,
        mismatch=mismatch, gap_open=gap_open, gap_ext=gap_ext,
        window=window)

    out_shapes = tuple(jax.ShapeDtypeStruct((1, B), jnp.int32)
                       for _ in range(4))

    def vec():
        return pl.BlockSpec((1, LANES), lambda b, i: (0, b),
                            memory_space=pltpu.VMEM)

    best, celli, cellj, pay = pl.pallas_call(
        kernel,
        grid=(B // LANES, A),
        in_specs=[
            pl.BlockSpec((L1p, LANES), lambda b, i: (0, b),
                         memory_space=pltpu.VMEM),
            vec(),
            vec(),
            pl.BlockSpec((1, 1, LANES), lambda b, i: (i, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(vec(), vec(), vec(), vec()),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((L1p, LANES), jnp.int32),
            pltpu.VMEM((L1p, LANES), jnp.int32),
            pltpu.VMEM((L1p, LANES), jnp.int32),
            pltpu.VMEM((L1p, LANES), jnp.int32),
            pltpu.VMEM((L1p, LANES), jnp.int32),
            pltpu.VMEM((L1p, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(reads_s, alens, rlens, acodes)
    best = best[0]
    celli = celli[0]
    cellj = cellj[0]
    pay = pay[0]
    mat = pay >> 15
    g = (pay & (_PAY_MAT - 1)) - _PAY_G_BIAS
    al32 = adapter_lens.astype(jnp.int32)
    rl32 = read_lens.astype(jnp.int32)
    full_len = al32 + g + jnp.where(celli < al32, rl32 - cellj, 0)
    return best, celli, cellj, mat, full_len


forward_stats_pallas_t = jax.jit(forward_stats_pallas_t_impl,
                                 static_argnums=(4, 5, 6, 7))


# ---------------------------------------------------------------------------
# Score-only kernel: the middle-adapter round 0 never DISPLAYS a
# sub-threshold identity — it only compares full_pct >= threshold and
# recovers coordinates for hits (reference nanopore_read.py:216-243,
# porechop.py:533-595).  A provable score bound turns that into a
# prefilter: along the elected path,
#     full_len = mat + mm + v + g_in + t_free
# (diagonal matches, diagonal mismatches, interior vertical / horizontal
# gap columns, free tail columns), every non-match column costs at most
# Q = max(|mismatch|, |gap_open|, |gap_ext|)  (a gap run of length g costs
# |open| + (g-1)|ext| <= Q*g), and free-tail columns cost nothing, so
#     score >= match*mat - Q*(full_len - mat).
# If the elected path's identity mat/full_len >= tau (with tau > Q/(match+Q))
# then score >= full_len*((match+Q)*tau - Q) >= alen*((match+Q)*tau - Q),
# because full_len = alen + g + tail >= alen.  Contrapositive: any lane
# whose BEST score is below alen*((match+Q)*tau - Q) cannot have
# full_pct >= 100*tau, and can be rejected without computing its stats.
# (dispatch.AlignJobs.run_stats re-runs the surviving lanes — typically the
# chimera rate — through the exact stat-carrying kernel.)
#
# This kernel computes ONLY the best semi-global score: no payload planes
# (3 int32 VMEM planes and their selects/rolls gone), no trace bits, no
# H plane (H never crosses rows), no freeze (rows past a lane's alen keep
# computing, but their candidates are masked and the last-row fold happens
# exactly at row == alen), no leftmost election (the numeric max over the
# last row and last column of M is the score; tie-break bookkeeping is
# only needed for coordinates).  ~45 VPU ops/cell vs ~85 for the
# stat-carrying kernel.
# ---------------------------------------------------------------------------


def _score_kernel(reads_ref, alens_ref, rlens_ref, acode_ref, best_ref,
                  m_ref, v_ref, tsc_ref,
                  *, A, L1p, LANES, match, mismatch, gap_open, gap_ext,
                  sdt, neg, window):
    """Grid program (b, i): DP row i+1 for lane block b; best-score only."""
    i = pl.program_id(1)
    row = i + 1
    jcol = lax.broadcasted_iota(jnp.int32, (LANES, L1p), 1)
    rlen = rlens_ref[:, 0][:, None]
    alen = alens_ref[:, 0][:, None]
    col0 = jcol == 0
    negs = jnp.int32(neg)

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.zeros((LANES, L1p), sdt)
        v_ref[:] = jnp.full((LANES, L1p), neg, sdt)
        tsc_ref[:] = jnp.zeros((LANES, 1), jnp.int32)  # M(0, len) = 0

    m = m_ref[:].astype(jnp.int32)
    v = v_ref[:].astype(jnp.int32)
    a_code = acode_ref[0].astype(jnp.int32)

    nv = jnp.maximum(v + gap_ext, m + gap_open)
    nv = jnp.where(col0, negs, nv)

    eq = reads_ref[:].astype(jnp.int32) == a_code
    sub = jnp.where(eq, match, mismatch)
    d = pltpu.roll(m, 1, 1) + sub

    pre = jnp.maximum(jnp.where(col0, negs, d), nv)
    pre = jnp.where(col0, 0, pre)

    # H prefix-max under the gap-run window bound (_prefix_window).
    f = pre + gap_open - (jcol + 1) * gap_ext
    n_pass = max(1, (window - 1).bit_length())
    cum = f
    for k in range(n_pass):
        sh = 1 << k
        rolled = pltpu.roll(cum, sh, 1)
        cum = jnp.maximum(cum, jnp.where(jcol < sh, negs, rolled))
    nh = jnp.where(col0, negs, pltpu.roll(cum, 1, 1) + jcol * gap_ext)
    nh = jnp.maximum(nh, negs)         # storage floor (exact, see NEG16)

    nm = jnp.maximum(pre, nh)
    nm = jnp.where(col0, 0, nm)

    # No freeze: rows past alen evolve garbage, but their candidates are
    # masked below and the sdt range still holds (scores drift by at most
    # match per extra row and the H chain is clamped at `neg`).
    m_ref[:] = nm.astype(sdt)
    v_ref[:] = nv.astype(sdt)

    # Best-score fold: the semi-global score is the max of M over the last
    # column (j == rlen, every row <= alen) and the last row (row == alen,
    # j <= rlen — j == rlen is covered by the first term).
    fold = (jcol == rlen) | ((row == alen) & (jcol < rlen))
    cand = jnp.max(jnp.where(fold, nm, negs), axis=1)       # (LANES,)
    act1 = (row <= alen)[:, 0]
    tsc_ref[:, 0] = jnp.where(act1, jnp.maximum(tsc_ref[:, 0], cand),
                              tsc_ref[:, 0])

    @pl.when(i == A - 1)
    def _():
        best_ref[:, 0] = tsc_ref[:, 0]


def _lanes_for_score(B, L1p):
    """Lane election for the score kernel: double the generic element
    budget.  The generic cap is set by the stat-carrying kernel's ~15
    spilled int32 row temporaries; the score kernel keeps roughly half as
    many live (no payload planes, no trace bits, no flag bookkeeping), so
    twice the lanes spill the same bytes — and at the middle shape
    (L1p ~ 10k) the per-grid-step Mosaic dispatch is over half the wall,
    so halving the step count pays directly."""
    lanes = max(32, (2 * _BLOCK_ELEMS) // L1p)
    lanes = 1 << (lanes.bit_length() - 1)
    while lanes > 32 and B % lanes:
        lanes //= 2
    return lanes


def forward_score_pallas_impl(reads, read_lens, adapters, adapter_lens,
                              match, mismatch, gap_open, gap_ext):
    """Best-score-only forward: returns (B,) int32 best semi-global scores.
    Same shape constraints as forward_pallas_impl (supports_shape)."""
    B, L = reads.shape
    A = adapters.shape[1]
    L1p = _round_up(L + 1, 128)
    assert L1p <= MAX_L1P, (L1p, 'bucket too large for the pallas kernel')
    sdt, neg = _sdt_for(match, mismatch, gap_open, gap_ext, A)
    LANES = _lanes_for_score(B, L1p)
    assert B % LANES == 0, (B, LANES)

    reads_s = jnp.pad(reads.astype(jnp.int8), ((0, 0), (1, L1p - L - 1)),
                      constant_values=4)
    acodes = adapters.astype(jnp.int32).T[:, :, None]
    rlens = read_lens.astype(jnp.int32).reshape(B, 1)
    alens = adapter_lens.astype(jnp.int32).reshape(B, 1)

    kernel = functools.partial(
        _score_kernel, A=A, L1p=L1p, LANES=LANES, match=match,
        mismatch=mismatch, gap_open=gap_open, gap_ext=gap_ext,
        sdt=sdt, neg=neg,
        window=_prefix_window(match, gap_open, gap_ext, A, L1p))

    def small():
        return pl.BlockSpec((LANES, 1), lambda b, i: (b, 0),
                            memory_space=pltpu.VMEM)

    best = pl.pallas_call(
        kernel,
        grid=(B // LANES, A),
        in_specs=[
            pl.BlockSpec((LANES, L1p), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            small(),
            small(),
            pl.BlockSpec((1, LANES, 1), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=small(),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((LANES, L1p), sdt),
            pltpu.VMEM((LANES, L1p), sdt),
            pltpu.VMEM((LANES, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(reads_s, alens, rlens, acodes)
    return best[:, 0]


forward_score_pallas = jax.jit(forward_score_pallas_impl,
                               static_argnums=(4, 5, 6, 7))


def _score_kernel_t(reads_ref, alens_ref, rlens_ref, acode_ref, best_ref,
                    m_ref, v_ref, tsc_ref,
                    *, A, L1p, LANES, match, mismatch, gap_open, gap_ext,
                    window):
    """Transposed twin of _score_kernel: columns in sublanes (the
    150-bp detection window pads 151 -> 160 instead of 256, the same
    layout win as _stats_kernel_t), best score only."""
    i = pl.program_id(1)
    row = i + 1
    jcol = lax.broadcasted_iota(jnp.int32, (L1p, LANES), 0)
    rlen = rlens_ref[0, :][None, :]
    alen = alens_ref[0, :][None, :]
    col0 = jcol == 0
    negs = jnp.int32(NEG)

    @pl.when(i == 0)
    def _():
        m_ref[:] = jnp.zeros((L1p, LANES), jnp.int32)
        v_ref[:] = jnp.full((L1p, LANES), NEG, jnp.int32)
        tsc_ref[:] = jnp.zeros((1, LANES), jnp.int32)

    m = m_ref[:]
    v = v_ref[:]
    a_code = acode_ref[0].astype(jnp.int32)              # (1, LANES)

    nv = jnp.maximum(v + gap_ext, m + gap_open)
    nv = jnp.where(col0, negs, nv)

    eq = reads_ref[:].astype(jnp.int32) == a_code
    sub = jnp.where(eq, match, mismatch)
    d = pltpu.roll(m, 1, 0) + sub

    pre = jnp.maximum(jnp.where(col0, negs, d), nv)
    pre = jnp.where(col0, 0, pre)

    f = pre + gap_open - (jcol + 1) * gap_ext
    n_pass = max(1, (window - 1).bit_length())
    cum = f
    for k in range(n_pass):
        sh = 1 << k
        rolled = pltpu.roll(cum, sh, 0)
        cum = jnp.maximum(cum, jnp.where(jcol < sh, negs, rolled))
    nh = jnp.where(col0, negs, pltpu.roll(cum, 1, 0) + jcol * gap_ext)
    nh = jnp.maximum(nh, negs)

    nm = jnp.maximum(pre, nh)
    nm = jnp.where(col0, 0, nm)

    m_ref[:] = nm
    v_ref[:] = nv

    fold = (jcol == rlen) | ((row == alen) & (jcol < rlen))
    cand = jnp.max(jnp.where(fold, nm, negs), axis=0)    # (LANES,)
    act1 = (row <= alen)[0, :]
    tsc_ref[0, :] = jnp.where(act1, jnp.maximum(tsc_ref[0, :], cand),
                              tsc_ref[0, :])

    @pl.when(i == A - 1)
    def _():
        best_ref[0, :] = tsc_ref[0, :]


def forward_score_pallas_t_impl(reads, read_lens, adapters, adapter_lens,
                                match, mismatch, gap_open, gap_ext):
    """Transposed twin of forward_score_pallas_impl (same output)."""
    B, L = reads.shape
    A = adapters.shape[1]
    L1p = _round_up(L + 1, 32)          # int8 sublane tile
    assert L1p <= MAX_L1P
    LANES = _lanes_for_t(B, L1p)
    assert B % LANES == 0, (B, LANES)
    window = _prefix_window(match, gap_open, gap_ext, A, L1p)

    reads_s = jnp.pad(reads.astype(jnp.int8), ((0, 0), (1, L1p - L - 1)),
                      constant_values=4).T                # (L1p, B)
    acodes = adapters.astype(jnp.int32).T[:, None, :]     # (A, 1, B)
    rlens = read_lens.astype(jnp.int32).reshape(1, B)
    alens = adapter_lens.astype(jnp.int32).reshape(1, B)

    kernel = functools.partial(
        _score_kernel_t, A=A, L1p=L1p, LANES=LANES, match=match,
        mismatch=mismatch, gap_open=gap_open, gap_ext=gap_ext,
        window=window)

    def vec():
        return pl.BlockSpec((1, LANES), lambda b, i: (0, b),
                            memory_space=pltpu.VMEM)

    best = pl.pallas_call(
        kernel,
        grid=(B // LANES, A),
        in_specs=[
            pl.BlockSpec((L1p, LANES), lambda b, i: (0, b),
                         memory_space=pltpu.VMEM),
            vec(),
            vec(),
            pl.BlockSpec((1, 1, LANES), lambda b, i: (i, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=vec(),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((L1p, LANES), jnp.int32),
            pltpu.VMEM((L1p, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(reads_s, alens, rlens, acodes)
    return best[0]


forward_score_pallas_t = jax.jit(forward_score_pallas_t_impl,
                                 static_argnums=(4, 5, 6, 7))


def score_prefilter_coef(threshold, match, mismatch, gap_open, gap_ext):
    """The per-adapter-base score floor coefficient of the prefilter note
    above: a lane can only reach full_pct >= threshold if its best score is
    >= coef * alen.  Returns 0.0 when the bound is vacuous (threshold too
    low or a non-positive match score) — callers must then skip the
    prefilter.  tau is shaved by 1e-6 to absorb the reference's 6-decimal
    percent round-trip (dispatch.seqan_pct_vec)."""
    if match <= 0:
        return 0.0
    Q = max(abs(mismatch), abs(gap_open), abs(gap_ext))
    tau = threshold / 100.0 - 1e-6
    coef = (match + Q) * tau - Q
    return coef if coef > 0 else 0.0
