"""Batch planner and engine dispatch.

Turns arbitrary collections of (window, adapter) alignment jobs into a small
number of dense, shape-bucketed device launches, then scatters results back.

Why bucketing: XLA compiles one program per (padded window length, padded
adapter length) pair, and on tunneled TPU backends each compile is expensive
— so window lengths snap to a geometric ladder and adapters pad to the
bucket's max.  Why chunking: per-launch state is ~27 * B * L int32, so B*L is
capped to bound HBM while keeping launches big enough to amortize dispatch
overhead (~hundreds of ms on tunneled devices).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

from . import spec

_TIMING = bool(os.environ.get('PORECHOP_TPU_TIMING'))

# Window-length ladder: fine-grained at the small end (end windows), then
# geometric.  One compile per rung actually used.
_LADDER = [16, 32, 64, 96, 150, 256, 384, 512, 768, 1024, 1536, 2048, 3072,
           4096, 6144, 8192, 10240, 12288, 16384, 24576, 32768, 49152,
           65536, 98304, 131072, 196608, 262144, 393216, 524288, 786432,
           1048576]

# Cap on B*L1*A DP cells per launch for the bitmap (traceback) path: the
# dominant HBM object is the trace bitmap (1 byte/cell), and the on-device
# walk's flat int32 gather additionally requires lanes * L1p * A < 2^31
# (enforced in _per_launch).  1.6e9 cells ~= 1.6 GB of bits per launch —
# well inside a v5e's 16 GB HBM — and launches this big amortize the
# ~30 ms serialized tunnel round trip (r4 measured: the 8192-read middle
# phase was 40 launches of 3e8 cells, launch count dominated its wall).
_CELL_BUDGET = int(os.environ.get('PORECHOP_TPU_CELL_BUDGET',
                                  2_000_000_000))
# Group-max (detection) launches run the stat-carrying kernel: NO trace
# bitmap, no walk, VMEM-resident state — HBM holds only the int8 inputs
# and four int32 scalars per lane, so the budget is set by keeping the
# input block modest (~6e9 cells at the 160x24 detection shape is ~1.5M
# lanes = 250 MB of codes), not by a per-cell byte.
_GM_CELL_BUDGET = int(os.environ.get('PORECHOP_TPU_GM_CELL_BUDGET',
                                     6_000_000_000))
_MIN_LANES = 32     # matches the Pallas kernel's lane-block width

# Launches smaller than this many (padded) DP cells run on the native host
# engine instead of the device: at the measured rates (host SIMD ~1.6e9
# cells/s vs device ~5.7e9 cells/s + ~30 ms round-trip) the break-even is
# ~6e7 cells.  Set to 0 to force everything onto the device.
_HYBRID_CELLS = int(os.environ.get('PORECHOP_TPU_HYBRID_CELLS', 60_000_000))


def _noop_progress(idxs):
    pass


def _bucket_len(n: int) -> int:
    for rung in _LADDER:
        if n <= rung:
            return rung
    return ((n + 65535) // 65536) * 65536


_A_LADDER = [16, 24, 32, 48, 64, 96, 128, 192, 256]


def _bucket_adapter_len(n: int) -> int:
    for rung in _A_LADDER:
        if n <= rung:
            return rung
    return ((n + 127) // 128) * 128


def _bucket_lanes(n: int) -> int:
    """Snap the batch (lane) count to a power of two so iterative phases with
    shrinking active sets reuse compiled programs instead of triggering a new
    XLA compile per distinct batch size."""
    b = _MIN_LANES
    while b < n:
        b *= 2
    return b


def _use_jax() -> bool:
    if os.environ.get('PORECHOP_TPU_FORCE_HOST'):
        return False
    try:
        import jax  # noqa: F401
        return True
    except Exception:
        return False


def score_path_available(scoring=(3, -6, -5, -2)) -> bool:
    """Whether a walk-free score-only execution exists for this scheme:
    the device/jnp engines (jax on) or the native SIMD score mode."""
    if _use_jax():
        from . import engine_jax
        return engine_jax.supports(scoring)
    _, _, gap_open, gap_ext = (int(x) for x in scoring)
    if os.environ.get('PORECHOP_TPU_NO_NATIVE') or gap_open == gap_ext:
        return False
    from .. import native
    return native.traceback_lib() is not None


def stats_path_active(scoring=(3, -6, -5, -2), prefilter=None) -> bool:
    """Whether AlignJobs.run_stats would route bulk work through a cheaper
    stats/score execution than the full run.

    Device path on: the stat-carrying kernels skip the trace bitmap and
    walk, so the stats flow always pays.  Device path off (forced host, no
    jax): a plain stats pass costs the same as the full run (the native
    engine computes coordinates anyway), so the flow only pays when the
    caller supplies a `prefilter` threshold whose score bound is non-vacuous
    AND the native engine's score-only mode is available — then one
    walk-free scan at ~2x plus an exact re-run of the ~1% survivors beats
    the single full pass."""
    if _use_jax():
        from . import engine_jax
        return engine_jax.supports(scoring)
    if prefilter is None:
        return False
    from . import kernel_pallas
    match, mismatch, gap_open, gap_ext = (int(x) for x in scoring)
    if kernel_pallas.score_prefilter_coef(prefilter, match, mismatch,
                                          gap_open, gap_ext) <= 0:
        return False
    return score_path_available(scoring)


def seqan_pct_vec(matches: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Vectorized percent identity matching the reference's round trip
    through C++ std::to_string (6 decimals) and Python float().

    For values not adjacent to a .5 millionths boundary, banker's rounding of
    v*1e6 equals decimal rounding of v; the rare boundary cases are
    recomputed exactly through the string path.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    matches = np.asarray(matches, dtype=np.int64)
    v = np.where(lengths > 0, 100.0 * matches / np.maximum(lengths, 1), np.nan)
    scaled = v * 1e6
    out = np.round(scaled) / 1e6
    frac = scaled - np.floor(scaled)
    sus = np.abs(frac - 0.5) < 1e-6
    if np.any(sus):
        idx = np.nonzero(sus)[0]
        for k in idx:
            out[k] = spec.seqan_pct(int(matches[k]), int(lengths[k]))
    return out


class AlignJobs:
    """A flat list of alignment jobs over pre-encoded sequences.

    windows: list of np.int8 Dna5 code arrays (the read-side sequences).
    adapters: list of np.int8 code arrays.
    pairs: (P, 2) int array of (window_index, adapter_index).
    """

    def __init__(self, windows, adapters, pairs, scoring=(3, -6, -5, -2)):
        self.windows = windows
        self.adapters = adapters
        self.pairs = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
        self.scoring = tuple(int(x) for x in scoring)
        self._group = None          # (group_ids, n_groups) in group-max mode
        self._gacc = None           # (n_groups, 2) int64 best (m, l)
        self._dev_grouped = None    # lanes already folded on device
        self._stats_only = False    # run_stats mode: no coordinate recovery
        self._stats_failed = None   # (P,) bool: device-stats lanes with ok=0
        self._score_only = False    # score-prefilter mode: raw score only
        self._score_lanes = None    # (P,) bool: lanes with score-only results
        self._gscore = None         # (group_ids, n_groups) group-score mode
        self._gsacc = None          # (n_groups,) int64 max-score fold

    # Window rungs above this bypass the device group-max (its float32
    # fraction key is exact only while full_len <= 2048).
    _GROUP_MAX_RUNG = 1536

    def run_group_max(self, group_ids, n_groups, progress=None) -> dict:
        """Group-reduced execution: per group, the best exact identity
        fraction matches/full_len over its jobs (the detection phase's
        per-(adapter set, side) max, reference nanopore_read.py:155-164).

        Device chunks reduce on device and ship (n_groups, 2) ints; native
        and fallback chunks fold their per-pair results on the host.
        Returns {'matches', 'full_len', 'full_pct'} of shape (n_groups,).
        """
        group_ids = np.asarray(group_ids, dtype=np.int64)
        assert group_ids.shape == (len(self.pairs),)
        self._group = (group_ids, int(n_groups))
        # Baseline (0, 1) = 0.0 identity, matching align_adapter's failure
        # value (reference nanopore_read.py:481-485).
        self._gacc = np.zeros((n_groups, 2), dtype=np.int64)
        self._gacc[:, 1] = 1
        self._dev_grouped = np.zeros(len(self.pairs), dtype=bool)
        try:
            res = self.run(progress=progress)
        finally:
            group, self._group = self._group, None
            gacc, self._gacc = self._gacc, None
            dev_grouped, self._dev_grouped = self._dev_grouped, None
        # Fold host-computed lanes (vectorized: a Python loop here costs
        # more than the native DP at --check_reads scale).  float64 keys
        # order fractions exactly for full_len well beyond any window the
        # host path sees (distinct fractions with denominators l1, l2
        # differ by >= 1/(l1*l2), far above float64 rounding error).
        rest = np.nonzero(~dev_grouped)[0]
        if rest.size:
            m = res['matches'][rest]
            ln = res['full_len'][rest]
            ok = (res['read_start'][rest] != -1) & (ln > 0)
            g = group_ids[rest[ok]]
            key = m[ok] / ln[ok]
            seg = gacc[:, 0] / gacc[:, 1]
            np.maximum.at(seg, g, key)
            win = key == seg[g]
            best_m = np.zeros(n_groups, dtype=np.int64)
            np.maximum.at(best_m, g[win], m[ok][win])
            best_l = np.zeros(n_groups, dtype=np.int64)
            np.maximum.at(best_l, g[win], ln[ok][win])
            upd = best_m * gacc[:, 1] > gacc[:, 0] * best_l
            gacc[upd, 0] = best_m[upd]
            gacc[upd, 1] = best_l[upd]
        return {'matches': gacc[:, 0], 'full_len': gacc[:, 1],
                'full_pct': seqan_pct_vec(gacc[:, 0], gacc[:, 1])}

    def run_group_score_max(self, group_ids, n_groups, progress=None):
        """Per-group max raw score (the detection phase's prefilter pass,
        phases.find_matching_adapter_sets): device chunks run the
        score-only kernel and reduce on device (only (n_groups,) int32
        ships back); native chunks run the walk-free score-only batch and
        fold on the host.  Returns a (n_groups,) int64 array; groups whose
        every lane failed stay at the -2^31+1 floor."""
        group_ids = np.asarray(group_ids, dtype=np.int64)
        assert group_ids.shape == (len(self.pairs),)
        P = len(self.pairs)
        self._gscore = (group_ids, int(n_groups))
        self._score_only = True
        self._gsacc = np.full(n_groups, -2 ** 31 + 1, dtype=np.int64)
        self._score_lanes = np.zeros(P, dtype=bool)
        self._stats_failed = np.zeros(P, dtype=bool)
        self._dev_grouped = np.zeros(P, dtype=bool)
        try:
            res = self.run(progress=progress)
        finally:
            self._gscore = None
            self._score_only = False
            gsacc, self._gsacc = self._gsacc, None
            failed, self._stats_failed = self._stats_failed, None
            dev, self._dev_grouped = self._dev_grouped, None
            self._score_lanes = None
        rest = np.nonzero(~dev)[0]
        if rest.size:
            ok = (res['read_start'][rest] != -1) & ~failed[rest]
            np.maximum.at(gsacc, group_ids[rest[ok]],
                          res['raw_score'][rest[ok]])
        return gsacc

    def run_stats(self, progress=None, prefilter=None) -> dict:
        """Percent-identity-only execution: returns {'matches', 'full_len',
        'full_pct'} of shape (P,) and skips coordinate recovery entirely.
        Device chunks run the stat-carrying forward (no trace bitmap, no
        traceback walk — engine_v2.align_batch_gather_stats_async); native
        and fallback chunks compute full results and keep only the stats.
        For consumers that branch on full_pct and recompute coordinates for
        the rare passing pairs — the middle-adapter scan tests every
        (read, adapter) pair but consumes coordinates only on hits
        (reference nanopore_read.py:216-243).

        prefilter: optional identity threshold (percent).  When the caller
        only consumes `full_pct >= prefilter` (and the values of passing
        lanes), device chunks first run a score-only kernel at ~half the
        stat-carrying kernel's VPU ops; lanes whose best score is provably
        too low for the threshold (kernel_pallas.score_prefilter_coef) are
        rejected with full_pct = 0.0 and only the survivors re-run through
        the exact stats path.  Sub-threshold lanes' matches/full_len are
        NOT meaningful in this mode.  Falls back to the plain stats flow
        whenever the bound is vacuous for the scheme/threshold."""
        if prefilter is not None:
            from . import kernel_pallas
            match, mismatch, gap_open, gap_ext = self.scoring
            coef = kernel_pallas.score_prefilter_coef(
                prefilter, match, mismatch, gap_open, gap_ext)
            if coef > 0 and ((_use_jax() and self._jax_supports())
                             or self._native_available()):
                return self._run_stats_prefiltered(coef, progress)
        self._stats_only = True
        self._stats_failed = np.zeros(len(self.pairs), dtype=bool)
        try:
            res = self.run(progress=progress)
        finally:
            self._stats_only = False
            failed, self._stats_failed = self._stats_failed, None
        # Host-computed lanes signal failure via read_start == -1
        # (align_adapter's zeros, reference nanopore_read.py:481-485);
        # device-stats lanes via the harvested ok flag.
        failed |= res['read_start'] == -1
        full_pct = seqan_pct_vec(res['matches'], res['full_len'])
        full_pct = np.where(failed | (res['full_len'] <= 0), 0.0, full_pct)
        return {'matches': res['matches'], 'full_len': res['full_len'],
                'full_pct': full_pct}

    def _run_stats_prefiltered(self, coef, progress) -> dict:
        """Score-prefiltered stats: one dense score-only pass over all
        pairs, then an exact stats pass over the (typically chimera-rate)
        survivors.  Soundness: a lane's best score below coef * adapter_len
        proves its full-span identity is below the threshold
        (kernel_pallas._score_kernel's bound note), so rejected lanes'
        full_pct = 0.0 compares identically against the threshold."""
        P = len(self.pairs)
        self._score_only = True
        self._score_lanes = np.zeros(P, dtype=bool)
        self._stats_failed = np.zeros(P, dtype=bool)
        try:
            res = self.run(progress=progress)
        finally:
            self._score_only = False
            score_lanes, self._score_lanes = self._score_lanes, None
            failed, self._stats_failed = self._stats_failed, None
        failed |= res['read_start'] == -1

        # Lanes routed native / jnp-fallback carry FULL results already —
        # use them directly (no re-run).
        host_pct = seqan_pct_vec(res['matches'], res['full_len'])
        host_ok = ~failed & (res['full_len'] > 0) & ~score_lanes
        full_pct = np.where(host_ok, host_pct, 0.0)
        matches = np.where(~score_lanes, res['matches'], 0)
        full_len = np.where(~score_lanes, np.maximum(res['full_len'], 1), 1)

        pa = np.array([len(self.adapters[k]) for k in range(len(self.adapters))],
                      dtype=np.int64)[self.pairs[:, 1]]
        cand = (score_lanes & ~failed
                & (res['raw_score'].astype(np.float64) >= coef * pa))
        if cand.any():
            idx = np.nonzero(cand)[0]
            sub = AlignJobs(self.windows, self.adapters, self.pairs[idx],
                            self.scoring)
            sres = sub.run_stats()          # exact, no prefilter
            matches[idx] = sres['matches']
            full_len[idx] = sres['full_len']
            full_pct[idx] = sres['full_pct']
        if _TIMING:
            print('[timing] score prefilter: %d/%d lanes survived '
                  '(%d full-result lanes)' % (int(cand.sum()), P,
                                              int((~score_lanes).sum())),
                  file=sys.stderr, flush=True)
        return {'matches': matches, 'full_len': full_len,
                'full_pct': full_pct}

    def run(self, progress=None) -> dict:
        """Executes all jobs; returns dict of (P,) arrays:
        read_start, read_end_excl, full_pct, partial_pct, plus the raw
        integer fields (matches, aligned_len, full_len, raw_score,
        read_end_incl, adapter_start, adapter_end).

        progress: optional callable(job_indices) invoked as groups of jobs
        resolve (degenerate fixes, native batches, each device-chunk
        harvest) — lets callers tick per-read progress DURING the phase
        instead of after it (reference porechop.py:737-748 ticks every 10
        reads while computing)."""
        if progress is None:
            progress = _noop_progress
        P = len(self.pairs)
        fields = ('read_start', 'read_end', 'adapter_start', 'adapter_end',
                  'raw_score', 'matches', 'aligned_len', 'full_len')
        out = {f: np.zeros(P, dtype=np.int64) for f in fields}
        if P == 0:
            return self._package(out)

        wlens = np.array([len(w) for w in self.windows], dtype=np.int64)
        alens = np.array([len(a) for a in self.adapters], dtype=np.int64)
        pw = wlens[self.pairs[:, 0]]
        pa = alens[self.pairs[:, 1]]

        # Degenerate jobs (empty window or adapter) resolve host-side.
        degenerate = (pw == 0) | (pa == 0)
        if degenerate.any():
            for k in np.nonzero(degenerate)[0]:
                out['read_start'][k] = -1
                out['raw_score'][k] = -(2 ** 31)
            progress(np.nonzero(degenerate)[0])

        todo = np.nonzero(~degenerate)[0]
        if todo.size == 0:
            return self._package(out)

        use_jax = _use_jax() and self._jax_supports()
        if not use_jax:
            # Host path: the native C++ engine in one threaded batch call
            # (falls back to the Python executable spec per job).
            if self._run_native(todo, out):
                progress(todo)
                return self._package(out)

        # Bucket by (window rung, adapter rung): adapters pad to the rung,
        # not the batch max, so compiled shapes are stable across runs and
        # short barcodes don't pay for the longest chemistry adapter.
        # Vectorized (a Python loop here costs more than the host's share of
        # the launches at --check_reads scale).
        lad = np.asarray(_LADDER, dtype=np.int64)
        wi = np.searchsorted(lad, pw[todo], side='left')
        lbv = np.where(wi < len(lad), lad[np.minimum(wi, len(lad) - 1)],
                       ((pw[todo] + 65535) // 65536) * 65536)
        alad = np.asarray(_A_LADDER, dtype=np.int64)
        ai = np.searchsorted(alad, pa[todo], side='left')
        amv = np.where(ai < len(alad), alad[np.minimum(ai, len(alad) - 1)],
                       ((pa[todo] + 127) // 128) * 128)
        # Rung-index bucketing via radix sort: the (window rung, adapter
        # rung) pair is a point on a tiny ladder grid, so the group key fits
        # uint16 and argsort(kind='stable') radix-sorts it in O(P) — an
        # int64 comparison unique costs ~0.55 s at 2.6M detection pairs.
        # Oversize (past-the-ladder) rungs get ids after the grid; their
        # distinct values are found by np.unique on just those rows.
        Ga = len(alad) + 1
        comb = wi * Ga + ai
        over = (wi >= len(lad)) | (ai >= len(alad))
        if over.any():
            okey = lbv[over] * (1 << 20) + amv[over]
            _, oinv = np.unique(okey, return_inverse=True)
            comb[over] = (len(lad) + 1) * Ga + oinv
        # uint16 keeps argsort in radix territory; anything larger would
        # silently wrap and merge buckets under a wrong (lb, amax) key.
        # ~65.2k distinct oversize rung pairs is unreachable with real read
        # lengths, but guard it: fall back to the int64 sort if it ever is.
        if comb.max(initial=0) < 65536:
            order = np.argsort(comb.astype(np.uint16), kind='stable')
        else:
            order = np.argsort(comb, kind='stable')
        sc = comb[order]
        cut = np.nonzero(np.diff(sc))[0] + 1
        starts = np.concatenate((np.zeros(1, np.int64), cut))
        ends = np.concatenate((cut, np.asarray([len(sc)], np.int64)))
        todo_ord = todo[order]
        lbv_ord = lbv[order]
        amv_ord = amv[order]
        buckets = {(int(lbv_ord[s]), int(amv_ord[s])): todo_ord[s:e]
                   for s, e in zip(starts, ends)}
        route_small = use_jax and self._native_available()
        self._merge_adapter_rungs(buckets, route_small)

        small = []        # chunks routed to the native host engine
        small_meta = []   # matching (lb, amax, chunk) for device push-back
        device_work = []  # (lb, amax, chunk) launches
        for (lb, amax), idxs in sorted(buckets.items()):
            for chunk, cells in self._chunk_split(np.asarray(idxs), lb, amax):
                if route_small and cells < _HYBRID_CELLS:
                    small.append(chunk)
                    small_meta.append((lb, amax, chunk))
                else:
                    device_work.append((lb, amax, chunk))

        if route_small and device_work:
            device_work = self._share_with_native(small, small_meta,
                                                  device_work)

        # Per-rung job index lists for the device queue, so uploads dedup
        # across buckets sharing a rung (a window rung's table is shared by
        # every adapter rung and vice versa).
        rung_w = {}
        rung_a = {}
        for lb, amax, chunk in device_work:
            rung_w.setdefault(lb, []).append(chunk)
            rung_a.setdefault(amax, []).append(chunk)

        # Enqueue EVERY device launch before touching results: JAX dispatch
        # is asynchronous, so the launches pipeline back-to-back on device
        # (no ~30 ms tunnel round trip between chunks), and the host-native
        # small-chunk work below runs concurrently with device compute.
        gather = use_jax and self._gather_capable()
        tables = {'w': {}, 'a': {}}   # device-resident dedup tables
        pending = []                  # (chunk, handle) to harvest late
        t0 = time.perf_counter() if _TIMING else 0.0
        for lb, amax, chunk in device_work:
            if gather:
                h = self._launch_chunk_gather(chunk, lb, amax, tables,
                                              rung_w, rung_a)
                pending.append((chunk, h))
            else:
                self._run_chunk(chunk, lb, amax, out, use_jax)
                progress(chunk)
        if _TIMING and device_work:
            print('[timing] enqueued %d launches in %.3fs'
                  % (len(device_work), time.perf_counter() - t0),
                  file=sys.stderr, flush=True)

        if small:
            smallcat = np.concatenate(small)
            if self._run_native(smallcat, out):
                progress(smallcat)
            else:
                # Native engine raced away (e.g. compiler cache wiped):
                # push the chunks onto the device queue instead.
                for lb, amax, chunk in small_meta:
                    if gather:
                        rung_w.setdefault(lb, []).append(chunk)
                        rung_a.setdefault(amax, []).append(chunk)
                        h = self._launch_chunk_gather(chunk, lb, amax,
                                                      tables, rung_w, rung_a)
                        pending.append((chunk, h))
                    else:
                        self._run_chunk(chunk, lb, amax, out, use_jax)
                        progress(chunk)

        t0 = time.perf_counter() if _TIMING else 0.0
        # Start every pending launch's d2h copies before blocking on any of
        # them: np.asarray on a tunneled device array pays a full round trip
        # per array, and a phase can harvest a dozen small arrays (12 x
        # ~37 ms measured serial = 0.44 s; async-prefetched they overlap
        # into ~one round trip).
        for _chunk, (_kind, h) in pending:
            for arr in (h if isinstance(h, (tuple, list)) else (h,)):
                fn = getattr(arr, 'copy_to_host_async', None)
                if fn is not None:
                    try:
                        fn()
                    except (NotImplementedError, AttributeError):
                        pass    # backend lacks async d2h; harvest pays RTT
                    except Exception as e:
                        # Real device errors (OOM, transfer failure) will
                        # re-raise with full context at harvest below; note
                        # them here only under the debug flag.
                        if _TIMING:
                            print('[timing] copy_to_host_async: %r' % (e,),
                                  file=sys.stderr, flush=True)
        for chunk, h in pending:
            self._harvest(chunk, h, out)
            progress(chunk)
        if _TIMING and pending:
            dt = time.perf_counter() - t0
            cells = int(sum(_bucket_lanes(len(c)) * (lb + 1) * amax
                            for lb, amax, c in device_work))
            print('[timing] harvested %d launches in %.3fs (%.2e cells/s '
                  'incl. enqueue-overlap)' % (len(pending), dt,
                                              cells / max(dt, 1e-9)),
                  file=sys.stderr, flush=True)
        return self._package(out)

    # Padded-cell cost below which merging a device-bound adapter-rung
    # bucket into a wider rung is worth one saved launch: a serialized
    # ~30 ms tunnel round trip equals ~1.2e8 cells at the measured
    # detection-shape kernel rate, and every merged rung is one fewer
    # XLA shape to compile (minutes each through the remote-compile
    # helper on cold caches).
    _MERGE_CELLS_PER_LAUNCH = int(os.environ.get(
        'PORECHOP_TPU_MERGE_CELLS', 120_000_000))

    def _is_groupmax_rung(self, lb) -> bool:
        """Chunks of this window rung will launch through the group-max
        (stat-carrying, bitless) path."""
        return self._group is not None and lb <= self._GROUP_MAX_RUNG

    def _is_stats_rung(self, lb, amax) -> bool:
        """Chunks of this rung will launch through the per-lane stats
        (stat-carrying, bitless) path in run_stats mode, or the score-only
        kernel in prefilter mode (same shape support)."""
        if not (self._stats_only or self._score_only):
            return False
        from . import engine_v2
        return engine_v2.stats_mode_ok(lb, amax)

    def _per_launch(self, lb, amax):
        """Power-of-two chunk width under the cell budget (_bucket_lanes
        pads each chunk up to a power of two anyway, so a non-pow2 chunk
        width would pay for padded lanes AND an extra launch).  Bitless
        rungs (group-max or per-lane stats) take the larger budget; bitmap
        rungs are additionally clamped so the traceback's flat int32 gather
        index lanes * L1p * A stays below 2^31 (engine_v2._traceback_impl)."""
        gm = self._is_groupmax_rung(lb) or self._is_stats_rung(lb, amax)
        budget = _GM_CELL_BUDGET if gm else _CELL_BUDGET
        per_launch = max(_MIN_LANES, budget // ((lb + 1) * amax))
        per_launch = 1 << max(_MIN_LANES.bit_length() - 1,
                              per_launch.bit_length() - 1)
        if not gm:
            l1p = ((lb + 1 + 127) // 128) * 128
            while per_launch > _MIN_LANES and per_launch * l1p * amax >= 2 ** 31:
                per_launch //= 2
        return per_launch

    def _chunk_split(self, idxs, lb, amax):
        """The launch chunking run() applies to a bucket.
        Yields (chunk, padded_cells)."""
        per_launch = self._per_launch(lb, amax)
        for lo in range(0, len(idxs), per_launch):
            chunk = idxs[lo:lo + per_launch]
            yield chunk, _bucket_lanes(len(chunk)) * (lb + 1) * amax

    # Engine work-sharing rate model (cells/s): the native host engine runs
    # CONCURRENTLY with in-flight device launches (run() enqueues every
    # launch, then chews the native queue, then harvests), so leaving it
    # idle during a big phase wastes a real compute resource.  Measured on
    # the build host: 2-vCPU AVX-512 native ~1.4-2.3e9; device effective
    # (kernel + gather/unpack + harvest) ~6e9-1.1e10 for the bitmap path.
    # The bitless paths run much faster per cell (no trace-bit HBM write,
    # no walk): stats/group-max ~1.2-1.8e10 measured, score-only
    # 1.8-3.7e10 (BASELINE.md r4/r5 tables) — using the bitmap rate for
    # them over-diverts work to the slow native queue, so the model picks
    # the rate by the active mode.  Conservative defaults; override per
    # deployment.
    _HOST_CELLS_S = float(os.environ.get('PORECHOP_TPU_HOST_CELLS_S',
                                         '1.6e9'))
    _DEV_CELLS_S = float(os.environ.get('PORECHOP_TPU_DEV_CELLS_S', '6e9'))
    _DEV_CELLS_S_STATS = float(os.environ.get(
        'PORECHOP_TPU_DEV_CELLS_S_STATS', '1.2e10'))
    _DEV_CELLS_S_SCORE = float(os.environ.get(
        'PORECHOP_TPU_DEV_CELLS_S_SCORE', '2.4e10'))

    def _dev_rate(self) -> float:
        """Device cells/s for the work-share model under the active mode."""
        if self._score_only:
            return self._DEV_CELLS_S_SCORE
        if self._stats_only or self._group is not None:
            return self._DEV_CELLS_S_STATS
        return self._DEV_CELLS_S

    def _share_with_native(self, small, small_meta, device_work):
        """Balances one phase's work across BOTH engines: diverts job
        slices from device-bound chunks to the native queue so the two
        finish together under the rate model (minimize
        max(device_cells/r_dev, native_cells/r_host)).  Greedy over
        quantized moves: a device chunk can only shrink to a power-of-two
        lane count (anything else pads straight back up in _bucket_lanes,
        making the diversion pure loss) or leave entirely.  Returns the
        trimmed device_work; diverted jobs are appended to
        small/small_meta in place."""
        def pad_cells(lb, amax, n):
            return _bucket_lanes(n) * (lb + 1) * amax if n else 0

        rh, rd = self._HOST_CELLS_S, self._dev_rate()
        kept = list(device_work)
        c_dev = float(sum(pad_cells(lb, amax, len(c))
                          for lb, amax, c in kept))
        # Native side pays real (unpadded) cells; rung sizes upper-bound
        # the per-job cost consistently on both sides of the comparison.
        c_host = float(sum(len(c) * (lb + 1) * amax
                           for lb, amax, c in small_meta))
        while True:
            wall = max(c_dev / rd, c_host / rh)
            best = None
            for n, (lb, amax, chunk) in enumerate(kept):
                jc = (lb + 1) * amax
                L = len(chunk)
                keeps = {0}
                p = _bucket_lanes(L) // 2
                while p >= _MIN_LANES:
                    if p < L:
                        keeps.add(p)
                    p //= 2
                for keep in keeps:
                    nd = c_dev - pad_cells(lb, amax, L) \
                        + pad_cells(lb, amax, keep)
                    nh = c_host + (L - keep) * jc
                    w = max(nd / rd, nh / rh)
                    if w < wall - 1e-9 and (best is None or w < best[0]):
                        best = (w, n, keep)
            if best is None:
                break
            _, n, keep = best
            lb, amax, chunk = kept[n]
            c_dev += pad_cells(lb, amax, keep) \
                - pad_cells(lb, amax, len(chunk))
            c_host += (len(chunk) - keep) * (lb + 1) * amax
            small.append(chunk[keep:])
            small_meta.append((lb, amax, chunk[keep:]))
            if keep:
                kept[n] = (lb, amax, chunk[:keep])
            else:
                kept.pop(n)
        if _TIMING and c_host:
            print('[timing] work-share: %.2e cells device, %.2e native'
                  % (c_dev, c_host), file=sys.stderr, flush=True)
        return kept

    def _merge_adapter_rungs(self, buckets, route_small) -> None:
        """Merges same-window-rung, device-bound work whose adapter rungs
        differ into the widest rung among them, when the extra adapter
        padding costs less than the launches saved.  Padding an adapter
        beyond its length is free correctness-wise (rows past adapter_len
        are frozen by the engines); this trades bounded pad cells for fewer
        serialized launches.

        The device-bound test runs on POST-SPLIT chunks (the same split
        run() will route by), not whole buckets: a sub-threshold tail chunk
        of a large bucket routes to the native engine and must not be
        dragged onto the serialized tunnel by a whole-bucket merge
        (ADVICE r3).  Native-bound tail chunks stay behind in their
        original (lb, amax) bucket."""
        by_lb = {}
        for (lb, amax), idxs in buckets.items():
            by_lb.setdefault(lb, []).append((amax, idxs))
        for lb, lst in by_lb.items():
            cand = []     # (amax, device-bound idxs, n device chunks)
            native_rest = {}
            for amax, idxs in lst:
                idxs = np.asarray(idxs)
                dev_chunks, nat_chunks = [], []
                for chunk, cells in self._chunk_split(idxs, lb, amax):
                    if route_small and cells < _HYBRID_CELLS:
                        nat_chunks.append(chunk)
                    else:
                        dev_chunks.append(chunk)
                if dev_chunks:
                    cand.append((amax, np.concatenate(dev_chunks),
                                 len(dev_chunks)))
                native_rest[amax] = (np.concatenate(nat_chunks)
                                     if nat_chunks else None)
            if len(cand) < 2:
                continue
            target = max(amax for amax, _, _ in cand)
            extra = sum(_bucket_lanes(len(didx)) * (lb + 1) * (target - amax)
                        for amax, didx, _ in cand if amax != target)
            merged_len = sum(len(didx) for _, didx, _ in cand)
            n_merged = -(-merged_len // self._per_launch(lb, target))
            saved = sum(n for _, _, n in cand) - n_merged
            if saved <= 0 or extra >= saved * self._MERGE_CELLS_PER_LAUNCH:
                continue
            merged = np.concatenate([didx for _, didx, _ in cand])
            for amax, _, _ in cand:
                rest = native_rest[amax]
                if rest is not None and amax != target:
                    buckets[(lb, amax)] = rest
                else:
                    del buckets[(lb, amax)]
            if native_rest.get(target) is not None:
                merged = np.concatenate([merged, native_rest[target]])
            buckets[(lb, target)] = np.sort(merged)

    @staticmethod
    def _gather_capable() -> bool:
        return os.environ.get('PORECHOP_TPU_ENGINE', 'v2') != 'v1'

    def _launch_chunk_gather(self, chunk, lb, amax, tables, rung_w, rung_a):
        """Enqueue a chunk through engine_v2.align_batch_gather_async: the
        dedup'd window/adapter tables upload once per rung (kept in `tables`
        as device arrays — the window table for rung lb is shared by every
        adapter rung, so the middle phase's reads ship once, not once per
        adapter length) and each lane is just a pair of int32 row indices.
        Window codes cross the tunnel packed two-per-byte (~33 MB/s links
        make transfer bytes the scarce resource) and unpack on device.
        Returns a handle for _harvest; does NOT block."""
        import jax.numpy as jnp

        from . import engine_v2
        # A rung table built before this chunk joined the rung (the native-
        # failure push-back path appends chunks late) may not cover this
        # chunk's windows/adapters: its map sends unknown rows to the dummy
        # lane, which would return silently wrong alignments.  Rebuild from
        # the (updated) rung job lists when coverage is incomplete.
        if lb in tables['w']:
            wmap = tables['w'][lb][2]
            dummy_row = tables['w'][lb][0].shape[0] - 1
            if (wmap[self.pairs[chunk, 0]] >= dummy_row).any():
                del tables['w'][lb]
        if amax in tables['a']:
            amap = tables['a'][amax][2]
            dummy_row = tables['a'][amax][0].shape[0] - 1
            if (amap[self.pairs[chunk, 1]] >= dummy_row).any():
                del tables['a'][amax]
        if lb not in tables['w']:
            # All windows of this rung (across adapter rungs): one upload.
            # Mask-based unique: indices are bounded by the table length, so
            # this is O(n) where np.unique's argsort cost ~80 ms at
            # detection scale (120k pairs).
            seen = np.zeros(len(self.windows), dtype=bool)
            seen[self.pairs[np.concatenate(rung_w[lb]), 0]] = True
            uw = np.nonzero(seen)[0]
            wmat = np.full((len(uw) + 1, lb), 4, dtype=np.int8)
            wlen = np.ones(len(uw) + 1, dtype=np.int32)
            for r, k in enumerate(uw):
                w = self.windows[k]
                wmat[r, :len(w)] = w
                wlen[r] = len(w)
            wmap = np.full(len(self.windows), len(uw), dtype=np.int32)
            wmap[uw] = np.arange(len(uw), dtype=np.int32)
            # The dummy pad row's single live cell is 'A', not 'N', so an
            # N-free window table stays eligible for 2-bit packing (dummy
            # lane results are never consumed).
            wmat[len(uw), 0] = 0
            tables['w'][lb] = (
                engine_v2.put_replicated(engine_v2.pack_codes(wmat, wlen)),
                engine_v2.put_replicated(jnp.asarray(wlen)),
                wmap, wmat.shape[1])
        if amax not in tables['a']:
            seen = np.zeros(len(self.adapters), dtype=bool)
            seen[self.pairs[np.concatenate(rung_a[amax]), 1]] = True
            ua = np.nonzero(seen)[0]
            amat = np.full((len(ua) + 1, amax), 4, dtype=np.int8)
            alen = np.ones(len(ua) + 1, dtype=np.int32)
            for r, k in enumerate(ua):
                a = self.adapters[k]
                amat[r, :len(a)] = a
                alen[r] = len(a)
            amap = np.full(len(self.adapters), len(ua), dtype=np.int32)
            amap[ua] = np.arange(len(ua), dtype=np.int32)
            tables['a'][amax] = (
                engine_v2.put_replicated(jnp.asarray(amat)),
                engine_v2.put_replicated(jnp.asarray(alen)), amap)
        wpk_d, wlen_d, wmap, wcols = tables['w'][lb]
        amat_d, alen_d, amap = tables['a'][amax]
        B = len(chunk)
        Bp = _bucket_lanes(B)
        w_idx = np.full(Bp, wpk_d.shape[0] - 1, dtype=np.int32)
        a_idx = np.full(Bp, amat_d.shape[0] - 1, dtype=np.int32)
        w_idx[:B] = wmap[self.pairs[chunk, 0]]
        a_idx[:B] = amap[self.pairs[chunk, 1]]

        if self._group is not None and lb <= self._GROUP_MAX_RUNG:
            group_ids, n_groups = self._group
            g_idx = np.full(Bp, n_groups, dtype=np.int32)  # pad -> dummy
            g_idx[:B] = group_ids[chunk]
            gm_gl = engine_v2.align_batch_gather_groupmax_async(
                wpk_d, wlen_d, amat_d, alen_d, w_idx, a_idx, g_idx,
                n_groups, self.scoring, wcols=wcols)
            return ('gm', gm_gl)

        if self._is_stats_rung(lb, amax):
            if self._gscore is not None:
                gids, n_groups = self._gscore
                g_idx = np.full(Bp, n_groups, dtype=np.int32)  # pad -> dummy
                g_idx[:B] = gids[chunk]
                gs = engine_v2.align_batch_gather_group_scoremax_async(
                    wpk_d, wlen_d, amat_d, alen_d, w_idx, a_idx, g_idx,
                    n_groups, self.scoring, wcols=wcols)
                return ('gsc', gs)
            if self._score_only:
                sc = engine_v2.align_batch_gather_scores_async(
                    wpk_d, wlen_d, amat_d, alen_d, w_idx, a_idx,
                    self.scoring, wcols=wcols)
                return ('sc', sc)
            st = engine_v2.align_batch_gather_stats_async(
                wpk_d, wlen_d, amat_d, alen_d, w_idx, a_idx, self.scoring,
                wcols=wcols)
            return ('st', st)

        h = engine_v2.align_batch_gather_async(wpk_d, wlen_d, amat_d, alen_d,
                                               w_idx, a_idx, self.scoring,
                                               wcols=wcols)
        return ('res', h)

    def _harvest(self, chunk, handle, out):
        """Blocks on a _launch_chunk_gather handle and scatters results."""
        from . import engine_v2
        kind, h = handle
        B = len(chunk)
        if kind == 'gm':
            gm = np.asarray(h[0]).astype(np.int64)
            gl = np.asarray(h[1]).astype(np.int64)
            better = gm * self._gacc[:, 1] > self._gacc[:, 0] * gl
            self._gacc[better, 0] = gm[better]
            self._gacc[better, 1] = gl[better]
            self._dev_grouped[chunk] = True
            return
        if kind == 'st':
            out['matches'][chunk] = np.asarray(h[0]).astype(np.int64)[:B]
            out['full_len'][chunk] = np.asarray(h[1]).astype(np.int64)[:B]
            self._stats_failed[chunk] = ~np.asarray(h[2])[:B]
            return
        if kind == 'sc':
            out['raw_score'][chunk] = np.asarray(h[0]).astype(np.int64)[:B]
            self._stats_failed[chunk] = ~np.asarray(h[1])[:B]
            self._score_lanes[chunk] = True
            return
        if kind == 'gsc':
            np.maximum(self._gsacc, np.asarray(h).astype(np.int64),
                       out=self._gsacc)
            self._dev_grouped[chunk] = True
            return
        res = engine_v2.finish_gather(h)
        for f in out:
            out[f][chunk] = res[f][:B]

    def _native_available(self) -> bool:
        if os.environ.get('PORECHOP_TPU_NO_NATIVE'):
            return False
        _, _, gap_open, gap_ext = self.scoring
        if gap_open == gap_ext:
            return False
        from .. import native
        return native.traceback_lib() is not None

    def _jax_supports(self):
        from . import engine_jax
        return engine_jax.supports(self.scoring)

    def _run_native(self, todo, out) -> bool:
        """Runs the given job indices through the native host engine
        (porechop_tpu/native/align_host.cpp).  Returns False when the
        library can't build or the scheme is linear."""
        if os.environ.get('PORECHOP_TPU_NO_NATIVE'):
            return False
        from .. import native
        pairs = self.pairs[todo]
        t0 = time.perf_counter() if _TIMING else 0.0
        res = native.align_host_batch(self.windows, self.adapters, pairs,
                                      self.scoring,
                                      score_only=self._score_only)
        if res is None:
            return False
        if _TIMING:
            dt = time.perf_counter() - t0
            cells = int(sum(len(self.windows[self.pairs[k, 0]])
                            * len(self.adapters[self.pairs[k, 1]])
                            for k in todo))
            print('[timing] native batch P=%d: %.3fs (%.2e cells/s%s)'
                  % (len(todo), dt, cells / max(dt, 1e-9),
                     ', score-only' if self._score_only else ''),
                  file=sys.stderr, flush=True)
        if self._score_only:
            # Score-prefilter mode: only the best score (and the
            # degenerate marker) is meaningful; these lanes join the
            # score-only set so survivors re-run through the exact path.
            out['raw_score'][todo] = res[:, 4]
            out['read_start'][todo] = res[:, 0]
            self._score_lanes[todo] = True
            return True
        fields = ('read_start', 'read_end', 'adapter_start', 'adapter_end',
                  'raw_score', 'matches', 'aligned_len', 'full_len')
        for c, f in enumerate(fields):
            out[f][todo] = res[:, c]
        return True

    @staticmethod
    def _engine():
        """Engine selection: v2 (bitmap + device traceback) by default;
        PORECHOP_TPU_ENGINE=v1 selects the stat-carrying engine."""
        if os.environ.get('PORECHOP_TPU_ENGINE', 'v2') == 'v1':
            from . import engine_jax
            return engine_jax
        from . import engine_v2
        return engine_v2

    def _run_chunk(self, chunk, lb, amax, out, use_jax):
        B = len(chunk)
        if use_jax:
            engine = self._engine()
            Bp = _bucket_lanes(B)
            # Pack each distinct window/adapter once, then fan out to lanes
            # with one fancy-index (many pairs share a window: e.g. the
            # detection phase aligns every adapter against the same sample
            # windows, so this turns a P-long Python loop into a W-long one).
            wi = self.pairs[chunk, 0]
            ai = self.pairs[chunk, 1]
            uw, winv = np.unique(wi, return_inverse=True)
            ua, ainv = np.unique(ai, return_inverse=True)
            wmat = np.full((len(uw), lb), 4, dtype=np.int8)
            wlen = np.empty(len(uw), dtype=np.int32)
            for r, k in enumerate(uw):
                w = self.windows[k]
                wmat[r, :len(w)] = w
                wlen[r] = len(w)
            amat = np.full((len(ua), amax), 4, dtype=np.int8)
            alen = np.empty(len(ua), dtype=np.int32)
            for r, k in enumerate(ua):
                a = self.adapters[k]
                amat[r, :len(a)] = a
                alen[r] = len(a)
            reads = np.full((Bp, lb), 4, dtype=np.int8)
            adps = np.full((Bp, amax), 4, dtype=np.int8)
            rl = np.ones(Bp, dtype=np.int32)    # pad lanes: 1-bp dummy jobs
            al = np.ones(Bp, dtype=np.int32)
            reads[:B] = wmat[winv]
            adps[:B] = amat[ainv]
            rl[:B] = wlen[winv]
            al[:B] = alen[ainv]
            res = engine.align_batch(reads, rl, adps, al, self.scoring)
            for f in out:
                out[f][chunk] = res[f][:B]
        else:
            codes = 'ACGTN'
            for k in chunk:
                w = self.windows[self.pairs[k, 0]]
                a = self.adapters[self.pairs[k, 1]]
                r = spec.align_stats(''.join(codes[c] for c in w),
                                     ''.join(codes[c] for c in a),
                                     self.scoring)
                out['read_start'][k] = r.read_start
                out['read_end'][k] = r.read_end
                out['adapter_start'][k] = r.adapter_start
                out['adapter_end'][k] = r.adapter_end
                out['raw_score'][k] = r.raw_score
                out['matches'][k] = r.matches
                out['aligned_len'][k] = r.aligned_len
                out['full_len'][k] = r.full_len

    def _package(self, out):
        if self._group is not None or self._stats_only or self._score_only:
            # Group-max / stats mode: the consumers (run_group_max's fold
            # of the non-device-grouped remainder, run_stats) read the raw
            # integer fields — skip the two P-wide percent computations
            # (measured 0.3-0.6 s at 1M detection pairs, all of it wasted
            # when every lane was reduced on device).
            return dict(out)
        full_pct = seqan_pct_vec(out['matches'], out['full_len'])
        partial_pct = seqan_pct_vec(out['matches'], out['aligned_len'])
        failed = out['read_start'] == -1
        # align_adapter (reference nanopore_read.py:476-491): failure ->
        # zeros; read_end becomes exclusive via +1 otherwise.
        full_pct = np.where(failed, 0.0, full_pct)
        partial_pct = np.where(failed, 0.0, partial_pct)
        read_end_excl = np.where(failed, 0, out['read_end'] + 1)
        result = dict(out)
        result['full_pct'] = full_pct
        result['partial_pct'] = partial_pct
        result['read_end_excl'] = read_end_excl
        return result


def align_pairs(windows, adapters, pairs, scoring=(3, -6, -5, -2)) -> dict:
    """Convenience wrapper: windows/adapters are str or int8 code arrays."""
    enc_w = [w if isinstance(w, np.ndarray) else spec.encode(w) for w in windows]
    enc_a = [a if isinstance(a, np.ndarray) else spec.encode(a) for a in adapters]
    return AlignJobs(enc_w, enc_a, pairs, scoring).run()
