"""Multi-host (multi-process) execution.

The reference parallelizes inside one process with a thread pool over
(read, adapter) items (reference porechop/porechop.py:24,308-322).  The
TPU-native scale-out adds the cross-host level that SURVEY.md §2.3 maps it
to: `jax.distributed` processes, each owning a contiguous block of the
input reads and its local devices.  Only one decision is global — which
adapter sets are present — so the per-(set, side) best-identity stats merge
across processes with one collective (process_allgather of two tiny int
vectors + an exact-fraction fold); phases 2 and 3 and serialization are
purely per-block, and each process writes its block to a part file that
rank 0 concatenates in rank order, making the merged bytes identical to a
single-process run over the same reads.

Activation: set PORECHOP_TPU_COORDINATOR=host:port, PORECHOP_TPU_NUM_PROCS
and PORECHOP_TPU_PROC_ID (see mesh.init_distributed) on every process and
run the same CLI command.  Progress text reflects each rank's own shard, so
-v 0 is recommended for byte-stable stderr/stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from collections import defaultdict

import numpy as np


def maybe_init():
    """Initializes jax.distributed from the PORECHOP_TPU_* env (no-op when
    unset) and returns True when running multi-process."""
    if not os.environ.get('PORECHOP_TPU_COORDINATOR'):
        return False
    from . import mesh
    mesh.init_distributed()
    return enabled()


def enabled() -> bool:
    import jax
    try:
        return jax.process_count() > 1
    except Exception:
        return False


def rank() -> int:
    import jax
    return jax.process_index()


def world() -> int:
    import jax
    return jax.process_count()


def block_slice(n: int):
    """Contiguous block partition of n items for this process: rank r gets
    [r*n//W, (r+1)*n//W) — order-preserving, so rank-ordered concatenation
    of outputs reproduces the single-process output order."""
    w, r = world(), rank()
    return (r * n) // w, ((r + 1) * n) // w


def sync(tag: str):
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)


def merge_detection_stats(gm, gl):
    """All-gathers the per-(set, side) best (matches, full_len) pairs and
    folds them under the exact-fraction order, so every process sees the
    global detection maxima (the reference's shared-memory max,
    nanopore_read.py:155-164, across hosts)."""
    from jax.experimental import multihost_utils
    local = np.stack([np.asarray(gm, np.int64),
                      np.asarray(gl, np.int64)], axis=1)   # (E, 2)
    allv = np.asarray(multihost_utils.process_allgather(local))
    allv = allv.reshape(world(), *local.shape)
    best_m = local[:, 0].copy()
    best_l = np.maximum(local[:, 1], 1)
    for r in range(world()):
        m, l = allv[r, :, 0], np.maximum(allv[r, :, 1], 1)
        better = m * best_l > best_m * l
        best_m[better] = m[better]
        best_l[better] = l[better]
    return best_m, best_l


def _part_path(base: str, r: int) -> str:
    return '%s.mhpart%04d' % (base, r)


def output_and_merge(reads, args, read_type, output_reads_fn):
    """Per-rank serialization + rank-0 merge.

    Every rank writes its block PLAIN (no compression) to a part file via
    the normal writer; after a barrier rank 0 concatenates the parts in
    rank order and applies the run's compression / final placement, so the
    merged artifact is byte-identical to a single-process run."""
    from ..pipeline import output as out_mod

    out_format = out_mod.resolve_format(args.format, args.output, read_type,
                                        args.barcode_dir, args.input)
    plain = out_format[:-3] if out_format.endswith('.gz') else out_format
    r, w = rank(), world()

    if args.barcode_dir is not None:
        part_dir = os.path.join(args.barcode_dir, '.mh%04d' % r)
        counts = output_reads_fn(
            reads, plain, None, read_type, 0, args.discard_middle,
            args.min_split_read_size, args.print_dest, part_dir,
            args.input, args.untrimmed, args.threads,
            args.discard_unassigned, return_counts=True)
        with open(os.path.join(part_dir, 'counts.json'), 'w') as f:
            json.dump(counts, f)
        sync('porechop-tpu-bins')
        if r == 0:
            _merge_bins(args, plain, out_format.endswith('.gz'))
        sync('porechop-tpu-bins-done')
        return

    if args.output is None:
        part = _part_path('PORECHOP_TPU_STDOUT_%d' % _run_tag(), r)
    else:
        part = _part_path(args.output, r)
    output_reads_fn(reads, plain, part, read_type, 0, args.discard_middle,
                    args.min_split_read_size, args.print_dest, None,
                    args.input, args.untrimmed, args.threads,
                    args.discard_unassigned)
    sync('porechop-tpu-parts')
    if r == 0:
        parts = [(_part_path('PORECHOP_TPU_STDOUT_%d' % _run_tag(), k)
                  if args.output is None else _part_path(args.output, k))
                 for k in range(w)]
        if args.output is None:
            for p in parts:
                with open(p) as f:
                    sys.stdout.write(f.read())
                os.remove(p)
        else:
            gz = out_format.endswith('.gz')
            target = args.output if not gz else args.output + '.mhplain'
            with open(target, 'wb') as out:
                for p in parts:
                    with open(p, 'rb') as f:
                        out.write(f.read())
                    os.remove(p)
            if gz:
                gzip_command = out_mod.gzip_command_for(args.threads, 0)
                subprocess.check_output(
                    gzip_command + ' -c ' + target + ' > ' + args.output,
                    stderr=subprocess.STDOUT, shell=True)
                os.remove(target)
    sync('porechop-tpu-parts-done')


def _run_tag() -> int:
    """A tag shared by all ranks of one run (parts must agree on names):
    the coordinator port is unique per run on a machine."""
    coord = os.environ.get('PORECHOP_TPU_COORDINATOR', ':0')
    try:
        return int(coord.rsplit(':', 1)[1])
    except ValueError:
        return 0


def _merge_bins(args, plain_format, gzipped):
    """Rank 0: append each rank's bin parts in rank order, aggregate the
    counts, compress, and print the counts table (reference
    porechop.py:679-704) from the aggregated numbers."""
    from ..pipeline import output as out_mod
    from ..utils.text import int_to_str, print_table

    w = world()
    read_counts = defaultdict(int)
    base_counts = defaultdict(int)
    names = []
    for k in range(w):
        part_dir = os.path.join(args.barcode_dir, '.mh%04d' % k)
        with open(os.path.join(part_dir, 'counts.json')) as f:
            counts = json.load(f)
        for name, (rc, bc) in counts.items():
            if name not in names:
                names.append(name)
            read_counts[name] += rc
            base_counts[name] += bc
        for name in counts:
            src = os.path.join(part_dir, name + '.' + plain_format)
            dst = os.path.join(args.barcode_dir, name + '.' + plain_format)
            with open(dst, 'ab') as out, open(src, 'rb') as f:
                out.write(f.read())
            os.remove(src)
        os.remove(os.path.join(part_dir, 'counts.json'))
        os.rmdir(part_dir)

    gzip_command = out_mod.gzip_command_for(args.threads, 0)
    table = [['Barcode', 'Reads', 'Bases', 'File']]
    for name in sorted(names):
        bin_filename = os.path.join(args.barcode_dir,
                                    name + '.' + plain_format)
        if gzipped:
            if not os.path.isfile(bin_filename):
                continue
            gz_name = bin_filename + '.gz'
            if os.path.isfile(gz_name):
                os.remove(gz_name)
            try:
                subprocess.check_output(gzip_command + ' ' + bin_filename,
                                        stderr=subprocess.STDOUT, shell=True)
            except subprocess.CalledProcessError:
                pass                     # reference ignores gzip failures
            bin_filename = gz_name
        table.append([name, int_to_str(read_counts[name]),
                      int_to_str(base_counts[name]), bin_filename])
    if args.verbosity > 0:
        print('')
        print_table(table, args.print_dest, alignments='LRRL',
                    max_col_width=60, col_separation=2)
