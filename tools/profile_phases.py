#!/usr/bin/env python3
"""Phase-level breakdown of the bench workload (VERDICT r2 task 1).

Runs the exact bench pipeline (512 x 10 kb synthetic reads, -v 0) once warm,
then times each phase separately, printing a table to stderr.  Honors
PORECHOP_TPU_FORCE_HOST / PORECHOP_TPU_TIMING like the real CLI.
"""
import contextlib
import io
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get('PB_READS', '512'))
L = int(os.environ.get('PB_LEN', '10000'))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run_once(fastq, label):
    from porechop_tpu.cli import get_arguments
    from porechop_tpu.pipeline.phases import (
        add_full_barcode_adapter_sets, find_adapters_at_read_ends,
        find_adapters_in_read_middles, find_matching_adapter_sets,
        fix_up_1d2_sets, load_reads)
    from porechop_tpu.pipeline.output import output_reads
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, 'out.fastq')
        args = get_arguments(['-i', fastq, '-o', out, '-v', '0'])
        ts = {}
        t0 = time.perf_counter()
        reads, check_reads, read_type = load_reads(
            args.input, 0, args.print_dest, args.check_reads)
        ts['load'] = time.perf_counter() - t0

        t0 = time.perf_counter()
        matching_sets = find_matching_adapter_sets(
            check_reads, 0, args.end_size, args.scoring_scheme_vals,
            args.print_dest, args.adapter_threshold, args.threads)
        matching_sets = fix_up_1d2_sets(matching_sets)
        matching_sets = add_full_barcode_adapter_sets(matching_sets)
        ts['detect'] = time.perf_counter() - t0

        t0 = time.perf_counter()
        find_adapters_at_read_ends(
            reads, matching_sets, 0, args.end_size, args.extra_end_trim,
            args.end_threshold, args.scoring_scheme_vals, args.print_dest,
            args.min_trim_size, args.threads, False, args.barcode_threshold,
            args.barcode_diff, args.require_two_barcodes, None)
        ts['endtrim'] = time.perf_counter() - t0

        t0 = time.perf_counter()
        find_adapters_in_read_middles(
            reads, matching_sets, 0, args.middle_threshold,
            args.extra_middle_trim_good_side, args.extra_middle_trim_bad_side,
            args.scoring_scheme_vals, args.print_dest, args.threads,
            args.discard_middle)
        ts['middle'] = time.perf_counter() - t0

        t0 = time.perf_counter()
        with contextlib.redirect_stdout(io.StringIO()):
            output_reads(reads, args.format, out, read_type, 0,
                         args.discard_middle, args.min_split_read_size,
                         args.print_dest, None, args.input, False,
                         args.threads, False)
        ts['output'] = time.perf_counter() - t0

        total = sum(ts.values())
        log('%s: total %.3fs (%.1f r/s)  %s' % (
            label, total, N / total,
            '  '.join('%s=%.3fs' % kv for kv in ts.items())))
        return ts


def main():
    from porechop_tpu.utils import synth
    fastq = '/tmp/porechop_bench_%dx%d.fastq' % (N, L)
    synth.ensure_fastq(fastq, n_reads=N, read_len=L, seed=0)
    run_once(fastq, 'warmup')
    for r in range(int(os.environ.get('PB_REPEATS', '2'))):
        run_once(fastq, 'run%d' % r)


if __name__ == '__main__':
    main()
