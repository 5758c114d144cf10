"""Bounded-memory streaming runner for large inputs.

The reference (and the default path here, mirroring it) loads every read
into memory and runs the three phases over the whole list
(porechop/porechop.py:33-79).  For multi-million-read production inputs
this runner instead:

1. runs adapter-set detection on the --check_reads sample (identical to the
   default path — the sample is the file's head),
2. then streams the remaining records in chunks: end-trim + middle-scan +
   serialize + write, dropping each chunk before loading the next.

Activated with the (hidden) --stream <chunk_size> flag or
PORECHOP_TPU_STREAM=<chunk_size>.  Verbosity 0 and 1 are supported with
byte-identical output to the in-memory path: the v1 text is re-sequenced —
phase-2 progress prints live as chunks finish their phase 2 (phase 3 is
silent inside chunks), while the phase-2 summary, the whole phase-3 block,
and the output section (including the barcode counts table, rebuilt from
accumulated counters) print after the last chunk, in the reference's
order.  Totals for progress come from a cheap record-counting pre-pass.
Verbosity >= 2 needs per-read dumps in input order mid-stream and falls
back to the in-memory path.
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

from ..utils.fastx import get_compression_type, get_sequence_file_type
from ..utils.text import bold_underline, int_to_str, print_table
from .model import Read
from .output import gzip_command_for, resolve_format
from .phases import (end_trim_summary_counts, find_adapters_at_read_ends,
                     find_adapters_in_read_middles, middle_summary_counts,
                     output_progress_line, print_end_trim_header)


def stream_chunk_size(args) -> int | None:
    """The configured chunk size, or None when streaming doesn't apply."""
    raw = getattr(args, 'stream', None) or os.environ.get(
        'PORECHOP_TPU_STREAM')
    if not raw:
        return None
    if args.verbosity > 1 or not os.path.isfile(args.input):
        return None
    try:
        n = int(raw)
    except (TypeError, ValueError):
        return None
    return n if n > 0 else None


def _iter_records(path):
    """Yields (name, seq, quals_or_None) streaming from disk."""
    kind = get_sequence_file_type(path)
    if get_compression_type(path) == 'gz':
        import gzip
        fh = gzip.open(path, 'rt')
    else:
        fh = open(path, 'rt')
    with fh:
        if kind == 'FASTQ':
            while True:
                header = fh.readline()
                if not header:
                    return
                header = header.strip()
                if not header:
                    continue
                seq = fh.readline().strip()
                fh.readline()
                quals = fh.readline().strip()
                yield header[1:], seq, quals
        else:
            name, parts = None, []
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                if line.startswith('>'):
                    if name:
                        yield name, ''.join(parts), None
                    name, parts = line[1:], []
                else:
                    parts.append(line)
            if name:
                yield name, ''.join(parts), None


def count_records(path) -> int:
    """Cheap record-counting pre-pass (for v1 progress totals)."""
    return sum(1 for _ in _iter_records(path))


def run_streaming(args, matching_sets, forward_or_reverse_barcodes,
                  read_type, chunk_size, total_reads=None):
    """Phases 2+3 + output over chunks; verbosity 0 or 1."""
    check_barcodes = args.barcode_dir is not None
    verbosity = args.verbosity
    dest = args.print_dest
    out_format = resolve_format(args.format, args.output, read_type,
                                args.barcode_dir, args.input)
    gzipped_out = out_format.endswith('.gz') and (
        args.output is not None or args.barcode_dir is not None)
    plain_format = out_format[:-3] if gzipped_out else out_format

    if verbosity > 0 and total_reads is None:
        total_reads = count_records(args.input)

    sinks = {}

    def sink_for(name):
        if name not in sinks:
            if args.barcode_dir is not None:
                if not os.path.isdir(args.barcode_dir):
                    os.makedirs(args.barcode_dir)
                sinks[name] = open(os.path.join(
                    args.barcode_dir, name + '.' + plain_format), 'wt')
            elif args.output is None:
                sinks[name] = sys.stdout
            else:
                sinks[name] = open(args.output + ('.tmp' if gzipped_out
                                                  else ''), 'wt')
        return sinks[name]

    bin_read_counts = defaultdict(int)
    bin_base_counts = defaultdict(int)
    totals = dict(start_count=0, start_total=0, end_count=0, end_total=0,
                  middle_count=0, done=0)

    if verbosity > 0 and matching_sets:
        print_end_trim_header(matching_sets, dest)
        output_progress_line(0, total_reads, dest)

    def flush_chunk(reads):
        if matching_sets:
            find_adapters_at_read_ends(
                reads, matching_sets, 0, args.end_size, args.extra_end_trim,
                args.end_threshold, args.scoring_scheme_vals, dest,
                args.min_trim_size, args.threads, check_barcodes,
                args.barcode_threshold, args.barcode_diff,
                args.require_two_barcodes, forward_or_reverse_barcodes)
            if verbosity > 0:
                # Live phase-2 progress over the global index range (every
                # 10th + the final one, like output_progress_line's step).
                for r in range(totals['done'] + 1,
                               totals['done'] + len(reads) + 1):
                    output_progress_line(r, total_reads, dest)
            if not args.no_split:
                find_adapters_in_read_middles(
                    reads, matching_sets, 0, args.middle_threshold,
                    args.extra_middle_trim_good_side,
                    args.extra_middle_trim_bad_side, args.scoring_scheme_vals,
                    dest, args.threads, args.discard_middle)
        totals['done'] += len(reads)
        for read in reads:
            totals['start_count'] += 1 if read.start_trim_amount else 0
            totals['start_total'] += read.start_trim_amount
            totals['end_count'] += 1 if read.end_trim_amount else 0
            totals['end_total'] += read.end_trim_amount
            totals['middle_count'] += 1 if read.middle_adapter_ranges else 0
            if args.barcode_dir is not None:
                name = read.barcode_call
                if args.discard_unassigned and name == 'none':
                    continue
            else:
                name = '__out__'
            if plain_format == 'fasta':
                s = read.get_fasta(args.min_split_read_size,
                                   args.discard_middle, args.untrimmed)
            else:
                s = read.get_fastq(args.min_split_read_size,
                                   args.discard_middle, args.untrimmed)
            if s:
                sink_for(name).write(s)
                bin_read_counts[name] += 1
                if args.untrimmed:
                    bin_base_counts[name] += len(read.seq)
                else:
                    bin_base_counts[name] += (
                        read.seq_length_with_start_end_adapters_trimmed())

    chunk = []
    for name, seq, quals in _iter_records(args.input):
        chunk.append(Read(name, seq, quals or ''))
        if len(chunk) >= chunk_size:
            flush_chunk(chunk)
            chunk = []
    if chunk:
        flush_chunk(chunk)

    # Deferred v1 text: phase-2 close + summary, then the whole phase-3
    # block (its progress is a pure function of the totals), in the
    # reference's order (porechop.py:517-604).
    if verbosity > 0 and matching_sets:
        output_progress_line(total_reads, total_reads, dest,
                             end_newline=True)
        print('', file=dest)
        end_trim_summary_counts(total_reads, totals['start_count'],
                                totals['start_total'], totals['end_count'],
                                totals['end_total'], dest)
        if not args.no_split:
            verb = 'Discarding' if args.discard_middle else 'Splitting'
            print(bold_underline(verb + ' reads containing middle adapters'),
                  file=dest)
            output_progress_line(0, total_reads, dest)
            for r in range(1, total_reads + 1):
                output_progress_line(r if args.threads == 1 else r + 1,
                                     total_reads, dest)
            output_progress_line(total_reads, total_reads, dest,
                                 end_newline=True)
            print('', flush=True, file=dest)
            middle_summary_counts(totals['middle_count'], total_reads,
                                  args.discard_middle, dest)
    elif verbosity > 0:
        print('No adapters found - output reads are unchanged from input '
              'reads\n', file=dest)

    # Output section (reference porechop.py:607-704 text order).
    if verbosity > 0:
        trimmed_or_untrimmed = 'untrimmed' if args.untrimmed else 'trimmed'
        if args.barcode_dir is not None:
            verb, destination = 'Saving ', 'barcode-specific files'
        elif args.output is None:
            verb, destination = 'Outputting ', 'stdout'
        else:
            verb, destination = 'Saving ', 'file'
        print(bold_underline(verb + trimmed_or_untrimmed + ' reads to '
                             + destination), flush=True, file=dest)

    gzip_cmd = (gzip_command_for(args.threads, verbosity, dest)
                if gzipped_out else 'gzip')

    for name, fh in sinks.items():
        if fh is not sys.stdout:
            fh.close()

    if args.barcode_dir is not None:
        import subprocess
        table = [['Barcode', 'Reads', 'Bases', 'File']]
        for name in sorted(sinks):
            bin_filename = os.path.join(args.barcode_dir,
                                        name + '.' + plain_format)
            if gzipped_out:
                if not os.path.isfile(bin_filename):
                    continue
                gz_name = bin_filename + '.gz'
                if os.path.isfile(gz_name):
                    os.remove(gz_name)
                try:
                    subprocess.check_output(gzip_cmd + ' ' + bin_filename,
                                            stderr=subprocess.STDOUT,
                                            shell=True)
                except subprocess.CalledProcessError:
                    pass            # reference ignores bin-gzip failures
                bin_filename = gz_name
            table.append([name, int_to_str(bin_read_counts[name]),
                          int_to_str(bin_base_counts[name]), bin_filename])
        if verbosity > 0:
            print('')
            print_table(table, dest, alignments='LRRL', max_col_width=60,
                        col_separation=2)
    elif args.output is None:
        if verbosity > 0:
            print('Done', flush=True, file=dest)
    else:
        if gzipped_out:
            import subprocess
            subprocess.check_output(
                gzip_cmd + ' -c ' + args.output + '.tmp > ' + args.output,
                shell=True, stderr=subprocess.STDOUT)
            os.remove(args.output + '.tmp')
        if verbosity > 0:
            print('\nSaved result to ' + os.path.abspath(args.output),
                  file=dest)
    if verbosity > 0:
        print('', flush=True, file=dest)
