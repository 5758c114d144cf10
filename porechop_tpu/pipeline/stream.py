"""Bounded-memory streaming runner for large inputs.

The reference (and the default path here, mirroring it) loads every read
into memory and runs the three phases over the whole list
(porechop/porechop.py:33-79).  For multi-million-read production inputs
this runner instead:

1. runs adapter-set detection on the --check_reads sample (identical to the
   default path — the sample is the file's head),
2. then streams the remaining records in chunks: end-trim + middle-scan +
   serialize + write, dropping each chunk before loading the next.

Activated with PORECHOP_TPU_STREAM=<chunk_size> when verbosity is 0 (the
reference's progress lines and summaries assume whole-file totals up
front; at -v 0 none are printed, so the streamed output is byte-identical
to the default path).  Trimmed/split records are written in input order.
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

from ..utils.fastx import get_compression_type, get_sequence_file_type
from .model import Read
from .phases import (find_adapters_at_read_ends,
                     find_adapters_in_read_middles)


def stream_chunk_size(args) -> int | None:
    """The configured chunk size, or None when streaming doesn't apply."""
    raw = os.environ.get('PORECHOP_TPU_STREAM')
    if not raw:
        return None
    if args.verbosity > 0 or not os.path.isfile(args.input):
        return None
    try:
        n = int(raw)
    except ValueError:
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


def run_streaming(args, matching_sets, forward_or_reverse_barcodes,
                  read_type, chunk_size):
    """Phases 2+3 + output over chunks.  Only -v 0 runs come here."""
    check_barcodes = args.barcode_dir is not None
    out_format = args.format
    if out_format == 'auto':
        if args.output is None:
            out_format = read_type.lower()
        elif '.fasta.gz' in args.output.lower():
            out_format = 'fasta.gz'
        elif '.fastq.gz' in args.output.lower():
            out_format = 'fastq.gz'
        elif '.fasta' in args.output.lower():
            out_format = 'fasta'
        elif '.fastq' in args.output.lower():
            out_format = 'fastq'
        else:
            out_format = read_type.lower()
    gzipped_out = out_format.endswith('.gz') and (
        args.output is not None or args.barcode_dir is not None)
    plain_format = out_format[:-3] if gzipped_out else out_format

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

    bin_counts = defaultdict(int)

    def flush_chunk(reads):
        find_adapters_at_read_ends(
            reads, matching_sets, 0, args.end_size, args.extra_end_trim,
            args.end_threshold, args.scoring_scheme_vals, args.print_dest,
            args.min_trim_size, args.threads, check_barcodes,
            args.barcode_threshold, args.barcode_diff,
            args.require_two_barcodes, forward_or_reverse_barcodes)
        if not args.no_split:
            find_adapters_in_read_middles(
                reads, matching_sets, 0, args.middle_threshold,
                args.extra_middle_trim_good_side,
                args.extra_middle_trim_bad_side, args.scoring_scheme_vals,
                args.print_dest, args.threads, args.discard_middle)
        for read in reads:
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
                bin_counts[name] += 1

    chunk = []
    for name, seq, quals in _iter_records(args.input):
        chunk.append(Read(name, seq, quals or ''))
        if len(chunk) >= chunk_size:
            flush_chunk(chunk)
            chunk = []
    if chunk:
        flush_chunk(chunk)

    for name, fh in sinks.items():
        if fh is not sys.stdout:
            fh.close()
    if gzipped_out:
        import shutil
        import subprocess
        gzip_cmd = 'pigz -p %d' % args.threads if shutil.which('pigz') \
            else 'gzip'
        if args.barcode_dir is not None:
            for name in sinks:
                path = os.path.join(args.barcode_dir,
                                    name + '.' + plain_format)
                subprocess.check_output(gzip_cmd + ' ' + path, shell=True,
                                        stderr=subprocess.STDOUT)
        elif args.output is not None:
            subprocess.check_output(
                gzip_cmd + ' -c ' + args.output + '.tmp > ' + args.output,
                shell=True, stderr=subprocess.STDOUT)
            os.remove(args.output + '.tmp')
