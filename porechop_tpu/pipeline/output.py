"""Output writer: format resolution, stdout/file/barcode-bin routing and
compression (reference porechop.py:607-734)."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from collections import defaultdict

from ..utils.text import bold_underline, int_to_str, print_table


def output_reads(reads, out_format, output, read_type, verbosity,
                 discard_middle, min_split_size, print_dest, barcode_dir,
                 input_filename, untrimmed, threads, discard_unassigned):
    if verbosity > 0:
        trimmed_or_untrimmed = 'untrimmed' if untrimmed else 'trimmed'
        if barcode_dir is not None:
            verb, destination = 'Saving ', 'barcode-specific files'
        elif output is None:
            verb, destination = 'Outputting ', 'stdout'
        else:
            verb, destination = 'Saving ', 'file'
        print(bold_underline(verb + trimmed_or_untrimmed + ' reads to '
                             + destination), flush=True, file=print_dest)

    if out_format == 'auto':
        if output is None:
            out_format = read_type.lower()
            if barcode_dir is not None and input_filename.lower().endswith('.gz'):
                out_format += '.gz'
        elif '.fasta.gz' in output.lower():
            out_format = 'fasta.gz'
        elif '.fastq.gz' in output.lower():
            out_format = 'fastq.gz'
        elif '.fasta' in output.lower():
            out_format = 'fasta'
        elif '.fastq' in output.lower():
            out_format = 'fastq'
        else:
            out_format = read_type.lower()

    gzipped_out = False
    gzip_command = 'gzip'
    if out_format.endswith('.gz') and (barcode_dir is not None
                                       or output is not None):
        gzipped_out = True
        out_format = out_format[:-3]
        if shutil.which('pigz'):
            if verbosity > 0:
                print('pigz found - using it to compress instead of gzip')
            gzip_command = 'pigz -p ' + str(threads)
        else:
            if verbosity > 0:
                print('pigz not found - using gzip to compress')

    if barcode_dir is not None:
        _output_to_bins(reads, out_format, verbosity, discard_middle,
                        min_split_size, print_dest, barcode_dir, untrimmed,
                        gzipped_out, gzip_command, discard_unassigned)
    elif output is None:
        for read in reads:
            read_str = (read.get_fasta(min_split_size, discard_middle)
                        if out_format == 'fasta'
                        else read.get_fastq(min_split_size, discard_middle))
            print(read_str, end='')
        if verbosity > 0:
            print('Done', flush=True, file=print_dest)
    else:
        if gzipped_out:
            out_filename = 'TEMP_' + str(os.getpid()) + '.fastq'
        else:
            out_filename = output
        with open(out_filename, 'wt') as out:
            for read in reads:
                read_str = (read.get_fasta(min_split_size, discard_middle)
                            if out_format == 'fasta'
                            else read.get_fastq(min_split_size, discard_middle))
                out.write(read_str)
        if gzipped_out:
            subprocess.check_output(gzip_command + ' -c ' + out_filename
                                    + ' > ' + output,
                                    stderr=subprocess.STDOUT, shell=True)
            os.remove(out_filename)
        if verbosity > 0:
            print('\nSaved result to ' + os.path.abspath(output),
                  file=print_dest)

    if verbosity > 0:
        print('', flush=True, file=print_dest)


def _output_to_bins(reads, out_format, verbosity, discard_middle,
                    min_split_size, print_dest, barcode_dir, untrimmed,
                    gzipped_out, gzip_command, discard_unassigned):
    if not os.path.isdir(barcode_dir):
        os.makedirs(barcode_dir)
    barcode_files = {}
    barcode_read_counts = defaultdict(int)
    barcode_base_counts = defaultdict(int)
    for read in reads:
        barcode_name = read.barcode_call
        if discard_unassigned and barcode_name == 'none':
            continue
        if out_format == 'fasta':
            read_str = read.get_fasta(min_split_size, discard_middle, untrimmed)
        else:
            read_str = read.get_fastq(min_split_size, discard_middle, untrimmed)
        if not read_str:
            continue
        if barcode_name not in barcode_files:
            barcode_files[barcode_name] = open(
                os.path.join(barcode_dir, barcode_name + '.' + out_format), 'wt')
        barcode_files[barcode_name].write(read_str)
        barcode_read_counts[barcode_name] += 1
        if untrimmed:
            seq_length = len(read.seq)
        else:
            seq_length = read.seq_length_with_start_end_adapters_trimmed()
        barcode_base_counts[barcode_name] += seq_length

    table = [['Barcode', 'Reads', 'Bases', 'File']]
    for barcode_name in sorted(barcode_files.keys()):
        barcode_files[barcode_name].close()
        bin_filename = os.path.join(barcode_dir,
                                    barcode_name + '.' + out_format)
        if gzipped_out:
            if not os.path.isfile(bin_filename):
                continue
            bin_filename_gz = bin_filename + '.gz'
            if os.path.isfile(bin_filename_gz):
                os.remove(bin_filename_gz)
            try:
                subprocess.check_output(gzip_command + ' ' + bin_filename,
                                        stderr=subprocess.STDOUT, shell=True)
            except subprocess.CalledProcessError:
                pass
            bin_filename = bin_filename_gz
        table.append([barcode_name,
                      int_to_str(barcode_read_counts[barcode_name]),
                      int_to_str(barcode_base_counts[barcode_name]),
                      bin_filename])
    if verbosity > 0:
        print('')
        print_table(table, print_dest, alignments='LRRL', max_col_width=60,
                    col_separation=2)
