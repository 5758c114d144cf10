#!/usr/bin/env python3
"""Ad-hoc perf probe for the bench workload (not part of the package).

Runs the full pipeline once warm and prints per-phase wall times to stderr
(line-buffered) so interrupted runs still show progress.
"""
import contextlib
import io
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N = int(os.environ.get('PB_READS', '512'))
L = int(os.environ.get('PB_LEN', '10000'))
REPEATS = int(os.environ.get('PB_REPEATS', '2'))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from porechop_tpu.utils import synth
    fastq = '/tmp/porechop_bench_%dx%d.fastq' % (N, L)
    synth.ensure_fastq(fastq, n_reads=N, read_len=L, seed=0)
    from porechop_tpu.cli import main as cli_main
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, 'out.fastq')
        args = ['-i', fastq, '-o', out, '-v', '0']
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(io.StringIO()):
            cli_main(args)
        log('warmup: %.2fs' % (time.perf_counter() - t0))
        best = float('inf')
        for r in range(REPEATS):
            t0 = time.perf_counter()
            with contextlib.redirect_stdout(io.StringIO()):
                cli_main(args)
            dt = time.perf_counter() - t0
            log('run %d: %.3fs  %.1f reads/s' % (r, dt, N / dt))
            best = min(best, dt)
        log('BEST %.3fs  %.1f reads/s' % (best, N / best))


if __name__ == '__main__':
    main()
