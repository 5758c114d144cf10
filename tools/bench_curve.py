#!/usr/bin/env python3
"""Reads/s crossover curve: host-native vs TPU path across workload sizes
(VERDICT r3 task 1).  Each point runs the full CLI end-to-end on a
synthetic N x 10 kb FASTQ, once with PORECHOP_TPU_FORCE_HOST=1 and once on
the device path, in subprocesses (a wedged tunnel can't hang the sweep).
Optionally measures reference Porechop on the same workloads (--ref).

Usage: python tools/bench_curve.py [--sizes 512,2048,4096,8192] [--ref]
Writes one JSON line per point and a summary table to stdout.
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_point(n_reads, force_host, read_len=10000, repeats=3,
              timeout_s=1800):
    code = (
        'import sys, time, os, tempfile, contextlib, io\n'
        'sys.path.insert(0, %r)\n'
        'from porechop_tpu.utils import synth\n'
        'from porechop_tpu.cli import main\n'
        'fq = "/tmp/porechop_bench_%%dx%%d.fastq" %% (%d, %d)\n'
        'synth.ensure_fastq(fq, n_reads=%d, read_len=%d, seed=0)\n'
        'with tempfile.TemporaryDirectory() as d:\n'
        '    out = os.path.join(d, "out.fastq")\n'
        '    args = ["-i", fq, "-o", out, "-v", "0"]\n'
        '    def once():\n'
        '        with contextlib.redirect_stdout(io.StringIO()), '
        'contextlib.redirect_stderr(io.StringIO()):\n'
        '            main(args)\n'
        '    once()\n'
        '    walls = []\n'
        '    for _ in range(%d):\n'
        '        t0 = time.perf_counter(); once()\n'
        '        walls.append(time.perf_counter() - t0)\n'
        'walls.sort()\n'
        'print("WALLS", " ".join("%%.4f" %% w for w in walls))\n'
        % (REPO, n_reads, read_len, n_reads, read_len, repeats))
    env = dict(os.environ)
    if force_host:
        env['PORECHOP_TPU_FORCE_HOST'] = '1'
    else:
        env.pop('PORECHOP_TPU_FORCE_HOST', None)
    try:
        r = subprocess.run([sys.executable, '-c', code], env=env,
                           capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None, 'timeout'
    for line in r.stdout.splitlines():
        if line.startswith('WALLS'):
            walls = [float(x) for x in line.split()[1:]]
            return walls, None
    return None, 'rc=%d %s' % (r.returncode, r.stderr[-500:])


def run_reference(n_reads, read_len=10000, timeout_s=7200):
    from tests.test_cli_parity import SHADOW, _build_shadow
    if not _build_shadow():
        return None
    from porechop_tpu.utils import synth
    fq = '/tmp/porechop_bench_%dx%d.fastq' % (n_reads, read_len)
    synth.ensure_fastq(fq, n_reads=n_reads, read_len=read_len, seed=0)
    code = ('import sys, time, tempfile, os\n'
            'fq = sys.argv[1]\n'
            'with tempfile.TemporaryDirectory() as d:\n'
            '    out = os.path.join(d, "ref.fastq")\n'
            '    sys.argv = ["porechop", "-i", fq, "-o", out, "-v", "0"]\n'
            '    t0 = time.time()\n'
            '    from porechop.porechop import main\n'
            '    main()\n'
            '    print("WALL", time.time() - t0)\n')
    env = dict(os.environ, PYTHONPATH=SHADOW)
    r = subprocess.run([sys.executable, '-c', code, fq], env=env,
                       capture_output=True, text=True, timeout=timeout_s)
    for line in r.stdout.splitlines():
        if line.startswith('WALL'):
            return float(line.split()[1])
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sizes', default='512,2048,4096,8192')
    ap.add_argument('--read-len', type=int, default=10000)
    ap.add_argument('--repeats', type=int, default=3)
    ap.add_argument('--ref', action='store_true',
                    help='also measure reference Porechop per size')
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(',')]
    rows = []
    for n in sizes:
        point = {'n_reads': n, 'read_len': args.read_len,
                 'ts': time.strftime('%Y-%m-%d %H:%M:%S')}
        for label, fh in (('host', True), ('tpu', False)):
            walls, err = run_point(n, fh, args.read_len, args.repeats)
            if walls is None:
                point[label] = {'error': err}
                print('[curve] %d %s FAILED: %s' % (n, label, err),
                      file=sys.stderr, flush=True)
            else:
                point[label] = {
                    'best_rps': round(n / walls[0], 1),
                    'median_rps': round(n / walls[len(walls) // 2], 1),
                    'walls': walls}
        if args.ref:
            w = run_reference(n, args.read_len)
            if w:
                point['reference'] = {'rps': round(n / w, 1), 'wall': w}
        print(json.dumps(point), flush=True)
        rows.append(point)
    print('\n%8s %12s %12s %12s' % ('reads', 'host r/s', 'tpu r/s',
                                    'ref r/s'), file=sys.stderr)
    for p in rows:
        print('%8d %12s %12s %12s' % (
            p['n_reads'],
            p.get('host', {}).get('median_rps', '-'),
            p.get('tpu', {}).get('median_rps', '-'),
            p.get('reference', {}).get('rps', '-')), file=sys.stderr)


if __name__ == '__main__':
    main()
