#!/usr/bin/env python3
"""The 1M-read stretch run (BASELINE.json configs[4]): generate a gzipped
1M x 1 kb synthetic FASTQ, trim it end-to-end with --stream (bounded
memory), and report wall time, reads/s and peak RSS.  Optionally also runs
the 2-process multi-host x streaming composition.

Usage: python tools/stretch_1m.py [--reads N] [--len L] [--multihost]
       [--force-host] [--chunk C]
"""
import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Peak RSS via VmHWM: on Linux the child's ru_maxrss inherits the FORKING
# PARENT's high-water mark across exec (observed: a 900 MB parent makes
# every child report >= 900 MB), while /proc/self/status VmHWM tracks the
# fresh post-exec mm.
RUNNER = r'''
import sys, time
t0 = time.time()
from porechop_tpu.cli import main
main(sys.argv[1:])
hwm = [l for l in open("/proc/self/status") if l.startswith("VmHWM")]
rss_mb = int(hwm[0].split()[1]) / 1024.0
print("STRETCH wall=%.1f rss_mb=%.0f" % (time.time() - t0, rss_mb),
      file=sys.stderr)
'''


def run_child(args, env=None, tag=''):
    # PREPEND to PYTHONPATH: replacing it would drop the axon
    # sitecustomize dir and break the tunneled-TPU backend registration.
    e = dict(os.environ)
    e['PYTHONPATH'] = REPO + os.pathsep + e.get('PYTHONPATH', '')
    if env:
        e.update(env)
    p = subprocess.run([sys.executable, '-c', RUNNER] + args,
                       capture_output=True, text=True, env=e, timeout=7200)
    stats = None
    for line in p.stderr.splitlines():
        if line.startswith('STRETCH '):
            stats = dict(kv.split('=') for kv in line.split()[1:])
    if p.returncode != 0 or stats is None:
        print(p.stderr[-3000:], file=sys.stderr)
        sys.exit('stretch child failed (%s)' % tag)
    return float(stats['wall']), float(stats['rss_mb'])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reads', type=int, default=1_000_000)
    ap.add_argument('--len', dest='read_len', type=int, default=1000)
    ap.add_argument('--chunk', type=int, default=20_000)
    ap.add_argument('--multihost', action='store_true')
    ap.add_argument('--force-host', action='store_true')
    args = ap.parse_args()

    from porechop_tpu.utils import synth
    fastq = '/tmp/porechop_stretch_%dx%d.fastq.gz' % (args.reads,
                                                      args.read_len)
    t0 = time.time()
    synth.ensure_fastq_streamed(fastq, args.reads, args.read_len, seed=7)
    print('input: %s (%.2f GB gz, synth %.0fs)'
          % (fastq, os.path.getsize(fastq) / 2**30, time.time() - t0),
          flush=True)

    env = {'PORECHOP_TPU_STREAM': str(args.chunk)}
    if args.force_host:
        env['PORECHOP_TPU_FORCE_HOST'] = '1'

    out = '/tmp/porechop_stretch_out.fastq'
    wall, rss = run_child(['-i', fastq, '-o', out, '-v', '0'], env=env,
                          tag='single')
    print(json.dumps({
        'config': 'stretch-1M-stream', 'reads': args.reads,
        'read_len': args.read_len, 'chunk': args.chunk,
        'engine': 'host' if args.force_host else 'hybrid',
        'wall_s': round(wall, 1), 'reads_per_s': round(args.reads / wall, 1),
        'peak_rss_mb': round(rss),
        'output_bytes': os.path.getsize(out)}), flush=True)
    os.remove(out)

    if args.multihost:
        s = socket.socket()
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]
        s.close()
        procs = []
        mout = '/tmp/porechop_stretch_out_mh.fastq'
        t0 = time.time()
        for pid in range(2):
            # CPU backend for the 2-process run: two jax.distributed
            # ranks cannot share the single tunneled chip.
            e = dict(os.environ,
                     JAX_PLATFORMS='cpu', PALLAS_AXON_POOL_IPS='',
                     PORECHOP_TPU_STREAM=str(args.chunk),
                     PORECHOP_TPU_COORDINATOR='127.0.0.1:%d' % port,
                     PORECHOP_TPU_NUM_PROCS='2',
                     PORECHOP_TPU_PROC_ID=str(pid))
            e['PYTHONPATH'] = REPO + os.pathsep + e.get('PYTHONPATH', '')
            if args.force_host:
                e['PORECHOP_TPU_FORCE_HOST'] = '1'
            procs.append(subprocess.Popen(
                [sys.executable, '-c', RUNNER, '-i', fastq, '-o', mout,
                 '-v', '0'], env=e, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True))
        rss_mh = []
        for p in procs:
            out_, err = p.communicate(timeout=7200)
            if p.returncode != 0:
                print(err[-3000:], file=sys.stderr)
                sys.exit('multihost stretch child failed')
            for line in err.splitlines():
                if line.startswith('STRETCH '):
                    kv = dict(x.split('=') for x in line.split()[1:])
                    rss_mh.append(float(kv['rss_mb']))
        wall_mh = time.time() - t0
        print(json.dumps({
            'config': 'stretch-1M-stream-2proc', 'reads': args.reads,
            'read_len': args.read_len, 'wall_s': round(wall_mh, 1),
            'reads_per_s': round(args.reads / wall_mh, 1),
            'peak_rss_mb_per_rank': [round(x) for x in rss_mh],
            'output_bytes': os.path.getsize(mout)}), flush=True)
        os.remove(mout)


if __name__ == '__main__':
    main()
