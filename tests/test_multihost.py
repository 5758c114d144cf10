"""Multi-host runtime: 2 jax.distributed CPU processes on localhost must
produce byte-identical merged output to a single-process run.

Covers parallel/multihost.py: block partitioning, the cross-process
detection-stats collective (process_allgather + exact-fraction fold), the
per-rank part files, and the rank-0 merge — for -o (plain + gz) and -b.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = '/root/reference/test'
FIXTURE = os.path.join(FIXTURES, 'test_two_adapter_sets.fastq')

pytestmark = pytest.mark.skipif(not os.path.isfile(FIXTURE),
                                reason='reference fixtures unavailable')


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_single(args, cwd):
    env = dict(os.environ, JAX_PLATFORMS='cpu', PALLAS_AXON_POOL_IPS='',
               PORECHOP_TPU_NO_COMPILE_CACHE='1', PYTHONPATH=REPO)
    env.pop('PORECHOP_TPU_COORDINATOR', None)
    r = subprocess.run([sys.executable, '-m', 'porechop_tpu'] + args,
                       capture_output=True, text=True, env=env, cwd=cwd,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    return r


def _run_multi(args, cwd, n_procs=2):
    port = _free_port()
    procs = []
    for pid in range(n_procs):
        env = dict(os.environ, JAX_PLATFORMS='cpu', PALLAS_AXON_POOL_IPS='',
                   PORECHOP_TPU_NO_COMPILE_CACHE='1', PYTHONPATH=REPO,
                   PORECHOP_TPU_COORDINATOR='127.0.0.1:%d' % port,
                   PORECHOP_TPU_NUM_PROCS=str(n_procs),
                   PORECHOP_TPU_PROC_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, '-m', 'porechop_tpu'] + args,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=cwd))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-2000:]
        outs.append((out, err))
    return outs


def test_two_process_output_matches_single(tmp_path):
    single = tmp_path / 'single.fastq'
    multi = tmp_path / 'multi.fastq'
    _run_single(['-i', FIXTURE, '-o', str(single), '-v', '0'], str(tmp_path))
    _run_multi(['-i', FIXTURE, '-o', str(multi), '-v', '0'], str(tmp_path))
    assert multi.read_bytes() == single.read_bytes()


def test_two_process_gz_output_matches_single(tmp_path):
    import gzip
    single = tmp_path / 'single.fastq.gz'
    multi = tmp_path / 'multi.fastq.gz'
    _run_single(['-i', FIXTURE, '-o', str(single), '-v', '0'], str(tmp_path))
    _run_multi(['-i', FIXTURE, '-o', str(multi), '-v', '0'], str(tmp_path))
    with gzip.open(str(single)) as f:
        want = f.read()
    with gzip.open(str(multi)) as f:
        got = f.read()
    assert got == want


def test_two_process_barcode_bins_match_single(tmp_path):
    fixture = os.path.join(FIXTURES, 'test_barcodes.fastq')
    sdir = tmp_path / 'single_bins'
    mdir = tmp_path / 'multi_bins'
    _run_single(['-i', fixture, '-b', str(sdir), '-v', '0'], str(tmp_path))
    _run_multi(['-i', fixture, '-b', str(mdir), '-v', '0'], str(tmp_path))
    sfiles = sorted(os.listdir(sdir))
    mfiles = sorted(f for f in os.listdir(mdir) if not f.startswith('.'))
    assert mfiles == sfiles
    for f in sfiles:
        assert (mdir / f).read_bytes() == (sdir / f).read_bytes(), f
