"""Black-box CLI parity: run our CLI and the reference CLI on the
reference's own test fixtures across the flag matrix its test suite
exercises (test/test_*.py), and require byte-identical stdout, stderr and
output files (gzipped files compared decompressed).

The reference runs from a shadow tree in /tmp with a freshly compiled
cpp_functions.so; everything is skipped if that can't be built.
"""

import contextlib
import glob
import gzip
import io
import os
import shutil
import subprocess
import sys
import types

import pytest

from . import oracle

REF_ROOT = oracle.REF_ROOT
SHADOW = '/tmp/porechop_tpu_refcli'
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REF_ROOT, 'test')


def _build_shadow():
    if not oracle.available():
        return False
    pkg = os.path.join(SHADOW, 'porechop')
    if not os.path.isfile(os.path.join(pkg, 'cpp_functions.so')):
        os.makedirs(pkg, exist_ok=True)
        for f in glob.glob(os.path.join(REF_ROOT, 'porechop', '*.py')):
            shutil.copy(f, pkg)
        shutil.copy(oracle.SO_PATH, pkg)
    return True


pytestmark = pytest.mark.skipif(not _build_shadow(),
                                reason='reference CLI unavailable')


def _run(cmd, cwd, env_extra=None):
    env = dict(os.environ)
    env.pop('PORECHOP_TPU_FORCE_HOST', None)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PYTHONWARNINGS'] = 'ignore'
    env['COLUMNS'] = '120'
    if env_extra:
        env.update(env_extra)
    r = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True, text=True,
                       timeout=1200)
    return r


def run_ours(args, cwd):
    """Run our CLI in-process: keeps JAX (and its compiled programs) warm
    across the whole parity matrix instead of cold-starting a subprocess per
    invocation.  SystemExit semantics are emulated: a string payload goes to
    stderr with exit code 1, argparse errors already wrote to stderr."""
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    os.environ['COLUMNS'] = '120'
    os.environ.pop('PORECHOP_TPU_FORCE_HOST', None)
    from porechop_tpu.cli import main
    buf_out, buf_err = io.StringIO(), io.StringIO()
    code = 0
    old_cwd = os.getcwd()
    os.chdir(cwd)
    try:
        with contextlib.redirect_stdout(buf_out), \
                contextlib.redirect_stderr(buf_err):
            try:
                main(args)
            except SystemExit as e:
                if e.code is None:
                    code = 0
                elif isinstance(e.code, int):
                    code = e.code
                else:
                    buf_err.write(str(e.code) + '\n')
                    code = 1
    finally:
        os.chdir(old_cwd)

    def _unl(s):
        # subprocess(text=True) applies universal-newline translation to the
        # reference's output; mirror it for a like-for-like comparison.
        return s.replace('\r\n', '\n').replace('\r', '\n')
    return types.SimpleNamespace(returncode=code, stdout=_unl(buf_out.getvalue()),
                                 stderr=_unl(buf_err.getvalue()))


def run_ref(args, cwd):
    env = {'PYTHONPATH': SHADOW}
    code = ('import sys\n'
            'sys.argv = ["porechop"] + sys.argv[1:]\n'
            'from porechop.porechop import main\n'
            'main()\n')
    return _run([sys.executable, '-c', code] + args, cwd, env)


def _normalize(text, cwd):
    text = text.replace(cwd + os.sep, '').replace(cwd, '.')
    # gzip subprocess TEMP file name contains the pid
    import re
    return re.sub(r'TEMP_\d+', 'TEMP_PID', text)


def _read_maybe_gz(path):
    with open(path, 'rb') as f:
        head = f.read(2)
    if head == b'\x1f\x8b':
        with gzip.open(path, 'rb') as f:
            return f.read()
    with open(path, 'rb') as f:
        return f.read()


def _snapshot(cwd):
    out = {}
    for root, _, files in os.walk(cwd):
        for f in files:
            p = os.path.join(root, f)
            out[os.path.relpath(p, cwd)] = _read_maybe_gz(p)
    return out


def check_parity(args, fixture=None, ours_extra_env=None):
    """Run both CLIs in fresh temp dirs; compare stdout/stderr/files."""
    import tempfile
    with tempfile.TemporaryDirectory() as d_ours, \
            tempfile.TemporaryDirectory() as d_ref:
        if fixture:
            args = ['-i', os.path.join(FIXTURES, fixture)] + args
        old_env = {}
        for k, v in (ours_extra_env or {}).items():
            old_env[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            r_ours = run_ours(args, d_ours)
        finally:
            for k, v in old_env.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        r_ref = run_ref(args, d_ref)
        assert r_ours.returncode == r_ref.returncode, (
            args, r_ours.returncode, r_ref.returncode, r_ours.stderr[-2000:],
            r_ref.stderr[-2000:])
        so_o = _normalize(r_ours.stdout, d_ours)
        so_r = _normalize(r_ref.stdout, d_ref)
        assert so_o == so_r, _first_diff(so_o, so_r, args)
        se_o = _normalize(r_ours.stderr, d_ours)
        se_r = _normalize(r_ref.stderr, d_ref)
        assert se_o == se_r, _first_diff(se_o, se_r, args)
        files_o = _snapshot(d_ours)
        files_r = _snapshot(d_ref)
        assert sorted(files_o) == sorted(files_r), (args, sorted(files_o),
                                                    sorted(files_r))
        for name in files_r:
            assert files_o[name] == files_r[name], (
                args, name, files_o[name][:300], files_r[name][:300])


def _first_diff(a, b, args):
    for i, (x, y) in enumerate(zip(a.splitlines(), b.splitlines())):
        if x != y:
            return 'args=%r first diff at line %d:\n ours=%r\n ref =%r' % (
                args, i, x, y)
    return 'args=%r length differs: ours %d lines, ref %d lines\nours tail=%r\nref tail=%r' % (
        args, len(a.splitlines()), len(b.splitlines()),
        a.splitlines()[-3:], b.splitlines()[-3:])


ONE = 'test_one_adapter_set.fastq'
TWO = 'test_two_adapter_sets.fastq'
BAR = 'test_barcodes.fastq'


# ---- test_one_adapter_set.py scenarios ----

def test_one_default_to_file():
    check_parity(['-o', 'out.fastq'], ONE)


def test_one_verbosity_levels():
    for v in ('0', '1', '2', '3'):
        check_parity(['-o', 'out.fastq', '-v', v], ONE)


def test_one_stdout_pipe():
    check_parity([], ONE)


def test_one_formats():
    for fmt in ('fasta', 'fastq', 'fasta.gz', 'fastq.gz'):
        check_parity(['-o', 'out.' + fmt.replace('.gz', '_gz'),
                      '--format', fmt], ONE)


def test_one_format_from_filename():
    for name in ('out.fasta', 'out.fastq', 'out.fasta.gz', 'out.fastq.gz'):
        check_parity(['-o', name], ONE)


def test_one_end_size():
    for es in ('50', '100', '150'):
        check_parity(['-o', 'out.fastq', '--end_size', es], ONE)


def test_one_min_trim_size():
    for mts in ('5', '6', '7'):
        check_parity(['-o', 'out.fastq', '--min_trim_size', mts], ONE)


def test_one_extra_middle_trim():
    check_parity(['-o', 'out.fastq', '--extra_middle_trim_good_side', '20',
                  '--extra_middle_trim_bad_side', '120'], ONE)
    check_parity(['-o', 'out.fastq', '--extra_middle_trim_good_side', '0',
                  '--extra_middle_trim_bad_side', '0'], ONE)


def test_one_middle_threshold_boundary():
    for mt in ('96', '97'):
        check_parity(['-o', 'out.fastq', '--middle_threshold', mt], ONE)


def test_one_check_reads_1():
    check_parity(['-o', 'out.fastq', '--check_reads', '1'], ONE)


def test_one_adapter_threshold():
    for at in ('90', '100'):
        check_parity(['-o', 'out.fastq', '--adapter_threshold', at], ONE)


def test_one_extra_end_trim():
    for eet in ('0', '10', '100'):
        check_parity(['-o', 'out.fastq', '--extra_end_trim', eet], ONE)


def test_one_min_split_read_size():
    for ms in ('1', '250', '300', '437', '438', '1000', '5000'):
        check_parity(['-o', 'out.fastq', '--min_split_read_size', ms], ONE)


def test_one_no_split_and_discard():
    check_parity(['-o', 'out.fastq', '--no_split'], ONE)
    check_parity(['-o', 'out.fastq', '--discard_middle'], ONE)


def test_one_threads_flag():
    check_parity(['-o', 'out.fastq', '-t', '1'], ONE)
    check_parity(['-o', 'out.fastq', '-t', '8'], ONE)


# ---- test_two_adapter_sets.py scenarios ----

def test_two_default():
    check_parity(['-o', 'out.fastq'], TWO)


def test_two_check_reads_progression():
    for cr in ('1', '2', '3'):
        check_parity(['-o', 'out.fastq', '--check_reads', cr], TWO)


def test_two_verbose():
    check_parity(['-o', 'out.fastq', '-v', '3'], TWO)


# ---- test_barcodes.py scenarios ----

def test_barcodes_basic_bins():
    check_parity(['-b', 'bins'], BAR)


def test_barcodes_require_two():
    check_parity(['-b', 'bins', '--require_two_barcodes'], BAR)


def test_barcodes_untrimmed():
    check_parity(['-b', 'bins', '--untrimmed'], BAR)


def test_barcodes_discard_unassigned():
    check_parity(['-b', 'bins', '--discard_unassigned'], BAR)


def test_barcodes_thresholds():
    check_parity(['-b', 'bins', '--barcode_threshold', '90'], BAR)
    check_parity(['-b', 'bins', '--barcode_diff', '10'], BAR)


def test_barcodes_verbose3():
    check_parity(['-b', 'bins', '-v', '3'], BAR)


# ---- test_choose_barcodes.py scenarios ----

def test_choose_barcodes_orientation():
    check_parity(['-b', 'bins'], 'test_choose_barcodes_1.fasta')
    check_parity(['-b', 'bins'], 'test_choose_barcodes_2.fasta')


# ---- test_albacore_directory.py scenarios ----

def test_albacore_single_file():
    check_parity(['-b', 'bins'],
                 'test_albacore_directory/workspace/barcode01/'
                 'fastq_runid_d2fbbe98f6e5bbfd18ed8065800aa9ed4cee05ab_0.fastq')


def test_albacore_directory_input():
    check_parity(['-i', os.path.join(FIXTURES, 'test_albacore_directory'),
                  '-b', 'bins'])


# ---- test_format.py scenarios ----

def test_format_matrix():
    for fixture in ('test_format.fasta', 'test_format.fastq',
                    'test_format.fasta.gz', 'test_format.fastq.gz'):
        check_parity(['-o', 'out_auto'], fixture)
        check_parity([], fixture)


def test_format_explicit_overrides_extension():
    check_parity(['-o', 'out.fasta', '--format', 'fastq'], 'test_format.fastq')
    check_parity(['-o', 'out.fastq', '--format', 'fasta'], 'test_format.fastq')


def test_format_explicit_gz_overrides_extension():
    """Conflicting-extension cases where the explicit flag wins (reference
    test/test_format.py:126-142), including gz formats."""
    check_parity(['-o', 'out.fasta.gz', '--format', 'fastq'],
                 'test_format.fastq.gz')
    check_parity(['-o', 'out.fastq', '--format', 'fasta.gz'],
                 'test_format.fastq')
    check_parity(['-o', 'out.fastq.gz', '--format', 'fasta.gz'],
                 'test_format.fasta')


def test_format_barcodes_auto_matrix():
    """Barcode-bin output across the input-format matrix with --format auto
    (reference test/test_format.py:169-187): bins inherit the input type,
    including the gz-bin compression branch (porechop.py:679-704)."""
    for fixture in ('test_format_barcodes.fastq', 'test_format_barcodes.fasta',
                    'test_format_barcodes.fastq.gz',
                    'test_format_barcodes.fasta.gz'):
        check_parity(['-b', 'bins'], fixture)


def test_format_barcodes_explicit_matrix():
    """Explicit --format with -b (reference test/test_format.py:189-242):
    the flag wins over both the input type and any extension."""
    for fixture, fmt in (
            ('test_format_barcodes.fastq', 'fastq.gz'),
            ('test_format_barcodes.fastq.gz', 'fastq'),
            ('test_format_barcodes.fastq', 'fasta'),
            ('test_format_barcodes.fastq', 'fasta.gz'),
            ('test_format_barcodes.fasta.gz', 'fasta'),
            ('test_format_barcodes.fasta', 'fasta.gz')):
        check_parity(['-b', 'bins', '--format', fmt], fixture)


def test_format_barcodes_gz_bins_with_counts_table():
    """The gz-bin branch with the counts table visible (-v 1): the table
    must name the .gz files and the bins must decompress identically
    (porechop.py:679-704)."""
    check_parity(['-b', 'bins', '-v', '1'], 'test_format_barcodes.fastq.gz')


# ---- custom scoring schemes (exercise the host-engine fallbacks) ----

def test_custom_scoring_schemes():
    # Different affine scheme (still open < extend): fast engine path.
    check_parity(['-o', 'out.fastq', '--scoring_scheme', '2,-4,-3,-1'], ONE)
    # Linear gaps (open == extend): NeedlemanWunsch profile, host spec path.
    check_parity(['-o', 'out.fastq', '--scoring_scheme', '3,-6,-2,-2'], ONE)
    # open > extend: Gotoh without the scan trick's precondition.
    check_parity(['-o', 'out.fastq', '--scoring_scheme', '3,-6,-1,-3'], ONE)


# ---- error paths ----

def test_error_cases():
    check_parity(['-o', 'x.fastq', '-b', 'bins'], ONE)          # mutual excl
    check_parity(['--untrimmed', '-o', 'x.fastq'], ONE)         # untrimmed
    check_parity(['-o', 'x.fastq', '--scoring_scheme', 'a,b'], ONE)
    check_parity(['-o', 'x.fastq', '--scoring_scheme', '1,2,3'], ONE)
    check_parity(['-o', 'x.fastq', '-t', '0'], ONE)
    check_parity(['-i', '/nonexistent/file', '-o', 'x.fastq'])


# ---- coverage the reference's own suite lacks ----

def _write_fastq(path, recs):
    with open(path, 'w') as f:
        for name, seq in recs:
            f.write('@%s\n%s\n+\n%s\n' % (name, seq, 'A' * len(seq)))


def test_rna_reads_round_trip(tmp_path):
    """RNA input (U > T count): align with U->T, emit with T->U
    (reference nanopore_read.py:26-31,106)."""
    rng = __import__('random').Random(5)
    adapter = 'AATGTACTTCGTTCAGTTACGTATTGCT'          # SQK-NSK007 start
    recs = []
    for k in range(4):
        body = ''.join(rng.choice('ACGU') for _ in range(2000))
        seq = (adapter.replace('T', 'U') if k % 2 == 0 else '') + body
        recs.append(('rna_%d' % k, seq))
    fx = str(tmp_path / 'rna.fastq')
    _write_fastq(fx, recs)
    check_parity(['-i', fx, '-o', 'out.fastq', '--check_reads', '4'])


def test_reads_shorter_than_end_size(tmp_path):
    """Reads shorter than --end_size exercise the whole-read window slice
    (reference nanopore_read.py:172,194 take seq[:end] of a short seq)."""
    rng = __import__('random').Random(6)
    adapter = 'AATGTACTTCGTTCAGTTACGTATTGCT'
    recs = [('tiny_%d' % k,
             adapter[:12] + ''.join(rng.choice('ACGT') for _ in range(n)))
            for k, n in enumerate((5, 40, 90, 149, 151))]
    fx = str(tmp_path / 'tiny.fastq')
    _write_fastq(fx, recs)
    check_parity(['-i', fx, '-o', 'out.fastq', '--check_reads', '5'])


def test_middle_device_replay_parity():
    """VERDICT r3 task 3: the device-resident middle-pass replay (masked
    code tensor kept on device across rounds, ops/middle.py) must be
    byte-identical to the reference — forced on regardless of the hybrid
    threshold.  The -v 2 dumps pin per-hit coordinates and scores."""
    env = {'PORECHOP_TPU_MIDDLE_DEVICE': '1'}
    check_parity(['-o', 'out.fastq', '-v', '2'], ONE, ours_extra_env=env)
    check_parity(['-o', 'out.fastq', '-v', '2'], TWO, ours_extra_env=env)
    check_parity(['-o', 'out.fastq', '-v', '1', '--middle_threshold', '75'],
                 ONE, ours_extra_env=env)
