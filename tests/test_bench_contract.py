"""bench.py output contract (VERDICT r4 task 1/7): the driver-captured
JSON line must carry the headline value, vs_baseline, vs_north_star, and
the probe/engine status diagnostics — and the probe logic must never
forfeit the guarded device measurement.

These tests monkeypatch the measurement functions (no chip, no workload)
and exercise main()'s decision tree.
"""

import importlib.util
import json
import sys

import pytest

spec = importlib.util.spec_from_file_location('bench', '/root/repo/bench.py')
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def _run_main(monkeypatch, capsys, *, host=(1000.0, 950.0, 1.0),
              tpu=(1500.0, 1400.0, None), probe=True, force_host=False):
    monkeypatch.setattr(bench, 'measure_ours',
                        lambda force_host=None, repeats=5: host)
    monkeypatch.setattr(bench, 'measure_tpu_guarded',
                        lambda timeout_s=None: tpu)
    monkeypatch.setattr(bench, 'probe_tpu', lambda timeout_s=90: probe)
    monkeypatch.setattr(bench.time, 'sleep', lambda s: None)
    if force_host:
        monkeypatch.setenv('PORECHOP_TPU_FORCE_HOST', '1')
    else:
        monkeypatch.delenv('PORECHOP_TPU_FORCE_HOST', raising=False)
    monkeypatch.delenv('PORECHOP_BENCH_REF_READS_PER_S', raising=False)
    monkeypatch.delenv('PORECHOP_BENCH_MEASURE_REF', raising=False)
    monkeypatch.delenv('PORECHOP_BENCH_NO_PROBE', raising=False)
    bench.main()
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_tpu_wins_and_fields_present(monkeypatch, capsys):
    out = _run_main(monkeypatch, capsys)
    assert out['value'] == 1500.0
    assert out['status']['engine'] == 'tpu'
    assert out['status']['probe'] == 'ok'
    assert out['status']['host_rps'] == 1000.0
    assert out['status']['tpu_rps'] == 1500.0
    assert out['unit'] == 'reads/s'
    # North-star accounting: value / (ref * ceiling).
    ref = bench.REF_READS_PER_S_DEFAULT
    assert out['vs_baseline'] == round(1500.0 / ref, 3)
    assert out['vs_north_star'] == round(
        1500.0 / (ref * bench.NORTH_STAR_THREAD_CEILING), 3)
    assert 'thread ceiling' in out['north_star_note']


def test_failed_probe_still_attempts_guarded_run(monkeypatch, capsys):
    """VERDICT r4 weak #1: two failed probes must NOT forfeit the device
    measurement — the guarded subprocess run is attempted regardless."""
    attempted = []

    def guarded(timeout_s=None):
        attempted.append(True)
        return 1500.0, 1400.0, None

    monkeypatch.setattr(bench, 'measure_tpu_guarded', guarded)
    monkeypatch.setattr(bench, 'measure_ours',
                        lambda force_host=None, repeats=5: (1000.0, 950.0, 1.0))
    monkeypatch.setattr(bench, 'probe_tpu', lambda timeout_s=90: False)
    monkeypatch.setattr(bench.time, 'sleep', lambda s: None)
    monkeypatch.delenv('PORECHOP_TPU_FORCE_HOST', raising=False)
    monkeypatch.delenv('PORECHOP_BENCH_REF_READS_PER_S', raising=False)
    monkeypatch.delenv('PORECHOP_BENCH_MEASURE_REF', raising=False)
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert attempted, 'guarded run was skipped after failed probes'
    assert out['status']['probe'].startswith('failed twice')
    assert out['status']['engine'] == 'tpu'
    assert out['value'] == 1500.0


def test_guarded_failure_falls_back_to_host_with_diagnostics(monkeypatch,
                                                             capsys):
    out = _run_main(monkeypatch, capsys,
                    tpu=(None, None, 'tpu wedged mid-run'))
    assert out['status']['engine'] == 'host'
    assert out['status']['tpu_error'] == 'tpu wedged mid-run'
    assert out['value'] == 1000.0
    assert 'wedged' in out['metric']


def test_host_wins_when_faster(monkeypatch, capsys):
    out = _run_main(monkeypatch, capsys, host=(2000.0, 1900.0, 1.0),
                    tpu=(1500.0, 1400.0, None))
    assert out['status']['engine'] == 'host'
    assert out['value'] == 2000.0
    assert out['status']['tpu_rps'] == 1500.0     # still recorded


def test_force_host_mode(monkeypatch, capsys):
    out = _run_main(monkeypatch, capsys, force_host=True)
    assert out['status']['engine'] == 'host'
    assert out['status']['probe'] == 'skipped (FORCE_HOST)'


def test_default_workload_is_8192(monkeypatch):
    """BASELINE floor analysis: 512 measures the tunnel, not the engines;
    the default must be the device-winning size (VERDICT r4 task 1a)."""
    assert bench.N_READS == 8192 or 'PORECHOP_BENCH_READS' in bench.os.environ
