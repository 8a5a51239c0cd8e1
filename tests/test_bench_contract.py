"""bench.py driver-contract logic, host-side only (no device ops).

The driver records whatever JSON line it captures from bench.py
(BENCH_r{N}.json); these tests pin the output contract — every snapshot
line is complete JSON, rows are flushed as measured, the wall-clock
budget skips instead of overrunning, the per-config cost guard works,
a depressed row is re-measured once, and one failing config cannot
lose the others. Measurement itself is monkeypatched out.
"""

import importlib.util
import json
import sys
from pathlib import Path

import pytest

_spec = importlib.util.spec_from_file_location(
    'bench', Path(__file__).parents[1] / 'bench.py')
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault('bench', bench)
_spec.loader.exec_module(bench)


@pytest.fixture()
def harness(monkeypatch):
    """Neutralize device/cache side effects; fake the clock."""
    clock = {'t': 0.0}
    monkeypatch.setattr(bench, 'device_watchdog', lambda: None)
    monkeypatch.setattr(bench.time, 'monotonic', lambda: clock['t'])
    import srtpu.utils as utils
    monkeypatch.setattr(utils, 'enable_compilation_cache', lambda: None)
    return clock


def _snapshots(capsys):
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    parsed = [json.loads(l) for l in lines]  # every line complete JSON
    return parsed


def test_happy_path_flushes_per_config(harness, monkeypatch, capsys):
    monkeypatch.setattr(bench, 'measure', lambda cfg: 1000.0)
    bench.main()
    snaps = _snapshots(capsys)
    assert len(snaps) == len(bench.CONFIGS)       # one snapshot per row
    last = snaps[-1]
    assert [r['model'] for r in last['models']] == \
        [c['name'] for c in bench.CONFIGS]
    assert last['skipped'] == []
    assert last['value'] == 1000.0                # headline present
    # every intermediate snapshot is a valid cumulative prefix
    for i, s in enumerate(snaps):
        assert len(s['models']) == i + 1


def test_budget_exhaustion_skips_remainder(harness, monkeypatch, capsys):
    def measure(cfg):
        harness['t'] += 1000.0                    # each config costs 1000s
        return dict((c['name'], c.get('expect', 1000)) for c
                    in bench.CONFIGS)[cfg['name']]   # healthy: no retries
    monkeypatch.setattr(bench, 'measure', measure)
    monkeypatch.setattr(bench, 'BUDGET_S', 1500.0)
    bench.main()
    last = _snapshots(capsys)[-1]
    # headline (always) + one more config fit inside 1500s
    assert len(last['models']) == 2
    names = [c['name'] for c in bench.CONFIGS]
    assert last['skipped'] == names[2:]
    assert 'budget' in last['note']


def test_cost_guard_skips_expensive_config_only(harness, monkeypatch,
                                                capsys):
    def measure(cfg):
        harness['t'] += 10.0
        return dict((c['name'], c.get('expect', 1000)) for c
                    in bench.CONFIGS)[cfg['name']]
    monkeypatch.setattr(bench, 'measure', measure)
    monkeypatch.setattr(bench, 'BUDGET_S', 250.0)
    bench.main()
    last = _snapshots(capsys)[-1]
    # cheap rows (10s each) all fit inside 250s, but SRGAN's declared
    # worst-case cost_s=300 cannot — it is skipped INDIVIDUALLY while
    # every later config still runs
    assert last['skipped'] == ['SRGAN']
    assert len(last['models']) == len(bench.CONFIGS) - 1


def test_depressed_row_is_remeasured_once(harness, monkeypatch, capsys):
    calls = []

    def measure(cfg):
        calls.append(cfg['name'])
        if cfg['name'] == 'SRResNet':
            # first read depressed (relay slowdown), retry healthy
            return 4456.0 if calls.count('SRResNet') == 1 else 5624.0
        return dict((c['name'], c.get('expect', 1000)) for c
                    in bench.CONFIGS)[cfg['name']]
    monkeypatch.setattr(bench, 'measure', measure)
    bench.main()
    last = _snapshots(capsys)[-1]
    assert calls.count('SRResNet') == 2           # exactly one retry
    row = {r['model']: r['value'] for r in last['models']}['SRResNet']
    assert row == 5624.0                          # keeps the better read
    # healthy rows are measured exactly once
    assert calls.count('EDSR-baseline') == 1
    # selection transparency (ADVICE r4): both readings + the rule
    row = {r['model']: r for r in last['models']}['SRResNet']
    assert row['readings'] == [4456.0, 5624.0]
    assert 'max' in row['selection']


def test_retry_failure_keeps_first_reading(harness, monkeypatch, capsys):
    """ADVICE r4: a relay death mid-retry must not discard the valid
    first measurement — the row keeps the first pps, not an error."""
    calls = []

    def measure(cfg):
        calls.append(cfg['name'])
        if cfg['name'] == 'SRResNet':
            if calls.count('SRResNet') == 1:
                return 4456.0                      # depressed but valid
            raise RuntimeError('relay died mid-retry')
        return dict((c['name'], c.get('expect', 1000)) for c
                    in bench.CONFIGS)[cfg['name']]
    monkeypatch.setattr(bench, 'measure', measure)
    bench.main()
    last = _snapshots(capsys)[-1]
    row = {r['model']: r for r in last['models']}['SRResNet']
    assert row['value'] == 4456.0
    assert 'error' not in row
    assert len(last['models']) == len(bench.CONFIGS)


def test_failing_config_records_error_and_continues(harness, monkeypatch,
                                                    capsys):
    def measure(cfg):
        if cfg['name'] == 'RDN-B':
            raise RuntimeError('mosaic says no')
        return dict((c['name'], c.get('expect', 1000)) for c
                    in bench.CONFIGS)[cfg['name']]
    monkeypatch.setattr(bench, 'measure', measure)
    bench.main()
    last = _snapshots(capsys)[-1]
    rows = {r['model']: r for r in last['models']}
    assert rows['RDN-B']['value'] is None
    assert 'mosaic says no' in rows['RDN-B']['error']
    assert rows['DDBPN']['value'] is not None     # later rows still run
    assert len(last['models']) == len(bench.CONFIGS)
