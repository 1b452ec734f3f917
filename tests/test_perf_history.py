"""Perf-history regression gate (benchmarks/perf_history.py)."""

import json
import subprocess
import sys


def _bench_file(tmp_path, n, lines):
    tail = "\n".join(json.dumps(d) for d in lines)
    (tmp_path / f"BENCH_r{n:02d}.json").write_text(
        json.dumps({"rc": 0, "tail": tail})
    )


def _run(tmp_path, *args):
    return subprocess.run(
        [sys.executable, "benchmarks/perf_history.py",
         "--root", str(tmp_path), *args],
        capture_output=True, text=True,
    )


def test_no_regression_passes(tmp_path):
    _bench_file(tmp_path, 1, [{"metric": "decode", "value": 100.0, "unit": "tok/s"}])
    _bench_file(tmp_path, 2, [{"metric": "decode", "value": 104.0, "unit": "tok/s"}])
    r = _run(tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "no regressions" in r.stdout


def test_regression_fails(tmp_path):
    _bench_file(tmp_path, 1, [{"metric": "decode", "value": 100.0, "unit": "tok/s"}])
    _bench_file(tmp_path, 2, [{"metric": "decode", "value": 80.0, "unit": "tok/s"}])
    r = _run(tmp_path)
    assert r.returncode == 1
    assert "REGRESSIONS" in r.stderr


def test_missing_metric_fails(tmp_path):
    _bench_file(tmp_path, 1, [{"metric": "decode", "value": 100.0, "unit": "tok/s"},
                              {"metric": "prefill", "value": 9.0, "unit": "tok/s"}])
    _bench_file(tmp_path, 2, [{"metric": "decode", "value": 100.0, "unit": "tok/s"}])
    r = _run(tmp_path)
    assert r.returncode == 1
    assert "missing" in r.stderr


def test_markdown_written(tmp_path):
    _bench_file(tmp_path, 1, [{"metric": "decode", "value": 100.0, "unit": "tok/s",
                               "vs_baseline": 0.5}])
    out = tmp_path / "hist.md"
    r = _run(tmp_path, "--markdown", str(out))
    assert r.returncode == 0
    assert "| decode | 100 | 0.5 |" in out.read_text()


def test_crashed_round_fails(tmp_path):
    """rc != 0 in the newest BENCH file is total evidence loss — the gate
    must flag it even when no metric regressed (round-3 postmortem: the
    r03 crash silently passed the old gate)."""
    _bench_file(tmp_path, 1, [{"metric": "decode", "value": 100.0, "unit": "tok/s"}])
    tail = json.dumps({"metric": "decode", "value": 101.0, "unit": "tok/s"})
    (tmp_path / "BENCH_r02.json").write_text(json.dumps({"rc": 1, "tail": tail}))
    r = _run(tmp_path)
    assert r.returncode == 1
    assert "crashed" in r.stderr
