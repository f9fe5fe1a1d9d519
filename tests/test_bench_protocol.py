"""The bench measurement protocol's fresh-session machinery.

The r11 kcore incident (30x/10x ratio 19.98 after ~50 min of session
state vs 6.04 in a fresh process) made fresh-process re-measurement a
protocol rule; bench.py's --measure-single mode is that rule's
mechanism. These tests drive the real subprocess path once on the
smallest scale factor and check the parse/fault contracts in-process.
"""

from __future__ import annotations

import json
import subprocess
import sys


def test_measure_single_subprocess_contract():
    out = subprocess.run(
        [sys.executable, "bench.py", "--measure-single",
         "q6_forecast_revenue", "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-500:]
    recs = [
        json.loads(line)
        for line in out.stdout.strip().splitlines()
        if line.startswith("{")
    ]
    rec = next(r for r in recs if r.get("mode") == "measure_single")
    assert rec["name"] == "q6_forecast_revenue"
    t = rec["times"]["/root/testdata/sf0.001"]
    assert isinstance(t, float) and t > 0


def test_measure_single_fresh_swallows_subprocess_failure(monkeypatch):
    import bench

    def boom(*a, **kw):
        raise OSError("spawn failed")

    monkeypatch.setattr(subprocess, "run", boom)
    assert bench._measure_single_fresh("anything", ["/nowhere"]) == {}


def test_measure_single_fresh_ignores_garbage_stdout(monkeypatch):
    import types

    import bench

    def fake_run(*a, **kw):
        return types.SimpleNamespace(
            stdout="WARN noise\nnot json\n"
            '{"mode": "other", "name": "x"}\n'
            '{"mode": "measure_single", "name": "x", "times": {"/d": 1.5}}\n'
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._measure_single_fresh("x", ["/d"]) == {"/d": 1.5}


def test_probe30_bands_cover_every_probe30_member():
    import bench

    assert set(bench.PROBE30_RATIO_BANDS) == set(bench.PROBE30_QUERIES)
