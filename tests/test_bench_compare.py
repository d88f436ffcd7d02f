"""tools/bench_compare.py — canary-normalized round-over-round comparison
math: the box ratio divides out environment drift, the gate trips on
normalized regressions only, and added/removed queries are reported
rather than silently dropped."""

from __future__ import annotations

import json
import subprocess
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(ROOT, "tools", "bench_compare.py")


def _run(tmp_path, old: dict, new: dict, gate: float = 1.15):
    a, b = tmp_path / "a.json", tmp_path / "b.json"
    a.write_text(json.dumps(old))
    b.write_text(json.dumps(new))
    p = subprocess.run(
        [sys.executable, TOOL, str(a), str(b), "--gate", str(gate)],
        capture_output=True,
        text=True,
    )
    return p.returncode, p.stdout


def test_box_drift_is_divided_out(tmp_path):
    # every query 2x slower but the canary is also 2x slower: normalized
    # ratio is 1.0 — no regression, exit 0
    old = {"queries": {"q1": 1.0, "q2": 2.0}, "canary_before_sec": 0.3, "canary_after_sec": 0.3}
    new = {"queries": {"q1": 2.0, "q2": 4.0}, "canary_before_sec": 0.6, "canary_after_sec": 0.6}
    rc, out = _run(tmp_path, old, new)
    assert rc == 0, out
    assert "norm= 1.00x" in out


def test_real_regression_trips_gate(tmp_path):
    # one query 2x slower on an unchanged box: normalized 2.0 > gate
    old = {"queries": {"q1": 1.0, "q2": 1.0}, "canary_before_sec": 0.3, "canary_after_sec": 0.3}
    new = {"queries": {"q1": 2.0, "q2": 1.0}, "canary_before_sec": 0.3, "canary_after_sec": 0.3}
    rc, out = _run(tmp_path, old, new)
    assert rc == 1
    assert "over gate" in out


def test_missing_canary_falls_back_to_raw(tmp_path):
    old = {"queries": {"q1": 1.0}}
    new = {"queries": {"q1": 1.05}}
    rc, out = _run(tmp_path, old, new)
    assert rc == 0
    assert "pre-r9 artifact" in out


def test_added_and_removed_queries_are_reported(tmp_path):
    old = {"queries": {"q1": 1.0, "gone": 1.0}, "canary_before_sec": 0.3, "canary_after_sec": 0.3}
    new = {"queries": {"q1": 1.0, "born": 1.0}, "canary_before_sec": 0.3, "canary_after_sec": 0.3}
    rc, out = _run(tmp_path, old, new)
    assert rc == 0
    assert "born" in out and "gone" in out
