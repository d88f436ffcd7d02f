"""bench.py canary-gated recording (r11 verdict item 4): a measurement
pass flags itself contaminated when the before/after canary spread blows
the gate or the idle-wait expires with the box still loaded — the two
signatures of every recorded-vs-clean-run bench split since r8."""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402


def _pass(monkeypatch, canaries, loadavg, max_wait="0"):
    seq = iter(canaries)
    monkeypatch.setattr(bench, "run_canary", lambda *_: next(seq))
    monkeypatch.setattr(bench.os, "getloadavg", lambda: loadavg)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_MAX_WAIT", max_wait)
    # names=[] -> no queries run, no SparkSession touched
    return bench.measure_pass(None, "/nonexistent", [])


def test_quiet_box_is_clean(monkeypatch):
    m = _pass(monkeypatch, [0.30, 0.30, 0.31], (0.5, 0.5, 0.5))
    assert m["contaminated"] is False
    assert m["canary_before_sec"] == 0.30 and m["canary_after_sec"] == 0.31


def test_canary_spread_flags_contamination(monkeypatch):
    # warm canary 0.3, measured before 0.3, after 0.6 -> spread 2.0 > 1.5
    m = _pass(monkeypatch, [0.30, 0.30, 0.60], (0.5, 0.5, 0.5))
    assert m["contaminated"] is True


def test_expired_idle_wait_on_loaded_box_flags_contamination(monkeypatch):
    # loadavg pinned above the threshold and max_wait=0 (expired wait):
    # stable canary must NOT launder the result
    m = _pass(monkeypatch, [0.30, 0.30, 0.30], (10.0, 10.0, 10.0))
    assert m["contaminated"] is True
