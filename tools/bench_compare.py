"""Canary-normalized round-over-round bench comparison.

Usage: python tools/bench_compare.py BENCH_rA.json BENCH_rB.json [--gate 1.15]

For every query present in both artifacts, prints the raw B/A ratio and —
when both artifacts carry the environment canary (bench.py records
canary_before_sec/canary_after_sec since r9) — the canary-normalized
ratio: (qB/qA) / (canaryB/canaryA), i.e. how much the query slowed beyond
what the box itself slowed. Exits 1 if any normalized (or raw, when no
canary is available) ratio exceeds the gate, so the driver or a test can
use it as a regression tripwire. Queries only in one artifact are listed
as added/removed, never silently dropped.
"""

from __future__ import annotations

import argparse
import json


def canary_of(d: dict) -> float | None:
    vals = [d.get("canary_before_sec"), d.get("canary_after_sec")]
    vals = [v for v in vals if isinstance(v, (int, float)) and v > 0]
    return sum(vals) / len(vals) if vals else None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--gate", type=float, default=1.15)
    args = ap.parse_args()
    a = json.load(open(args.old))
    b = json.load(open(args.new))
    qa, qb = a.get("queries", {}), b.get("queries", {})
    ca, cb = canary_of(a), canary_of(b)
    box = (cb / ca) if (ca and cb) else None
    print(
        f"canary: old={ca} new={cb} box_ratio="
        f"{round(box, 3) if box else 'n/a (pre-r9 artifact)'}"
    )
    worst: list[tuple[float, str]] = []
    for name in sorted(set(qa) & set(qb)):
        if not qa[name]:
            continue
        raw = qb[name] / qa[name]
        norm = raw / box if box else raw
        flag = " <-- over gate" if norm > args.gate else ""
        print(
            f"{name:40s} {qa[name]:7.3f} -> {qb[name]:7.3f}  "
            f"raw={raw:5.2f}x norm={norm:5.2f}x{flag}"
        )
        worst.append((norm, name))
    added = sorted(set(qb) - set(qa))
    removed = sorted(set(qa) - set(qb))
    if added:
        print(f"added (no prior row): {added}")
    if removed:
        print(f"removed: {removed}")
    over = [n for r, n in worst if r > args.gate]
    print(f"{len(worst) - len(over)}/{len(worst)} within {args.gate}x normalized")
    return 1 if over else 0


if __name__ == "__main__":
    raise SystemExit(main())
