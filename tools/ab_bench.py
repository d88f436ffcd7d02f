"""Same-box A/B bench pass — one process, one Spark session, one code tree.

The adjudication protocol for flagged bench regressions (SCALING.md "Bench
adjudications", used r8/r9/r10): judge-recorded minimums from earlier rounds
are NOT reproducible on this box (second-scale ambient spikes), so a flagged
regression is adjudicated by checking the old round's commit out in a
`git worktree` and timing old-vs-new INTERLEAVED on the same box:

    python tools/ab_bench.py --label r9  --repo /root/r9wt  --queries a,b,c
    python tools/ab_bench.py --label head --repo /root/repo --queries a,b,c
    (repeat, alternating, >=2 passes each; compare per-query medians,
     normalized by the canary)

Each invocation is a fresh JVM over the given code tree: per query, 2
warm-up runs (codegen + Arrow import + parquet footers) then N measured
runs through the noop sink; prints ONE JSON line with per-query
[min, median, max] plus the pure-CPU canary so passes are normalizable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", required=True, help="code tree to import from")
    ap.add_argument("--label", required=True)
    ap.add_argument("--queries", required=True, help="comma-separated names")
    ap.add_argument("--warmups", type=int, default=2)
    ap.add_argument("--measured", type=int, default=5)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    sys.path.insert(0, os.path.abspath(args.repo))
    from urban_traffic_data_lake_project_spark.queries import REGISTRY
    from urban_traffic_data_lake_project_spark.session import get_spark

    spark = get_spark(f"ab-{args.label}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def canary() -> float:
        samples = []
        for _ in range(3):
            t0 = time.time()
            spark.range(0, 20_000_000, 1, 32).selectExpr(
                "sum((id * 2654435761) % 1000000007) as s"
            ).collect()
            samples.append(time.time() - t0)
        return round(sorted(samples)[1], 3)

    canary()  # warm
    canary_before = canary()

    names = [n for n in args.queries.split(",") if n]
    out: dict[str, list[float]] = {}
    for name in names:
        fn = REGISTRY[name].fn
        for _ in range(args.warmups):
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(args.measured):
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        srt = sorted(runs)
        out[name] = [
            round(srt[0], 3),
            round(srt[len(srt) // 2], 3),
            round(srt[-1], 3),
        ]

    print(
        json.dumps(
            {
                "label": args.label,
                "repo": args.repo,
                "queries": out,
                "canary_before_sec": canary_before,
                "canary_after_sec": canary(),
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
