"""Per-query profiler for the optimization rounds.

For each named query: run it through the noop sink `--runs` times (first
run is warm-up), print per-run wall times, and optionally dump
`.explain("formatted")` to `--plans-dir/<name>_<tag>.txt`.

Usage:
  python tools/qprof.py [--sf-dir DIR] [--runs N] [--plans-dir plans/r12]
                        [--tag before] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from urban_traffic_data_lake_project_spark.queries import REGISTRY  # noqa: E402
from urban_traffic_data_lake_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    spark = get_spark("qprof")
    spark.sparkContext.setLogLevel("ERROR")
    # warm: JVM + parquet footers
    from urban_traffic_data_lake_project_spark.sources import TESTDATA_TABLES, load_table

    for t in TESTDATA_TABLES:
        load_table(spark, args.sf_dir, t).count()

    for name in args.names:
        spec = REGISTRY[name]
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = spec.fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"qprof:{name}:run{i}")
            t0 = time.time()
            spec.fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        # run 0 is the warm-up (codegen + Arrow import + footers): report
        # the median over the WARM runs only — including the cold run
        # biased small --runs medians toward the cold time (ADVICE r12)
        warm = runs[1:] if len(runs) > 1 else runs
        med = sorted(warm)[len(warm) // 2]
        print(
            f"{name:40s} med={med:7.3f}  " + " ".join(f"{r:7.3f}" for r in runs),
            flush=True,
        )


if __name__ == "__main__":
    main()
