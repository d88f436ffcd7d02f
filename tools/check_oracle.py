"""Local replica of the driver's correctness gate.

Runs every registered query on Spark AND its oracle SQL on DuckDB against
the same parquet tables, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
normalized to strings). Prints a per-query PASS/FAIL table and a diff
sample on mismatch.

Usage: python tools/check_oracle.py [--sf-dir /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from urban_traffic_data_lake_project_spark.queries import REGISTRY  # noqa: E402
from urban_traffic_data_lake_project_spark.session import get_spark  # noqa: E402
from urban_traffic_data_lake_project_spark.sources import TESTDATA_TABLES  # noqa: E402


def _norm_cell(v, strict: bool = False) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\\N"
    if isinstance(v, float):
        # Default mode folds integral floats to ints — tolerant, like a
        # normalizer that coerces dtypes. Strict mode keeps the float
        # repr, so an int64-vs-float64 dtype drift between Spark and the
        # oracle ("0" vs "0.0") FAILS here even when values agree —
        # mirroring the least forgiving normalizer a driver could use.
        if not strict and v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def normalize(df: pd.DataFrame, strict: bool = False) -> pd.DataFrame:
    """Sort columns by name, normalize values to strings, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: _norm_cell(v, strict))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def kind_sig(df: pd.DataFrame) -> dict[str, str]:
    """Column -> pandas dtype kind ('i' int, 'f' float, 'O' object, ...).

    Strict mode compares these across engines: a HUGEINT column that
    pandas turned into float64 shows up as 'f' vs Spark's 'i' even when
    every value is integral.
    """
    return {c: df[c].dtype.kind for c in sorted(df.columns)}


def frame_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument(
        "--strict",
        action="store_true",
        help="no integral-float folding + dtype-kind parity — catches "
        "int-vs-float drift (e.g. DuckDB HUGEINT -> pandas float64) that "
        "a driver-side normalizer may not forgive",
    )
    ap.add_argument(
        "--dump-diff",
        metavar="DIR",
        default=None,
        help="on mismatch, write the normalized row diff to "
        "DIR/ORACLE_DIFF_<query>.txt so the failing CELL is named",
    )
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    args = ap.parse_args()

    names = args.names or list(REGISTRY)
    unknown = set(names) - REGISTRY.keys()
    if unknown:
        ap.error(f"unknown queries: {unknown}")

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    failures = []
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:35s} spark error: {e}")
            failures.append(name)
            continue
        spark_t = time.time() - t0
        if spec.oracle is None:
            print(f"rows  {name:35s} rows={len(sdf):7d} (no oracle) {spark_t:5.1f}s")
            continue
        try:
            odf = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:35s} duckdb error: {e}")
            failures.append(name)
            continue
        ns, no = normalize(sdf, args.strict), normalize(odf, args.strict)
        ok_cols = list(ns.columns) == list(no.columns)
        ok_rows = len(ns) == len(no)
        ok_kind = True
        kind_note = ""
        if args.strict and ok_cols:
            ks, ko = kind_sig(sdf), kind_sig(odf)
            bad = {c: (ks[c], ko[c]) for c in ks if ks[c] != ko[c]}
            if bad:
                ok_kind = False
                kind_note = " kinds " + ",".join(
                    f"{c}:{s}!={o}" for c, (s, o) in bad.items()
                )
        ok_hash = ok_cols and ok_rows and frame_hash(ns) == frame_hash(no)
        status = "PASS" if (ok_cols and ok_rows and ok_hash and ok_kind) else "FAIL"
        print(f"{status}  {name:35s} rows={len(ns):7d}/{len(no):7d} cols={'=' if ok_cols else 'X'} hash={'=' if ok_hash else 'X'} {spark_t:5.1f}s{kind_note}")
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"      spark cols : {list(ns.columns)}")
                print(f"      oracle cols: {list(no.columns)}")
            elif len(ns) and len(no):
                merged = ns.merge(no, how="outer", indicator=True)
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(8).to_string())
                if args.dump_diff:
                    os.makedirs(args.dump_diff, exist_ok=True)
                    path = os.path.join(args.dump_diff, f"ORACLE_DIFF_{name}.txt")
                    with open(path, "w") as fh:
                        fh.write(f"# {name} @ {args.sf_dir} strict={args.strict}\n")
                        fh.write(f"# left_only = spark, right_only = oracle\n")
                        fh.write(diff.head(200).to_string())
                        fh.write("\n")
                    print(f"      diff -> {path}")
    print(f"\n{len(names) - len(failures)}/{len(names)} queries match the oracle")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
