"""Oracle-compare helpers shared by tests and tools/check_oracle.py.

Mirrors the driver's correctness gate: row count + column names +
order-insensitive value hash, with columns sorted by name and values
normalized to strings (floats that are integral print as ints, NULL/NaN
collapse to a sentinel, timestamps to ISO).
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd

from urban_traffic_data_lake_project_spark.sources import TESTDATA_TABLES


def _norm_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "\\N"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize values to strings, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_norm_cell)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def frame_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """A DuckDB connection with the testdata tables registered as views."""
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    ns, no = normalize(spark_pdf), normalize(oracle_pdf)
    if list(ns.columns) != list(no.columns):
        problems.append(f"columns differ: spark={list(ns.columns)} oracle={list(no.columns)}")
        return problems
    if len(ns) != len(no):
        problems.append(f"row count differs: spark={len(ns)} oracle={len(no)}")
    if frame_hash(ns) != frame_hash(no):
        merged = ns.merge(no, how="outer", indicator=True)
        diff = merged[merged["_merge"] != "both"]
        problems.append(f"value hash differs; {len(diff)} differing rows, sample:\n{diff.head(6).to_string()}")
    return problems
