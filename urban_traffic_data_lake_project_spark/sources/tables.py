"""Parquet table loading for the driver's testdata star schema.

Scans are plain ``spark.read.parquet`` — Catalyst pushes filters and prunes
columns into the vectorized parquet reader, so callers should express
projections/filters on the returned DataFrame and let pushdown do the work
(verified in tests via ``PushedFilters`` / ``ReadSchema`` in the plan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Columns stored as parquet TIMESTAMP(NANOS), which Spark reads as long
# (spark.sql.legacy.parquet.nanosAsLong) — converted to micros here.
# Integer division, NOT /1000.0: epoch-nanos (~1.7e18) exceed double's
# 53-bit mantissa, a float division would corrupt timestamps.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; path layout is ``{sf_dir}/{name}.parquet``.

    Self-sufficient against foreign sessions: the driver harness builds its
    own SparkSession without this engine's defaults, so the two confs that
    change RESULTS (nanos handling, timestamp session zone) are pinned here
    at read time (both runtime-settable)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name in _NANOS_TS_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANOS_TS_COLS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}
