"""Query registry plumbing.

Each named query is a pair: a Spark callable ``(spark, sf_dir) -> DataFrame``
and (where SQL-expressible) an equivalent ANSI SQL string the DuckDB oracle
runs on the same parquet tables. The driver compares row count + schema +
order-insensitive value hash, sorting columns by NAME — so every computed
column must carry the SAME alias on both sides.

Floating-point convention: aggregate/computed doubles are rounded at the
query edge (ROUND_SUM=4 decimal places for sums, ROUND_STAT=6 for means /
stddevs / correlations) on BOTH sides, so bit-level differences in
summation order (Spark partial aggregation vs DuckDB) cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# Rounding applied symmetrically in Spark + oracle SQL.
ROUND_SUM = 4
ROUND_STAT = 6

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One registry entry."""

    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


# Re-export: the implementation moved to functions.concurrency (r13) so
# the operator layer can overlap its own fit passes without a circular
# import through this registry module; query-side callers are unchanged.
from urban_traffic_data_lake_project_spark.functions.concurrency import (  # noqa: E402,F401
    overlap_jobs,
)
