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


def overlap_jobs(*thunks: Callable[[], object]) -> list:
    """Run independent Spark actions concurrently from a small driver
    thread pool (guide §2.6: Spark's scheduler happily runs several jobs
    at once; actions are only sequential because driver code calls them
    sequentially). Used by multi-pass fit queries whose statistics passes
    have no data dependency — the later jobs' tasks back-fill executors
    freed by the earlier jobs' stragglers. Results come back in argument
    order; any exception propagates."""
    from concurrent.futures import ThreadPoolExecutor

    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=min(4, len(thunks))) as pool:
        futs = [pool.submit(t) for t in thunks]
        return [f.result() for f in futs]
