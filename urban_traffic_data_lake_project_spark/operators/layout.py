"""Physical-layout operators — multi-dimensional clustering for data
skipping (the Delta/Iceberg ``ZORDER BY`` / ``rewrite_data_files``
maintenance job, net-new vs the reference, whose parquet layout is
whatever pandas wrote).

Why it matters at 100 TB: parquet scans prune row groups (and whole
files) from footer min/max statistics, but statistics only help if rows
with nearby key values live together. Partitioning gives that for ONE
coarse key; Z-ordering gives it for TWO (or more) fine-grained keys at
once by sorting on the Morton interleave of their bits — a range
predicate on EITHER key then touches a small band of files instead of
all of them.

Everything here is deterministic and SQL-replayable: the Morton code is
min-max scaling + bit interleave (no sampling), so the DuckDB oracle
recomputes codes bit-for-bit. Only the final file SPLIT uses Spark's
``repartitionByRange`` (sampled boundaries — not replayable), which is
why the oracle-gated query checks codes and cluster statistics, while
the file-skipping effect itself is asserted by a pytest that counts the
files a range predicate actually touches (see
tests/test_lakehouse.py::test_zorder_write_clusters_files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _scale_expr(col: str, lo: float, hi: float, bits: int) -> str:
    """SQL text scaling ``col`` into [0, 2^bits - 1] integers: floor of
    the min-max unit interval times the top code. Constant columns
    (hi == lo) scale to 0. Clamping guards float edge effects so the
    code always fits ``bits`` bits."""
    top = (1 << bits) - 1
    if hi == lo:
        return "CAST(0 AS BIGINT)"
    # D suffix: a bare decimal literal parses as DECIMAL in Spark SQL,
    # and decimal division truncates at scale 6 — measured a whole
    # scale-step drift vs the oracle's double arithmetic (x=3, lo=0,
    # hi=9: decimal 21844.978155 vs double 21845.0)
    return (
        f"least(CAST({top} AS BIGINT), greatest(CAST(0 AS BIGINT), "
        f"CAST(floor((({col} - ({lo!r}D)) / ({hi!r}D - ({lo!r}D))) * {top}) AS BIGINT)))"
    )


def _interleave_sql(za: str, zb: str, bits: int) -> str:
    """SQL text of the Morton interleave: bit i of ``za`` lands at 2i,
    bit i of ``zb`` at 2i+1. Plain shift/mask arithmetic — identical in
    Spark SQL and DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(f"(shiftleft(shiftright({za}, {i}) & 1, {2 * i}))")
        terms.append(f"(shiftleft(shiftright({zb}, {i}) & 1, {2 * i + 1}))")
    return " + ".join(terms)


def with_morton_code(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bounds: dict,
    bits: int = 16,
    out_col: str = "morton",
) -> DataFrame:
    """Adds ``out_col`` = Morton(z-order) code of (col_a, col_b) under
    the given bounds ``{col: (lo, hi)}``. Pure per-row arithmetic — one
    projection, no shuffle; bounds come from the caller (one bounded agg
    or table statistics)."""
    za = _scale_expr(col_a, *map(float, bounds[col_a]), bits)
    zb = _scale_expr(col_b, *map(float, bounds[col_b]), bits)
    return df.withColumn(out_col, F.expr(_interleave_sql(f"({za})", f"({zb})", bits)))


def column_bounds(df: DataFrame, cols: list) -> dict:
    """{col: (min, max)} from ONE aggregate pass (the only job a
    z-order rewrite pays besides the write itself)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols}


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    target_files: int = 16,
) -> dict:
    """Rewrite ``df`` to ``path`` clustered by the Morton code of
    (col_a, col_b) — the compaction/clustering maintenance job. One
    bounds aggregate, one range shuffle on the code (also the
    small-file compaction step: target_files output files regardless of
    input fragmentation), an in-file sort so parquet row-group min/max
    stats are tight on BOTH columns, then the write. Returns the bounds
    used (the metadata a table format would persist)."""
    bounds = column_bounds(df, [col_a, col_b])
    coded = with_morton_code(df, col_a, col_b, bounds, bits)
    (
        coded.repartitionByRange(target_files, "morton")
        .sortWithinPartitions("morton")
        .drop("morton")
        .write.mode("overwrite")
        .parquet(path)
    )
    return bounds
