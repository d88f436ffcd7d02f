"""Column-expression helpers shared across operators.

Everything here composes built-in ``pyspark.sql.functions`` — pure Catalyst
expressions that stay inside whole-stage codegen. No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The three timestamp layouts the reference's dirty data uses
# (reference: python-service/scripts/generate_traffic_data.py:17-24);
# anything unparseable becomes NULL, mirroring
# ``pd.to_datetime(errors="coerce")`` (clean_traffic.py:76-81).
DEFAULT_TS_FORMATS: tuple[str, ...] = (
    "yyyy-MM-dd HH:mm",
    "dd/MM/yyyy hha",
    "yyyy-MM-dd'T'HH:mm'Z'",
)


def parse_timestamp_multi(col: Column | str, formats: tuple[str, ...] = DEFAULT_TS_FORMATS) -> Column:
    """Multi-format timestamp parse with coercion-to-NULL.

    ``coalesce(try_to_timestamp(c, f1), try_to_timestamp(c, f2), ...)`` —
    the first layout that parses wins; garbage rows yield NULL instead of
    failing the job. Stays fully JVM-side.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in formats])


def season_from_month(month: Column | str) -> Column:
    """Month number -> season bucket (reference: generate_weather_data.py:26-44)."""
    m = F.col(month) if isinstance(month, str) else month
    return (
        F.when(m.isin(12, 1, 2), "Winter")
        .when(m.isin(3, 4, 5), "Spring")
        .when(m.isin(6, 7, 8), "Summer")
        .otherwise("Autumn")
    )


def stable_hash64(col: Column | str, salt: str = "") -> Column:
    """Deterministic 60-bit non-negative hash of a string column.

    ``conv(substr(md5(salt || s), 1, 15), 16, 10)`` — the first 15 hex
    digits of an MD5, read as an integer. Chosen over ``xxhash64`` because
    the exact same expression is expressible in ANSI SQL / DuckDB
    (``('0x' || substr(md5(...), 1, 15))::UBIGINT``), so MinHash / SimHash /
    fingerprint operators can be oracle-checked bit-for-bit. 60 bits is
    plenty for dedup sketches (collision odds ~n^2 / 2^60).
    """
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(salt), c) if salt else c
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("bigint")


def normalize_text(col: Column | str) -> Column:
    """Canonical text form for fingerprinting / exact dedup:
    lowercase, strip non-alphanumerics to spaces, collapse whitespace, trim.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, "[^a-z0-9]+", " ")
    return F.trim(c)


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Array of word n-gram shingles (distinct) from a text column.

    Split on whitespace, slide a window of ``n`` words, join with single
    spaces. Built from ``transform`` over an index sequence — no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(normalize_text(c), " ")
    k = F.size(words) - F.lit(n - 1)
    # guard: sequence(0, k-1) with k <= 0 would produce a DESCENDING range
    idx = F.when(k > 0, F.sequence(F.lit(0), k - F.lit(1))).otherwise(
        F.array().cast("array<int>")
    )
    shingle = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)]),
    )
    return F.array_distinct(shingle)
