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


def shingles_from_words(words: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a word-array column.

    Built as ``arrays_zip`` of n shifted slices, so the transform lambda
    touches ONLY its own struct argument. The naive form — a lambda doing
    ``element_at(words, i+j)`` — re-evaluates the whole ``words``
    expression per element (Catalyst does no CSE inside higher-order
    lambdas, and CollapseProject re-inlines upstream projections), which
    measured 6x slower on a 5k-doc corpus (13s -> 2.3s).
    """
    cnt = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    shifted = [F.slice(words, k + 1, cnt) for k in range(n)]
    zipped = F.arrays_zip(*shifted)
    shingle = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)])
    )
    return F.array_distinct(shingle)


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Array of word n-gram shingles (distinct) from a text column.
    Prefer the two-step form (materialize the split, then
    ``shingles_from_words``) in performance-sensitive paths — see note
    there."""
    c = F.col(col) if isinstance(col, str) else col
    return shingles_from_words(F.split(normalize_text(c), " "), n)
