"""Scalar / column helper functions (all JVM-side Catalyst expressions)."""

from urban_traffic_data_lake_project_spark.functions.core import (
    normalize_text,
    parse_timestamp_multi,
    season_from_month,
    stable_hash64,
    word_shingles,
)

__all__ = [
    "normalize_text",
    "parse_timestamp_multi",
    "season_from_month",
    "stable_hash64",
    "word_shingles",
]
