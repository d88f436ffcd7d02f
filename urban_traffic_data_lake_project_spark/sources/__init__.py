"""Readers / writers with per-layer schema contracts."""

from urban_traffic_data_lake_project_spark.sources.tables import (
    TESTDATA_TABLES,
    load_table,
    load_tables,
    normalize_event_ts,
    spread_to_parallelism,
)

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "load_tables",
    "normalize_event_ts",
    "spread_to_parallelism",
]
