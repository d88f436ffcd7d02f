"""Readers / writers with per-layer schema contracts."""

from urban_traffic_data_lake_project_spark.sources.tables import (
    TESTDATA_TABLES,
    load_table,
    load_tables,
)

__all__ = ["TESTDATA_TABLES", "load_table", "load_tables"]
