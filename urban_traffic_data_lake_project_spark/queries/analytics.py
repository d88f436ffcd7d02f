"""Placeholder — populated in this round."""

from urban_traffic_data_lake_project_spark.queries.base import QuerySpec

REGISTRY: dict[str, QuerySpec] = {}
