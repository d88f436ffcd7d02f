"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — named Spark queries, one per implemented operator
(SURVEY.md §2), each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — matching ANSI SQL for the DuckDB oracle; omitted for
genuinely non-SQL-expressible ops (stochastic simulation, ML scoring),
which get rows-only checks.

Implementation lives in ``urban_traffic_data_lake_project_spark``; this
module is just the adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from urban_traffic_data_lake_project_spark.queries import REGISTRY  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the snowflake join + grouped revenue
    aggregate (scan -> filter -> 5-way join -> agg), the spine of the
    reference pipeline re-expressed on the star schema."""
    return REGISTRY["core_join_snowflake"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
