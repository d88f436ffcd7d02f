from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from urban_traffic_data_lake_project_spark.session import get_spark
from urban_traffic_data_lake_project_spark.testing import compare_frames, duckdb_con

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests"},
    )
    yield s


@pytest.fixture(scope="session")
def oracle(spark):
    """Callable: assert a registered query matches its DuckDB oracle at SF_DIR."""
    from urban_traffic_data_lake_project_spark.queries import REGISTRY

    con = duckdb_con(SF_DIR)

    def check(name: str) -> None:
        spec = REGISTRY[name]
        assert spec.oracle is not None, f"{name} has no oracle"
        spark_pdf = spec.fn(spark, SF_DIR).toPandas()
        oracle_pdf = con.execute(spec.oracle).df()
        problems = compare_frames(spark_pdf, oracle_pdf)
        assert not problems, f"{name}: " + "; ".join(problems)

    yield check
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
