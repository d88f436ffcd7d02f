"""Core relational queries match the DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from urban_traffic_data_lake_project_spark.queries import core


@pytest.mark.parametrize("name", sorted(core.REGISTRY))
def test_core_query_matches_oracle(oracle, name):
    oracle(name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"r_name", "n_name", "revenue", "n_orders"} == set(df.columns)


def test_registry_contract():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
