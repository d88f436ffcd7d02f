"""Core relational queries match the DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from urban_traffic_data_lake_project_spark.queries import core


@pytest.mark.parametrize("name", sorted(core.REGISTRY))
def test_core_query_matches_oracle(oracle, name):
    oracle(name)


def test_grouped_ols_matches_expression_aggregates(spark, sf_dir):
    from pyspark.sql import functions as F

    from urban_traffic_data_lake_project_spark.operators.stats import grouped_ols
    from urban_traffic_data_lake_project_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    via_pandas = {
        r["l_returnflag"]: (r["intercept"], r["beta_l_quantity"])
        for r in grouped_ols(li, ["l_returnflag"], "l_extendedprice", ["l_quantity"]).collect()
    }
    via_expr = {
        r["l_returnflag"]: (r["i"], r["s"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.regr_intercept("l_extendedprice", "l_quantity").alias("i"),
            F.regr_slope("l_extendedprice", "l_quantity").alias("s"),
        )
        .collect()
    }
    assert set(via_pandas) == set(via_expr)
    for k in via_pandas:
        assert via_pandas[k][0] == pytest.approx(via_expr[k][0], rel=1e-6)
        assert via_pandas[k][1] == pytest.approx(via_expr[k][1], rel=1e-6)


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
