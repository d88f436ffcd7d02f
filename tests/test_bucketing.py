"""Bucketed co-located joins: same-bucketed tables join with no shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from urban_traffic_data_lake_project_spark.sources import load_table
from urban_traffic_data_lake_project_spark.sources.writers import write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # force the sort-merge path: broadcast would bypass bucketing entirely
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    write_bucketed(li, "li_bucketed", ["l_orderkey"], n_buckets=8)
    write_bucketed(o, "o_bucketed", ["o_orderkey"], n_buckets=8)
    yield "li_bucketed", "o_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = spark.table(li_t)
    o = spark.table(o_t)
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").agg(
        F.sum("l_quantity").alias("q")
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join inputs must come straight from the bucketed scans — no
    # Exchange (shuffle) on the join keys
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "SelectedBucketsCount" in plan


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_tables):
    li_t, o_t = bucketed_tables
    bucketed = (
        spark.table(li_t)
        .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("s"))
        .first()
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("s"))
        .first()
    )
    assert bucketed == plain
