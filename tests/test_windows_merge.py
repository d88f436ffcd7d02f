"""Window / as-of / merge queries: oracle parity + as-of semantics."""

from __future__ import annotations

import datetime as dt

import pytest

from urban_traffic_data_lake_project_spark.operators import merge as M
from urban_traffic_data_lake_project_spark.queries import windows as qw


@pytest.mark.parametrize("name", sorted(qw.REGISTRY))
def test_windows_query_matches_oracle(oracle, name):
    oracle(name)


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(30)), (3, "u2", _ts(5))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts(8), 100.0), ("u1", _ts(30), 200.0), ("u1", _ts(31), 300.0)],
        "user_id string, ts timestamp, value double",
    )
    out = M.asof_join(left, right, by=["user_id"], left_on="ts", right_on="ts",
                      right_cols=["ts", "value"])
    rows = {r["event_id"]: (r["ts_asof"], r["value_asof"]) for r in out.collect()}
    assert rows[1] == (_ts(8), 100.0)       # most recent <= 00:10
    assert rows[2] == (_ts(30), 200.0)      # equal timestamps match (non-strict)
    assert rows[3] == (None, None)          # no right rows for u2


def test_asof_join_strict_excludes_equal(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(30))], "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u1", _ts(8), 100.0), ("u1", _ts(30), 200.0)],
        "user_id string, ts timestamp, value double",
    )
    out = M.asof_join(left, right, by=["user_id"], left_on="ts", right_on="ts",
                      right_cols=["value"], strict=True)
    assert out.collect()[0]["value_asof"] == 100.0


def test_salted_join_matches_plain_join(spark):
    import pyspark.sql.functions as F

    # heavy skew: 90% of left rows share key 0
    left = spark.range(2000).select(
        (F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id"))).alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 2).alias("rval"))
    plain = left.join(right, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("lval").alias("sl"), F.sum("rval").alias("sr")
    ).first()
    salted = M.salted_join(left, right, ["k"]).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("lval").alias("sl"), F.sum("rval").alias("sr")
    ).first()
    assert plain == salted

    plain_left = left.join(right, "k", "left").count()
    salted_left = M.salted_join(left, right, ["k"], "left").count()
    assert plain_left == salted_left


def test_suffix_join_renames_collisions(spark):
    l = spark.createDataFrame([(1, 10.0)], "k long, v double")
    r = spark.createDataFrame([(1, 20.0)], "k long, v double")
    out = M.suffix_join(l, r, on=["k"], lsuffix="_l", rsuffix="_r")
    assert set(out.columns) == {"k", "v_l", "v_r"}
    row = out.collect()[0]
    assert (row["v_l"], row["v_r"]) == (10.0, 20.0)


def test_range_join_binned_equals_naive_theta_join(spark):
    import datetime as dt

    from urban_traffic_data_lake_project_spark.operators.merge import range_join_binned

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(u, base + dt.timedelta(seconds=s), i)
         for i, (u, s) in enumerate([(1, 0), (1, 599), (1, 600), (1, 1800), (2, 30), (3, 5)])],
        "user_id long, ts timestamp, l_id long",
    )
    right = spark.createDataFrame(
        [(u, base + dt.timedelta(seconds=s), i)
         for i, (u, s) in enumerate([(1, 300), (1, 1200), (1, 2399), (2, 631), (4, 0)])],
        "user_id long, view_ts timestamp, r_id long",
    )
    got = {
        (r["l_id"], r["r_id"])
        for r in range_join_binned(left, right, ["user_id"], "ts", "view_ts", 600).collect()
    }
    naive = {
        (l["l_id"], r["r_id"])
        for l in left.collect()
        for r in right.collect()
        if l["user_id"] == r["user_id"]
        and abs((l["ts"] - r["view_ts"]).total_seconds()) <= 600
    }
    assert got == naive and naive  # exact agreement incl. boundary (=600s)


def test_funnel_step_ordering(spark, sf_dir):
    """A later step can never precede an earlier one, latencies are
    positive, and purchase implies click (the funnel is ordered)."""
    from urban_traffic_data_lake_project_spark.queries.windows import REGISTRY as WR

    rows = WR["win_funnel_steps"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.purchased:
            assert r.clicked == 1
            assert r.us_to_purchase > r.us_to_click > 0
        elif r.clicked:
            assert r.us_to_click > 0 and r.us_to_purchase is None
        else:
            assert r.us_to_click is None and r.us_to_purchase is None


def test_ewma_matches_pandas_reference(spark):
    """The windowed power-of-two EWMA equals pandas ewm(alpha=.5) exactly
    while the frame covers the full history (rows < frame width)."""
    import pandas as pd
    from urban_traffic_data_lake_project_spark.queries.windows import REGISTRY as WR
    import os, tempfile

    # tiny synthetic events table routed through the query's own loader
    pdf = pd.DataFrame(
        {
            "event_id": range(8),
            "ts": pd.date_range("2024-01-01", periods=8, freq="1min"),
            "user_id": [1] * 8,
            "event_type": ["view"] * 8,
            "value": [10.0, 20.0, 5.0, 0.0, 40.0, 1.0, 2.0, 80.0],
            "props": ["{}"] * 8,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(pdf).write.parquet(os.path.join(d, "events.parquet"))
        out = (
            WR["win_ewma"].fn(spark, d).orderBy("event_id").collect()
        )
    expected = pdf["value"].ewm(alpha=0.5, adjust=True).mean()
    for r, e in zip(out, expected):
        assert abs(r.ewma - e) <= 1e-6, (r.event_id, r.ewma, e)


def test_asof_directions_match_pandas_merge_asof(spark):
    """All three directions agree with pandas.merge_asof on a fixture
    with unmatched edges, equal timestamps, and multiple keys."""
    import pandas as pd
    from urban_traffic_data_lake_project_spark.operators.merge import asof_join

    left_pd = pd.DataFrame(
        {
            "k": ["a"] * 4 + ["b"] * 3,
            "t": [1, 5, 10, 20, 2, 7, 7],
            "lid": list(range(7)),
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": ["a"] * 3 + ["b"] * 2,
            "t": [2, 5, 12, 7, 30],
            "val": [10.0, 20.0, 30.0, 40.0, 50.0],
        }
    )
    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    for direction in ("backward", "forward", "nearest"):
        got = {
            r.lid: r.val_x
            for r in asof_join(
                left, right, ["k"], "t", "t", ["val"], suffix="_x", direction=direction
            ).collect()
        }
        exp_df = pd.merge_asof(
            left_pd.sort_values("t"), right_pd.sort_values("t"),
            on="t", by="k", direction=direction,
        )
        exp = {int(r.lid): (None if pd.isna(r.val) else float(r.val)) for _, r in exp_df.iterrows()}
        assert got == exp, (direction, got, exp)
