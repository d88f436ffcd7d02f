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


def test_interval_overlap_join_equals_naive_and_dedups(spark):
    """Binned interval-overlap join == naive theta join, including
    touching endpoints, and a pair sharing MANY bins appears exactly
    once (the first-shared-bin dedup predicate)."""
    import datetime as dt

    from urban_traffic_data_lake_project_spark.operators.merge import interval_overlap_join

    base = dt.datetime(2024, 1, 1)

    def t(s):
        return base + dt.timedelta(seconds=s)

    # left: (user, start, end, id) — includes a 5000s interval spanning
    # ~9 bins of 600s, singleton (start == end), and a far-away one
    left = spark.createDataFrame(
        [(1, t(0), t(5000), 0), (1, t(100), t(100), 1), (2, t(0), t(50), 2), (3, t(10), t(20), 3)],
        "user_id long, s timestamp, e timestamp, l_id long",
    )
    right = spark.createDataFrame(
        [(1, t(900), t(4000), 0),   # nested inside l0 across many bins
         (1, t(5000), t(6000), 1),  # touches l0 exactly at 5000
         (1, t(50), t(99), 2),      # ends 1s before l1 starts -> no overlap with l1
         (2, t(51), t(60), 3),      # starts 1s after l2 ends -> no overlap
         (9, t(0), t(10), 4)],
        "user_id long, s2 timestamp, e2 timestamp, r_id long",
    )
    out = interval_overlap_join(
        left, right, ["user_id"], "s", "e", "s2", "e2", bin_seconds=600
    ).collect()
    got = sorted((r["l_id"], r["r_id"]) for r in out)
    naive = sorted(
        (lr["l_id"], rr["r_id"])
        for lr in left.collect()
        for rr in right.collect()
        if lr["user_id"] == rr["user_id"]
        and lr["s"] <= rr["e2"] and rr["s2"] <= lr["e"]
    )
    assert got == naive == [(0, 0), (0, 1), (0, 2)]  # each exactly once


def test_time_range_window_is_value_defined(spark):
    """RANGE frame includes peers: simultaneous events see each other
    regardless of row order."""
    import datetime as dt

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    e = spark.createDataFrame(
        [(1, base, 1.0), (1, base, 2.0),                      # exact tie
         (1, base + dt.timedelta(seconds=3600), 4.0),          # on the 1h boundary
         (1, base + dt.timedelta(seconds=3601), 8.0)],         # just outside for row 0/1
        "user_id long, ts timestamp, value double",
    )
    w = Window.partitionBy("user_id").orderBy(F.unix_timestamp("ts")).rangeBetween(-3600, 0)
    rows = {
        (r["value"], r["n"]) for r in e.select("value", F.count(F.lit(1)).over(w).alias("n")).collect()
    }
    # ties both see n=2; boundary event (3600s later) still includes them (inclusive frame)
    assert rows == {(1.0, 2), (2.0, 2), (4.0, 3), (8.0, 2)}


def test_fuzzy_join_blocked_equals_naive(spark):
    """q-gram blocked fuzzy join == cartesian Levenshtein filter for
    strings above the completeness bound, including distance-0 (exact)
    and exactly-max_dist pairs; below-bound shorties are documented to
    possibly miss, so the fixture stays above it."""
    from urban_traffic_data_lake_project_spark.operators.merge import fuzzy_join_blocked

    left = spark.createDataFrame(
        [(1, "red widget"), (2, "redwidget"), (3, "blue bolt"), (4, "green gear")],
        "lid long, lname string",
    )
    right = spark.createDataFrame(
        [("red widget",), ("blue boltz",), ("purple cog",)], "rname string"
    )
    got = sorted(
        (r["lid"], r["rname"], r["dist"])
        for r in fuzzy_join_blocked(left, right, "lname", "rname", max_dist=1).collect()
    )
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    naive = sorted(
        (lr["lid"], rr["rname"], lev(lr["lname"], rr["rname"]))
        for lr, rr in itertools.product(left.collect(), right.collect())
        if lev(lr["lname"], rr["rname"]) <= 1
    )
    assert got == naive
    assert (1, "red widget", 0) in got and (2, "red widget", 1) in got
    assert (3, "blue boltz", 1) in got


def test_merge_upsert_actions_and_null_payloads(spark):
    """All three MERGE actions fire; a NULL payload column in the target
    does not get misread as 'row absent' (explicit presence markers)."""
    from urban_traffic_data_lake_project_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, 10, None), (2, 20, 2.0), (3, 30, 3.0)], "k long, n long, v double"
    )
    source = spark.createDataFrame(
        [(1, 1, 1.5), (4, 40, 4.0)], "k long, n long, v double"
    )
    out = {
        r["k"]: r
        for r in merge_upsert(
            target, source, ["k"], combine={"n": lambda t, s: t + s}
        ).collect()
    }
    assert out[1]["merge_action"] == "update" and out[1]["n"] == 11
    assert out[1]["v"] == 1.5           # last-writer-wins default
    assert out[2]["merge_action"] == "keep" and out[2]["n"] == 20
    assert out[3]["merge_action"] == "keep"
    assert out[4]["merge_action"] == "insert" and out[4]["n"] == 40


def test_record_linkage_resolves_every_dirty_record_to_itself(spark, sf_dir):
    """The corruption (one dropped digit, small balance offset, blanked
    segments) must stay within Fellegi-Sunter's separation: the best
    candidate is always the true record, high-agreement pairs classify
    as links, and the score decomposes exactly into the three field
    weights."""
    from urban_traffic_data_lake_project_spark.queries import windows as qw

    out = qw.REGISTRY["join_record_linkage"].fn(spark, sf_dir).collect()
    from urban_traffic_data_lake_project_spark.sources import load_table

    assert len(out) == load_table(spark, sf_dir, "customer").count()
    for r in out:
        assert r["correct"], r  # synthetic truth: self-match always wins
        assert r["n_candidates"] >= 1
        expected = round(
            sum(
                qw._FS_W[k][0] if r[f] else qw._FS_W[k][1]
                for k, f in (("name", "name_agree"), ("bal", "bal_agree"), ("seg", "seg_agree"))
            ),
            6,
        )
        assert abs(r["score"] - expected) < 1e-9
        want = (
            "link" if r["score"] >= qw._FS_LINK
            else "possible" if r["score"] >= qw._FS_POSSIBLE
            else "non_link"
        )
        assert r["decision"] == want
    # the dropped-digit name still agrees for every self pair
    assert all(r["name_agree"] for r in out)


def test_linkage_em_fit_separates_match_class(spark, sf_dir):
    """The unsupervised EM must land where the synthetic corruption put
    the truth: every field separates (m >> u), weights decompose from
    m/u, prevalence matches the true-pair share of the blocked candidate
    set, and the fitted m_seg reflects the ~1/11 segment blanking."""
    import math

    from urban_traffic_data_lake_project_spark.queries import windows as qw

    out = {r["field"]: r for r in qw.REGISTRY["join_linkage_em_fit"].fn(spark, sf_dir).collect()}
    assert set(out) == {"name", "bal", "seg"}
    prev = {r["prevalence"] for r in out.values()}
    assert len(prev) == 1
    p = prev.pop()
    assert 0.0 < p < 1.0
    for f, r in out.items():
        # m can round to exactly 1.0 at tiny SF (clamped at 1 - 1e-9)
        assert 0.0 < r["u"] < r["m"] <= 1.0, f
        assert r["m"] - r["u"] > 0.5, f  # real separation, not a degenerate fit
        # reconstruction from the 6-dp-rounded m/u drifts by up to the
        # rounding step's relative effect on each log argument
        tol = 1e-6 * (1 / r["m"] + 1 / r["u"])
        assert abs(r["w_agree"] - math.log2(r["m"] / r["u"])) < tol, f
        if r["m"] < 1.0:  # else the 6-dp rounding hides the clamped 1-m
            tol_d = 1e-6 * (1 / (1 - r["m"]) + 1 / (1 - r["u"]))
            assert (
                abs(r["w_disagree"] - math.log2((1 - r["m"]) / (1 - r["u"]))) < tol_d
            ), f
        else:
            assert r["w_disagree"] < -20, f  # clamped: hugely negative
    # true pairs = one self-match per customer; prevalence = that share
    # (width=1: the same fixed-width histogram the EM fit uses)
    cand = qw._linkage_candidates(spark, sf_dir, width=1)
    n_pairs = cand.count()
    n_true = cand.filter("d_key = __ck").count()
    assert abs(p - n_true / n_pairs) < 0.05
    # segment blanking hits 1/11 of records, so m_seg ~ 10/11
    assert abs(out["seg"]["m"] - 10 / 11) < 0.03


def test_choose_block_width_policy(spark, sf_dir):
    """The auto-sized linkage block (r10 verdict item 5): occupancy mass
    is monotone non-increasing in width, the chooser picks the narrowest
    width under target (parity with an explicit-width run), and extreme
    targets hit the two boundary widths."""
    from pyspark.sql import functions as F

    from urban_traffic_data_lake_project_spark.operators.merge import (
        choose_block_width,
    )
    from urban_traffic_data_lake_project_spark.queries import windows as qw
    from urban_traffic_data_lake_project_spark.sources import load_table

    cust = load_table(spark, sf_dir, "customer")

    def mass(w: int) -> float:
        occ = cust.groupBy(
            "c_nationkey", F.expr(f"right(c_name, {w})")
        ).agg(F.count(F.lit(1)).alias("c"))
        r = occ.agg(
            F.sum("c").alias("n"), F.sum(F.col("c") * F.col("c")).alias("sq")
        ).first()
        return float(r["sq"]) / float(r["n"])

    masses = [mass(w) for w in range(1, 5)]
    # monotonicity: finer blocks never increase the pairs-per-probe mass
    assert all(a >= b for a, b in zip(masses, masses[1:])), masses
    # the chooser picks exactly the narrowest width under target
    target = qw._LINKAGE_BLOCK_TARGET
    expected = next(
        (w for w, m in enumerate(masses, start=1) if m <= target), 4
    )
    got = choose_block_width(
        cust, "c_name", ["c_nationkey"], max_width=4,
        target_pairs_per_row=target,
    )
    assert got == expected, (got, expected, masses)
    # a huge target always yields width 1; an impossible one caps at max
    assert choose_block_width(
        cust, "c_name", ["c_nationkey"], 4, target_pairs_per_row=1e18
    ) == 1
    assert choose_block_width(
        cust, "c_name", ["c_nationkey"], 4, target_pairs_per_row=0.0
    ) == 4
    # parity: the auto-width candidate set IS the explicit-width one
    auto = qw._linkage_candidates(spark, sf_dir)
    explicit = qw._linkage_candidates(spark, sf_dir, width=got)
    assert auto.exceptAll(explicit).count() == 0
    assert explicit.exceptAll(auto).count() == 0
