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


def test_describe_table_matches_pandas_describe(spark):
    import numpy as np
    import pandas as pd

    from urban_traffic_data_lake_project_spark.operators.stats import describe_table

    rng = np.random.default_rng(8)
    pdf = pd.DataFrame(
        {
            "a": rng.standard_normal(500),
            "b": rng.integers(0, 100, 500).astype("float64"),
            "label": ["x"] * 500,  # non-numeric: auto-detection must skip it
        }
    )
    pdf.loc[::17, "a"] = None
    df = spark.createDataFrame(pdf)
    out = {r["column_name"]: r for r in describe_table(df).collect()}
    assert set(out) == {"a", "b"}
    ref = pdf.describe()  # count/mean/std/min/25%/50%/75%/max
    for c in ("a", "b"):
        got = out[c]
        assert got["n"] == int(ref[c]["count"])
        for spark_k, pd_k in [
            ("mean", "mean"), ("std", "std"), ("min_value", "min"),
            ("q25", "25%"), ("q50", "50%"), ("q75", "75%"), ("max_value", "max"),
        ]:
            assert got[spark_k] == pytest.approx(ref[c][pd_k], rel=1e-9), (c, spark_k)


def test_registry_driver_window_contract():
    """The driver's correctness gate records ~50 entries in registration
    order. Round-3 rotation: the 26 queries deferred in rounds 1-2 (the
    curation/sketch/streaming surface) now occupy the recorded window so
    they gain driver-grade proof; 30 queries with green rows in BOTH
    CORRECTNESS_r01.json and CORRECTNESS_r02.json moved to the "defer"
    tier (still verified every round by tools/check_oracle.py). A
    regression here silently drops core queries out of the recorded
    window."""
    from urban_traffic_data_lake_project_spark.queries import REGISTRY

    tiers = []
    for spec in REGISTRY.values():
        if spec.oracle is None:
            tiers.append(2)
        elif "defer" in spec.tags:
            tiers.append(1)
        else:
            tiers.append(0)
    assert tiers == sorted(tiers), "registry must be ordered core -> defer -> rows-only"
    assert tiers.count(0) <= 50, f"core oracle tier must fit the 50-entry window, got {tiers.count(0)}"
    # Every query deferred in r01/r02 must now sit inside the recorded window.
    promoted = {
        "agg_grouped_ols", "dedup_clusters", "sample_stratified",
        "sample_split_shards", "text_chunks", "sim_lang_centroids",
        "curation_pipeline", "merge_range_join", "stream_interval_join",
        "join_salted_skew", "stream_stateful_user_stats",
        "decontam_eval_overlap", "sketch_hll_distinct",
        "curation_pack_sequences", "sample_domain_mix", "text_redact_pii",
        "dedup_incremental", "sim_embedding_quantize", "sketch_hll_rollup",
        "sample_weighted_quality", "stream_redact_pii",
        "text_unigram_logprob", "sketch_cm_term_freq", "stream_sketch_hll",
        "agg_key_skew_profile", "sketch_bloom_screen",
    }
    recorded = {
        n for n, s in REGISTRY.items()
        if s.oracle is not None and "defer" not in s.tags
    }
    assert promoted <= recorded, f"rotated out of window: {promoted - recorded}"
    # Deferred queries must still be oracle-backed (check_oracle covers them).
    assert all(s.oracle is None or s.oracle.strip() for s in REGISTRY.values())


def test_histogram_matches_numpy(spark, sf_dir):
    """Equal-width binning parity with numpy.histogram (same convention:
    max value lands in the last bin, empty bins allowed)."""
    import numpy as np

    from urban_traffic_data_lake_project_spark.operators.stats import histogram
    from urban_traffic_data_lake_project_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    out = histogram(li, ("l_quantity", "l_extendedprice"), bins=40).collect()
    got = {
        (r["col_name"], r["bin"]): r["n"] for r in out
    }
    pdf = li.select("l_quantity", "l_extendedprice").toPandas()
    for c in ("l_quantity", "l_extendedprice"):
        v = pdf[c].dropna().to_numpy(dtype="float64")
        counts, _ = np.histogram(v, bins=40, range=(v.min(), v.max()))
        for b, n in enumerate(counts):
            assert got.get((c, b), 0) == n, (c, b)
    # bin edges reconstruct the column range
    lo = min(r["bin_lo"] for r in out if r["col_name"] == "l_quantity")
    hi = max(r["bin_hi"] for r in out if r["col_name"] == "l_quantity")
    assert abs(lo - pdf["l_quantity"].min()) < 1e-6
    assert abs(hi - pdf["l_quantity"].max()) < 1e-6
