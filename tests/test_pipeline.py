"""End-to-end medallion pipeline on reference-shaped dirty fixtures."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from urban_traffic_data_lake_project_spark.plans import pipeline as P


@pytest.fixture(scope="module")
def layers(spark):
    d = tempfile.mkdtemp(prefix="medallion_")
    paths = P.run_pipeline(spark, d, n_rows=3000, seed=42)
    yield paths
    shutil.rmtree(d, ignore_errors=True)


def test_silver_traffic_is_clean(spark, layers):
    t = spark.read.parquet(f"{layers.silver}/traffic_clean")
    n = t.count()
    assert 0 < n < 3000  # bad timestamps + dupes dropped
    # key uniqueness after dedup (NULL keys collapse to one survivor row)
    assert t.select("traffic_id").distinct().count() == n
    # no NULLs in filled columns
    for c in P.TRAFFIC_CATEGORICALS + P.TRAFFIC_NUMERICS:
        assert t.filter(F.col(c).isNull()).count() == 0, c
    # timestamps parsed
    assert dict(t.dtypes)["date_time"] == "timestamp"
    # negatives clipped away by IQR clip (negative speeds were injected)
    assert t.agg(F.min("avg_speed_kmh")).first()[0] >= -20


def test_silver_weather_mixed_column_coerced(spark, layers):
    w = spark.read.parquet(f"{layers.silver}/weather_clean")
    assert dict(w.dtypes)["visibility_m"] == "double"
    assert w.filter(F.col("visibility_m").isNull()).count() == 0


def test_merge_fans_out_on_day_key(spark, layers):
    t = spark.read.parquet(f"{layers.silver}/traffic_clean")
    m = spark.read.parquet(f"{layers.silver}/merged_data")
    assert m.count() >= t.count()  # left join keeps all traffic rows
    # suffixed collision columns exist
    assert "date_time_traffic" in m.columns and "date_time_weather" in m.columns
    assert "visibility_m_traffic" in m.columns and "visibility_m_weather" in m.columns
    assert "city" in m.columns  # join key not suffixed


def test_gold_outputs(spark, layers):
    sc = spark.read.parquet(f"{layers.gold}/monte_carlo_scenarios")
    assert sc.count() == 4
    assert set(sc.columns) >= {
        "scenario", "description", "mean_traffic", "traffic_std",
        "congestion_prob_high", "accident_risk_high", "threshold_used", "n_simulations",
    }
    boot = spark.read.parquet(f"{layers.gold}/monte_carlo_results")
    assert 0 < boot.count() <= 8
    assert {"column_name", "mean_estimate", "ci_lower_95", "ci_upper_95"} <= set(boot.columns)
    loadings = spark.read.parquet(f"{layers.gold}/factor_loadings")
    factors = spark.read.parquet(f"{layers.gold}/traffic_weather_factors")
    k = len([c for c in loadings.columns if c.endswith("_loading")])
    assert 1 <= k <= 5
    score_cols = [c for c in factors.columns if c.endswith("_score")]
    assert len(score_cols) == k
    m = spark.read.parquet(f"{layers.silver}/merged_data")
    assert factors.count() == m.count()


def test_silver_partitioned_by_day(spark, layers):
    import glob

    parts = glob.glob(f"{layers.silver}/traffic_clean/day=*")
    assert len(parts) > 10  # day partitioning materialized for pruning
