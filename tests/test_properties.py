"""Property-based tests (hypothesis) for the numerically-sensitive
operators: exact percentile refinement vs numpy's reference
implementation, and cleaning invariants on arbitrary inputs."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from urban_traffic_data_lake_project_spark.operators import cleaning as C
from urban_traffic_data_lake_project_spark.operators.stats import exact_percentiles

finite_doubles = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    values=st.lists(finite_doubles, min_size=3, max_size=300),
    p=st.sampled_from([0.01, 0.25, 0.5, 0.75, 0.9, 0.99]),
)
def test_exact_percentiles_match_numpy(spark, values, p):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    (got,) = exact_percentiles(df, "x", [p], accuracy=50)
    want = float(np.quantile(np.array(values), p, method="linear"))
    assert got == pytest.approx(want, rel=1e-12, abs=1e-9), (len(values), p)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    values=st.lists(
        st.one_of(finite_doubles, st.none()), min_size=5, max_size=200
    ).filter(lambda xs: sum(x is not None for x in xs) >= 4)
)
def test_iqr_clip_invariants(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    bounds = C.compute_iqr_bounds(df, ["x"])
    lo, hi = bounds["x"]
    out = [r["x"] for r in C.iqr_clip(df, ["x"]).collect()]
    n_null_in = sum(v is None for v in values)
    n_null_out = sum(v is None for v in out)
    assert n_null_in == n_null_out  # clip preserves NULLs
    tol = 1e-9 * max(1.0, abs(lo), abs(hi))
    assert all(lo - tol <= v <= hi + tol for v in out if v is not None)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=st.lists(st.one_of(finite_doubles, st.none()), min_size=1, max_size=100))
def test_median_fill_leaves_no_nulls_when_any_value(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    filled = C.median_fill(df, ["x"])
    nulls = filled.filter(filled.x.isNull()).count()
    if any(v is not None for v in values):
        assert nulls == 0
    else:
        assert nulls == len(values)  # nothing to fit on — NULLs remain
