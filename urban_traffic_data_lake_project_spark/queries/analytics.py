"""Gold-layer analytics queries (reference M1-M3): Monte Carlo scenario
simulation, Poisson-bootstrap CIs, factor analysis.

The stochastic/iterative parts are genuinely non-SQL-expressible, so they
register as rows-only checks (the driver records the weaker check); their
*deterministic cores* — analytic scenario expectations — carry full DuckDB
oracles, and pytest validates the stochastic outputs distributionally
(SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from urban_traffic_data_lake_project_spark.operators import bootstrap as B
from urban_traffic_data_lake_project_spark.operators import factor_analysis as FA
from urban_traffic_data_lake_project_spark.operators import monte_carlo as MC
from urban_traffic_data_lake_project_spark.queries.base import QuerySpec
from urban_traffic_data_lake_project_spark.sources import load_table

_MEASURE = "l_extendedprice"  # the 'traffic volume' analog on the star schema


# ---------------------------------------------------------------------------
# mc_scenario_expectations — deterministic core of M2 (oracle-checked)
# ---------------------------------------------------------------------------
def _mc_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return MC.scenario_expectations(spark, li, _MEASURE)


_SPEC_VALUES = ",\n       ".join(
    f"('{s.name}', '{s.description}', {s.traffic_mult} * {s.extra_mult}, {s.accident_factor})"
    for s in MC.DEFAULT_SCENARIOS
)

_MC_EXPECTATIONS_SQL = f"""
WITH base AS (
  SELECT avg({_MEASURE}) AS mu, quantile_cont({_MEASURE}, 0.75) AS p75 FROM lineitem),
spec(scenario, description, effective_mult, accident_factor) AS (
  VALUES {_SPEC_VALUES})
SELECT scenario, description,
       round(mu * effective_mult, 4) AS expected_mean,
       round(mu * {MC.VOLATILITY}, 4) AS expected_std,
       round(p75, 4) AS threshold_used,
       round({MC.BASE_ACCIDENT_RATE} * accident_factor * 100, 4) AS expected_accident_pct
FROM spec, base
"""


# ---------------------------------------------------------------------------
# mc_scenarios — the stochastic simulation itself (rows-only; pytest asserts
# the distributional contract against mc_scenario_expectations)
# ---------------------------------------------------------------------------
def _mc_scenarios(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return MC.simulate_scenarios(spark, li, _MEASURE, n_simulations=10_000, seed=42)


# ---------------------------------------------------------------------------
# bootstrap_ci — Poisson bootstrap over lineitem measures (rows-only)
# ---------------------------------------------------------------------------
def _bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return B.bootstrap_ci(
        li,
        cols=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        n_replicates=1000,
        seed=42,
    )


# ---------------------------------------------------------------------------
# bootstrap_ci_grouped — per-language bootstrap CIs over document stats
# (rows-only; pytest asserts group CIs cover per-group true means)
# ---------------------------------------------------------------------------
def _bootstrap_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return B.grouped_bootstrap_ci(
        docs, "lang", cols=["n_chars"], n_replicates=1000, seed=42
    )


# ---------------------------------------------------------------------------
# fa_loadings / fa_scores_summary — factor analysis (rows-only: loadings are
# rotation/sign ambiguous; pytest checks reconstruction + shapes)
# ---------------------------------------------------------------------------
_FA_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _fa_loadings(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    model = FA.fit_on_sample(li, cols=_FA_COLS, fit_sample_rows=50_000)
    return FA.loadings_table(spark, model)


def _fa_scores_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    model = FA.fit_on_sample(li, cols=_FA_COLS, fit_sample_rows=50_000)
    scored = FA.attach_factor_scores(li.select(*_FA_COLS), model)
    aggs = []
    for i in range(model.n_factors):
        aggs.append(F.round(F.avg(f"Factor_{i + 1}_score"), 3).alias(f"mean_f{i + 1}"))
        aggs.append(F.round(F.stddev_samp(f"Factor_{i + 1}_score"), 3).alias(f"std_f{i + 1}"))
    return scored.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)


REGISTRY: dict[str, QuerySpec] = {
    "mc_scenario_expectations": QuerySpec(_mc_expectations, _MC_EXPECTATIONS_SQL, "M2 deterministic scenario core", ("analytics",)),
    "mc_scenarios": QuerySpec(_mc_scenarios, None, "M2 Monte Carlo scenario simulation", ("analytics", "stochastic")),
    "bootstrap_ci": QuerySpec(_bootstrap, None, "M3 Poisson bootstrap CIs", ("analytics", "stochastic")),
    "bootstrap_ci_grouped": QuerySpec(_bootstrap_grouped, None, "per-group Poisson bootstrap CIs", ("analytics", "stochastic")),
    "fa_loadings": QuerySpec(_fa_loadings, None, "M1 factor loadings", ("analytics", "ml")),
    "fa_scores_summary": QuerySpec(_fa_scores_summary, None, "M1 distributed factor scoring summary", ("analytics", "ml")),
}
