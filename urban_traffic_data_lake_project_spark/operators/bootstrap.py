"""Bootstrap confidence intervals (reference M3, scripts/monte_carlo.py:237-285).

Reference semantics: for each numeric column (first ``max_columns`` with
>20 non-null values), draw ``n_simulations`` resamples-with-replacement of
size n, record each resample's mean, and report mean / population-std /
2.5% / 97.5% of those means.

Spark-first design — the **Poisson bootstrap**: in a resample of size n,
each row's multiplicity is Binomial(n, 1/n) -> Poisson(1) for large n. So
instead of materializing n x n_simulations resampled rows, each partition
draws a Poisson(1) weight per (row, replicate) and emits per-replicate
partial sums (sum w*x, sum w). One Arrow-batched ``mapInPandas`` pass over
the data + one tiny aggregation by replicate. Cost is O(rows x replicates)
vectorized multiply-adds with O(replicates) output per partition — scales
to any data size; replicate count is the only memory knob.

Deviation from the reference (documented): replicate composition is
Poisson(1) rather than exact multinomial — statistically equivalent for
CI estimation (the standard large-scale bootstrap; see e.g. the "scalable
bootstrap" literature), and tests assert distributional agreement.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from urban_traffic_data_lake_project_spark.operators.cleaning import compute_medians


def _partial_schema() -> str:
    return "column_name string, replicate int, wx double, w double"


def poisson_bootstrap_means(
    df: DataFrame,
    cols: Sequence[str],
    n_replicates: int = 1000,
    seed: int = 42,
) -> DataFrame:
    """Per (column, replicate) weighted means. Downstream consumers compute
    CI stats over the replicate dimension (tiny: n_replicates rows/col)."""
    proj = df.select(*cols)
    # the weight-drawing pass is CPU-bound numpy (O(rows x replicates)
    # poisson draws); parquet split count (often just a few row groups)
    # would convoy it — spread over the full parallelism
    target = proj.sparkSession.sparkContext.defaultParallelism
    if proj.rdd.getNumPartitions() < target:
        proj = proj.repartition(target)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Seed deterministically per task partition.
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        rng = np.random.default_rng(seed * 100_003 + pid)
        acc_wx = {c: np.zeros(n_replicates) for c in cols}
        acc_w = {c: np.zeros(n_replicates) for c in cols}
        for pdf in batches:
            for c in cols:
                x = pdf[c].to_numpy(dtype="float64")
                mask = ~np.isnan(x)
                x = x[mask]
                if x.size == 0:
                    continue
                # Poisson(1) weights, (rows x replicates) in chunks to
                # bound memory at ~32 MB per chunk.
                chunk = max(1, int(4_000_000 / max(n_replicates, 1)))
                for lo in range(0, x.size, chunk):
                    xs = x[lo : lo + chunk]
                    w = rng.poisson(1.0, size=(xs.size, n_replicates))
                    acc_wx[c] += w.T @ xs
                    acc_w[c] += w.sum(axis=0)
        out = []
        for c in cols:
            out.append(
                pd.DataFrame(
                    {
                        "column_name": c,
                        "replicate": np.arange(n_replicates, dtype="int32"),
                        "wx": acc_wx[c],
                        "w": acc_w[c],
                    }
                )
            )
        yield pd.concat(out, ignore_index=True)

    partials = proj.mapInPandas(gen, schema=_partial_schema())
    return (
        partials.groupBy("column_name", "replicate")
        .agg((F.sum("wx") / F.sum("w")).alias("replicate_mean"))
    )


def bootstrap_ci(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    n_replicates: int = 1000,
    max_columns: int = 8,
    min_values: int = 20,
    seed: int = 42,
    median_impute: bool = True,
) -> DataFrame:
    """The reference's bootstrap table (monte_carlo.py:277-283): one row per
    column with mean_estimate, std_estimate (population std of replicate
    means), ci_lower_95, ci_upper_95, simulations."""
    if cols is None:
        from pyspark.sql.types import NumericType

        cols = [f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)]
    cols = list(cols)[:max_columns]
    if median_impute:
        df = df.na.fill(compute_medians(df, cols))
    counts = df.agg(*[F.count(c).alias(c) for c in cols]).first()
    cols = [c for c in cols if (counts[c] or 0) > min_values]
    if not cols:
        raise ValueError("no eligible columns for bootstrap")
    means = poisson_bootstrap_means(df, cols, n_replicates, seed)
    return means.groupBy("column_name").agg(
        F.round(F.avg("replicate_mean"), 4).alias("mean_estimate"),
        F.round(F.stddev_pop("replicate_mean"), 4).alias("std_estimate"),
        F.round(F.percentile("replicate_mean", 0.025), 4).alias("ci_lower_95"),
        F.round(F.percentile("replicate_mean", 0.975), 4).alias("ci_upper_95"),
        F.lit(n_replicates).alias("simulations"),
    )
