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

import math
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from urban_traffic_data_lake_project_spark.operators.cleaning import compute_medians


def _partial_schema() -> str:
    return "column_name string, replicate int, wx double, w double"


# Poisson(1) CDF truncated at 8 (P[X > 8] ~ 1.1e-6 — immaterial for CI
# estimation). The weight pipeline is float32 end-to-end: with 32 workers
# the pass is memory-bandwidth-bound, so halving the matrix bytes beats
# faster single-thread kernels; Generator.poisson (int64) additionally
# loses BLAS for the partial-sum matmul. float32 sgemm partials perturb a
# replicate mean by ~1e-7 relative — orders below the Monte Carlo noise
# (std/sqrt(n_replicates)) the estimator itself carries.
_POISSON1_CDF = np.cumsum([math.exp(-1.0) / math.factorial(k) for k in range(8)]).astype(
    np.float32
)


def _poisson1_weights(rng: np.random.Generator, shape: tuple[int, int]) -> np.ndarray:
    u = rng.random(shape, dtype=np.float32)
    w = np.zeros(shape, dtype=np.float32)
    for c in _POISSON1_CDF:
        w += u > c
    return w


# --- exact (oracle-replayable) weight path -------------------------------
# Counter-based RNG: one stable_hash64 per ROW (JVM-side md5, cheap), then
# SplitMix64 of (row_hash + (replicate+1) * GOLDEN) per (row, replicate)
# cell. Every operation is integer arithmetic mod 2^64 — bit-identical in
# vectorized numpy uint64 and in DuckDB (split-32 multiply on UBIGINT, see
# queries/analytics.py _sm64_sql) — so the oracle replays the exact weight
# matrix regardless of partitioning, task order, or engine. The uniform is
# z / 2^64 (correctly-rounded u64->f64 on both engines), thresholded
# against the same truncated-Poisson CDF literals. The engine side skips
# the float conversion entirely: "round_f64(z)/2^64 > c" is equivalent to
# the INTEGER comparison "z > T_c" where T_c is the largest uint64 whose
# rounded float64 value is <= c * 2^64 (division by a power of two is
# exact scaling, so only the u64->f64 rounding step matters; _int_threshold
# resolves it by scanning the rounding neighborhood once at import). On
# top of that, the weight — the COUNT of thresholds below z — is read from
# a 256-entry top-byte LUT; only the 5 byte buckets that actually contain
# a threshold fall back to exact comparisons (~2% of cells). Bit-equality
# of the whole chain vs the float64 reference formula is pinned by
# tests (random + threshold-boundary z values).
_SM_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)
_POW64 = 18446744073709551616.0  # 2^64


def _int_threshold(c: float) -> int:
    """Largest uint64 z with round_f64(z) <= c * 2^64 — so the uniform
    test u > c becomes the integer test z > threshold, bit-for-bit."""
    cap = np.float64(c) * _POW64
    t = int(cap)
    # scan the u64->f64 rounding neighborhood (grain 2^11 at this
    # magnitude) for the exact crossover
    zs = np.arange(max(t - 5000, 0), t + 5000, dtype=np.uint64)
    ok = zs.astype(np.float64) <= cap
    return int(zs[ok][-1]) if ok.any() else 0


_INT_THRESH = np.array([_int_threshold(float(c)) for c in _POISSON1_CDF], dtype=np.uint64)
# top-byte LUT: bucket b covers z in [b*2^56, (b+1)*2^56); where no
# threshold lands inside the bucket the weight is fully determined
_WLUT = np.zeros(256, dtype=np.uint8)
_WAMBIG = np.zeros(256, dtype=bool)
for _b in range(256):
    _lo, _hi = _b << 56, ((_b + 1) << 56) - 1
    _WLUT[_b] = sum(1 for _t in _INT_THRESH.tolist() if _t < _lo)
    _WAMBIG[_b] = any(_lo <= _t <= _hi for _t in _INT_THRESH.tolist())
del _b, _lo, _hi


def _splitmix_z(h: np.ndarray, n_replicates: int) -> np.ndarray:
    """(n_rows, n_replicates) raw SplitMix64 outputs (uint64) from 60-bit
    row hashes — deterministic, partitioning-independent."""
    with np.errstate(over="ignore"):
        z = h.astype(np.uint64)[:, None] + (
            np.arange(1, n_replicates + 1, dtype=np.uint64)[None, :] * _SM_GOLDEN
        )
        z ^= z >> np.uint64(30)
        z *= _SM_M1
        z ^= z >> np.uint64(27)
        z *= _SM_M2
        z ^= z >> np.uint64(31)
    return z


def _splitmix_uniforms(h: np.ndarray, n_replicates: int) -> np.ndarray:
    """float64 uniforms in [0, 1) — the reference formulation the oracle
    SQL mirrors; kept for tests pinning LUT-vs-reference bit-equality."""
    return _splitmix_z(h, n_replicates).astype(np.float64) / _POW64


def _poisson1_weights_exact_ref(h: np.ndarray, n_replicates: int) -> np.ndarray:
    """Reference (slow) formulation: float64 uniform vs float CDF — used
    only by the equivalence tests."""
    u = _splitmix_uniforms(h, n_replicates)
    w = np.zeros(u.shape, dtype=np.float64)
    for c in _POISSON1_CDF:
        w += u > float(c)
    return w


def _poisson1_weights_exact(h: np.ndarray, n_replicates: int) -> np.ndarray:
    z = _splitmix_z(h, n_replicates)
    zb = (z >> np.uint64(56)).astype(np.uint8)
    w8 = _WLUT[zb]
    amb = _WAMBIG[zb]
    if amb.any():
        za = z[amb]
        wa = np.zeros(za.shape, dtype=np.uint8)
        for t in _INT_THRESH:
            wa += za > t
        w8[amb] = wa
    return w8.astype(np.float64)


def poisson_bootstrap_means(
    df: DataFrame,
    cols: Sequence[str],
    n_replicates: int = 1000,
    seed: int = 42,
    hash_key=None,
) -> DataFrame:
    """Per (column, replicate) weighted means. Downstream consumers compute
    CI stats over the replicate dimension (tiny: n_replicates rows/col).

    ``hash_key`` (a Column, e.g. the row's natural key): switch the weight
    draw to the EXACT counter-based path — ``stable_hash64`` of the key
    (salted with the seed) + SplitMix64 per replicate. Deterministic
    across partitionings and engines, so a SQL oracle replays the weights
    bit-for-bit (r10 verdict item 3). float64 end-to-end (the float32
    sgemm shortcut stays on the partition-seeded fast path only)."""
    exact = hash_key is not None
    # the weight-drawing pass is CPU-bound numpy (O(rows x replicates)
    # poisson draws); parquet split count (often just a few row groups)
    # would convoy it — spread over the full parallelism. On the exact
    # path the md5 row hash moves AFTER the exchange for the same reason:
    # computed pre-shuffle it runs at the parquet split count (3 tasks at
    # sf0.1 — measured 0.5 s serialized vs ~0.05 s spread over 32).
    target = df.sparkSession.sparkContext.defaultParallelism
    if exact:
        from urban_traffic_data_lake_project_spark.functions.core import stable_hash64

        keyed = df.select(hash_key.alias("__k"), *cols)
        if keyed.rdd.getNumPartitions() < target:
            keyed = keyed.repartition(target)
        proj = keyed.select(
            stable_hash64(F.col("__k"), salt=f"bs{seed}|").alias("__h"), *cols
        )
    else:
        proj = df.select(*cols)
        if proj.rdd.getNumPartitions() < target:
            proj = proj.repartition(target)

    def gen_exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc_wx = {c: np.zeros(n_replicates) for c in cols}
        acc_w = {c: np.zeros(n_replicates) for c in cols}
        for pdf in batches:
            X = pdf[list(cols)].to_numpy(dtype="float64")
            H = pdf["__h"].to_numpy(dtype="int64")
            # 0.5M cells -> the uint64 z matrix is ~4 MB: with 32
            # concurrent tasks the weight kernel is DRAM-bandwidth-bound
            # at the old 32 MB working set; cache-resident chunks cut the
            # intermediate passes' DRAM traffic (1.5x single-thread, more
            # under contention). The exact path is chunk-size-invariant —
            # weights are per-(row, replicate) counters, not stream draws.
            chunk = max(1, int(500_000 / max(n_replicates, 1)))
            for lo in range(0, X.shape[0], chunk):
                Xs = X[lo : lo + chunk]
                w = _poisson1_weights_exact(H[lo : lo + chunk], n_replicates)
                nan_mask = np.isnan(Xs)
                if nan_mask.any():
                    Xz = np.where(nan_mask, 0.0, Xs)
                    wx = w.T @ Xz
                    wn = w.T @ (~nan_mask).astype("float64")
                    for j, c in enumerate(cols):
                        acc_wx[c] += wx[:, j]
                        acc_w[c] += wn[:, j]
                else:
                    # no NULLs in the chunk (the common case): the
                    # denominator collapses to the replicate weight sums —
                    # identical to w.T @ ones, skipping a full second gemm
                    wx = w.T @ Xs
                    ws = w.sum(axis=0, dtype="float64")
                    for j, c in enumerate(cols):
                        acc_wx[c] += wx[:, j]
                        acc_w[c] += ws
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

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Seed deterministically per task partition.
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        rng = np.random.default_rng(seed * 100_003 + pid)
        acc_wx = {c: np.zeros(n_replicates) for c in cols}
        acc_w = {c: np.zeros(n_replicates) for c in cols}
        for pdf in batches:
            X = pdf[list(cols)].to_numpy(dtype="float32")
            # ONE weight matrix per chunk, SHARED by all columns (a joint
            # bootstrap: the same row resample evaluated on every column).
            # Per-column CIs are marginally identical to independent
            # resampling, and the draw count — the dominant cost — drops by
            # a factor of len(cols). Chunked to bound memory at ~16 MB.
            chunk = max(1, int(4_000_000 / max(n_replicates, 1)))
            for lo in range(0, X.shape[0], chunk):
                Xs = X[lo : lo + chunk]
                w = _poisson1_weights(rng, (Xs.shape[0], n_replicates))
                nan_mask = np.isnan(Xs)
                if nan_mask.any():
                    Xz = np.where(nan_mask, np.float32(0.0), Xs)
                    wx = w.T @ Xz                       # (reps, cols) sgemm
                    wn = w.T @ (~nan_mask).astype("float32")
                    for j, c in enumerate(cols):
                        acc_wx[c] += wx[:, j]
                        acc_w[c] += wn[:, j]
                else:
                    wx = w.T @ Xs
                    ws = w.sum(axis=0, dtype="float64")
                    for j, c in enumerate(cols):
                        acc_wx[c] += wx[:, j]
                        acc_w[c] += ws
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

    partials = proj.mapInPandas(gen_exact if exact else gen, schema=_partial_schema())
    return (
        partials.groupBy("column_name", "replicate")
        .agg((F.sum("wx") / F.sum("w")).alias("replicate_mean"))
    )


def grouped_bootstrap_ci(
    df: DataFrame,
    group_col: str,
    cols: Sequence[str],
    n_replicates: int = 1000,
    seed: int = 42,
    hash_key=None,
) -> DataFrame:
    """Per-GROUP bootstrap CIs (e.g. per-language corpus statistics):
    the same Poisson-bootstrap kernel, accumulated per group inside each
    Arrow batch, so one pass over the data serves every group — groups
    are NOT repartitioned into their own tasks (a giant group would
    convoy a per-group applyInPandas; here group size only affects the
    accumulation, not the parallelism).

    Returns one row per (group, column) with mean/std/CI bounds over the
    replicate means. Output volume is |groups| x |cols| x replicates tiny
    partials per partition — the replicate count is the only memory knob."""
    cols = list(cols)
    exact = hash_key is not None
    # md5 after the exchange — see poisson_bootstrap_means
    target = df.sparkSession.sparkContext.defaultParallelism
    if exact:
        from urban_traffic_data_lake_project_spark.functions.core import stable_hash64

        keyed = df.select(hash_key.alias("__k"), group_col, *cols)
        if keyed.rdd.getNumPartitions() < target:
            keyed = keyed.repartition(target)
        proj = keyed.select(
            stable_hash64(F.col("__k"), salt=f"bs{seed}|").alias("__h"), group_col, *cols
        )
    else:
        proj = df.select(group_col, *cols)
        if proj.rdd.getNumPartitions() < target:
            proj = proj.repartition(target)

    # carry the group key's NATIVE type through the partial schema — a
    # hardcoded string + str(g) would coerce int/date keys and make the
    # CI table mismatch the source on join-back (formatting drift)
    group_ddl = df.schema[group_col].dataType.simpleString()
    schema = f"{group_col} {group_ddl}, column_name string, replicate int, wx double, w double"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        rng = np.random.default_rng(seed * 100_003 + pid)
        acc_wx: dict = {}
        acc_w: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby(group_col, sort=False):
                if g not in acc_wx:
                    acc_wx[g] = {c: np.zeros(n_replicates) for c in cols}
                    acc_w[g] = {c: np.zeros(n_replicates) for c in cols}
                if exact:
                    X = sub[cols].to_numpy(dtype="float64")
                    H = sub["__h"].to_numpy(dtype="int64")
                else:
                    X = sub[cols].to_numpy(dtype="float32")
                # exact path: cache-resident chunks (see gen_exact above);
                # f32 path keeps the historical chunking — its partition-
                # seeded stream assignment depends on chunk boundaries
                cells = 500_000 if exact else 4_000_000
                chunk = max(1, int(cells / max(n_replicates, 1)))
                for lo in range(0, X.shape[0], chunk):
                    Xs = X[lo : lo + chunk]
                    if exact:
                        w = _poisson1_weights_exact(H[lo : lo + chunk], n_replicates)
                    else:
                        w = _poisson1_weights(rng, (Xs.shape[0], n_replicates))
                    nan_mask = np.isnan(Xs)
                    if nan_mask.any():
                        zero = 0.0 if exact else np.float32(0.0)
                        Xz = np.where(nan_mask, zero, Xs)
                        wx = w.T @ Xz
                        wn = w.T @ (~nan_mask).astype(w.dtype)
                        for j, c in enumerate(cols):
                            acc_wx[g][c] += wx[:, j]
                            acc_w[g][c] += wn[:, j]
                    else:
                        # NULL-free chunk: denominator == replicate weight
                        # sums (exact — small-integer weights), one gemm
                        wx = w.T @ Xs
                        ws = w.sum(axis=0, dtype="float64")
                        for j, c in enumerate(cols):
                            acc_wx[g][c] += wx[:, j]
                            acc_w[g][c] += ws
        out = []
        for g in acc_wx:
            for c in cols:
                out.append(
                    pd.DataFrame(
                        {
                            group_col: g,
                            "column_name": c,
                            "replicate": np.arange(n_replicates, dtype="int32"),
                            "wx": acc_wx[g][c],
                            "w": acc_w[g][c],
                        }
                    )
                )
        if out:
            yield pd.concat(out, ignore_index=True)

    partials = proj.mapInPandas(gen, schema=schema)
    means = partials.groupBy(group_col, "column_name", "replicate").agg(
        (F.sum("wx") / F.sum("w")).alias("replicate_mean")
    )
    return means.groupBy(group_col, "column_name").agg(
        F.round(F.avg("replicate_mean"), 4).alias("mean_estimate"),
        F.round(F.stddev_pop("replicate_mean"), 4).alias("std_estimate"),
        F.round(F.percentile("replicate_mean", 0.025), 4).alias("ci_lower_95"),
        F.round(F.percentile("replicate_mean", 0.975), 4).alias("ci_upper_95"),
        F.lit(n_replicates).alias("simulations"),
    )


def bootstrap_ci(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    n_replicates: int = 1000,
    max_columns: int = 8,
    min_values: int = 20,
    seed: int = 42,
    median_impute: bool = True,
    hash_key=None,
) -> DataFrame:
    """The reference's bootstrap table (monte_carlo.py:277-283): one row per
    column with mean_estimate, std_estimate (population std of replicate
    means), ci_lower_95, ci_upper_95, simulations."""
    if cols is None:
        from pyspark.sql.types import NumericType

        cols = [f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)]
    cols = list(cols)[:max_columns]
    # one cheap codegen pass for counts + null counts; exact medians (a
    # buffering aggregate on high-cardinality doubles) are computed ONLY
    # for columns that actually contain NULLs — usually none
    counts = df.agg(
        *[F.count(c).alias(c) for c in cols],
        *[F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{i}") for i, c in enumerate(cols)],
    ).first()
    if median_impute:
        with_nulls = [c for i, c in enumerate(cols) if counts[f"__nulls_{i}"] > 0]
        if with_nulls:
            df = df.na.fill(compute_medians(df, with_nulls))
    cols = [c for c in cols if (counts[c] or 0) > min_values]
    if not cols:
        raise ValueError("no eligible columns for bootstrap")
    means = poisson_bootstrap_means(df, cols, n_replicates, seed, hash_key=hash_key)
    return means.groupBy("column_name").agg(
        F.round(F.avg("replicate_mean"), 4).alias("mean_estimate"),
        F.round(F.stddev_pop("replicate_mean"), 4).alias("std_estimate"),
        F.round(F.percentile("replicate_mean", 0.025), 4).alias("ci_lower_95"),
        F.round(F.percentile("replicate_mean", 0.975), 4).alias("ci_upper_95"),
        F.lit(n_replicates).alias("simulations"),
    )
