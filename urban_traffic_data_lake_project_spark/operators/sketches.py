"""Mergeable distinct-count sketches (HyperLogLog) built on the
md5-derived ``stable_hash64`` — so unlike ``approx_count_distinct`` (whose
HLL++ registers are engine-internal), the ENTIRE sketch, including every
register value and the final estimate, has a bit-identical ANSI-SQL
formulation and is oracle-checkable.

Why a hand-rolled HLL when Spark has ``approx_count_distinct``: the point
of a sketch at 100 TB is *mergeability* — per-partition/per-day register
tables that union and re-max without touching raw data. Exposing the
register table as a first-class DataFrame makes that composition explicit
(``hll_register_table`` once per ingest batch; ``hll_merge`` + ``hll_estimate``
at query time over any subset), which approx_count_distinct's opaque binary
buffer cannot do across jobs.

Shape: h = stable_hash64(value) is 60 bits. The low ``p`` bits pick one of
m = 2^p registers; rho = position of the highest set bit of the remaining
(60-p) bits, counted from the top (1..61-p). Standard HLL estimator
(Flajolet et al. 2007) with the linear-counting small-range correction.

Scale: one shuffle of at most |groups| * m rows (partial max map-side),
then a tiny per-group fold. No memory proportional to cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from urban_traffic_data_lake_project_spark.functions import stable_hash64

_HASH_BITS = 60  # stable_hash64 = first 15 hex digits of md5


def _rho(w: Column, width: int) -> Column:
    """1-based position of the first 1-bit of ``w`` within ``width`` bits,
    scanning from the most significant end; width+1 when w == 0.

    Bit length via ``length(bin(w))`` — exact integer arithmetic (no
    floating log2, whose rounding at powers of two differs per engine)."""
    return F.when(w == 0, F.lit(width + 1)).otherwise(
        F.lit(width + 1) - F.length(F.bin(w))
    )


def hll_register_table(
    df: DataFrame, group_cols: Sequence[str], value_col: str, p: int = 8
) -> DataFrame:
    """(group..., register, max_rho) — the mergeable sketch state.

    Partial ``max`` happens map-side, so the shuffle carries at most
    |groups| * 2^p rows no matter how many input rows there are."""
    m = 1 << p
    h = stable_hash64(F.col(value_col).cast("string"))
    w = F.shiftright(h, p)
    return (
        df.select(
            *group_cols,
            h.bitwiseAND(F.lit(m - 1)).alias("register"),
            _rho(w, _HASH_BITS - p).alias("__rho"),
        )
        .groupBy(*group_cols, "register")
        .agg(F.max("__rho").alias("max_rho"))
    )


def hll_merge(registers: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Union-merge of register tables (same p): re-max per register. This
    is what makes the sketch incremental — per-batch register tables merge
    without rescanning data."""
    return registers.groupBy(*group_cols, "register").agg(
        F.max("max_rho").alias("max_rho")
    )


def hll_estimate(
    registers: DataFrame, group_cols: Sequence[str], p: int = 8
) -> DataFrame:
    """(group..., n_hll): the bias-corrected HLL estimate per group.

    raw = alpha_m * m^2 / sum_j 2^-M_j, where absent registers contribute
    2^0; if raw <= 2.5m and any register is empty, switch to linear
    counting m * ln(m / zeros)."""
    m = 1 << p
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    folded = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("__s"),
        F.count(F.lit(1)).alias("__present"),
    )
    zeros = F.lit(m) - F.col("__present")
    raw = alpha * m * m / (F.col("__s") + zeros.cast("double"))
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return folded.select(*group_cols, est.alias("n_hll"))


def hll_distinct(
    df: DataFrame, group_cols: Sequence[str], value_col: str, p: int = 8
) -> DataFrame:
    """End-to-end grouped approximate distinct count: register table ->
    estimate. One pass over the data."""
    return hll_estimate(hll_register_table(df, group_cols, value_col, p), group_cols, p)


def hll_rollup(
    df: DataFrame,
    fine_cols: Sequence[str],
    coarse_cols: Sequence[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """The incremental-rollup pattern end to end: build per-``fine_cols``
    register tables (e.g. per group per day — the granularity a daily
    ingest job would persist), then MERGE them up to ``coarse_cols`` and
    estimate. Because merge is a register-wise max, the result is exactly
    the sketch built directly at the coarse level — no accuracy is lost by
    sketching fine and rolling up, which is what makes per-batch sketch
    tables a substitute for rescanning history."""
    fine = hll_register_table(df, fine_cols, value_col, p)
    return hll_estimate(hll_merge(fine, coarse_cols), coarse_cols, p)


def _cm_bucket(value: Column, j: int, width: int, depth: int) -> Column:
    """Bucket of hash row ``j`` for a value. For depth <= 4 all rows
    derive from ONE md5 per value — non-overlapping 8-hex (32-bit)
    chunks of the digest are independent enough for CM's pairwise-
    independence requirement, and computing one digest instead of
    ``depth`` salted ones is the dominant cost in token-stream screening
    (measured 0.94 s -> 0.61 s per pass over 270k tokens at sf0.1).
    Deeper sketches fall back to one salted md5 per row. Both forms are
    expressible verbatim in ANSI SQL for the oracle."""
    if depth <= 4:
        h = F.conv(F.substring(F.md5(value), 1 + 8 * j, 8), 16, 10).cast("bigint")
    else:
        h = stable_hash64(value, salt=f"cm{j}|")
    return F.pmod(h, F.lit(width))


def cm_sketch_table(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch of a value column: ``depth`` hash rows x
    ``width`` buckets, cell = number of occurrences hashing there.
    Returns (row, bucket, n) — the mergeable state (cells ADD under
    union, see ``cm_merge``).

    Scale: one explode to ``depth`` (row, bucket) pairs per input row,
    then a grouped count with map-side partials — the shuffle carries at
    most depth x width cells regardless of input size."""
    val = F.col(value_col).cast("string")
    entries = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                _cm_bucket(val, j, width, depth).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(entries).alias("__e"))
        .select(F.col("__e.row").alias("row"), F.col("__e.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cm_merge(sketches: DataFrame) -> DataFrame:
    """Union-merge of count-min tables (same depth/width): cells add."""
    return sketches.groupBy("row", "bucket").agg(F.sum("n").alias("n"))


def cm_estimate(
    sketch: DataFrame, queries: DataFrame, value_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Estimated occurrence count for each query value: min over the
    ``depth`` rows of the cell the value hashes to (never underestimates;
    overestimates by collision mass ~ N/width per row).

    The sketch is depth x width cells — broadcast; the probe is a
    map-side join against it."""
    val = F.col(value_col).cast("string")
    probes = queries.select(
        F.col(value_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _cm_bucket(val, j, width, depth).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("__e"),
    ).select(value_col, F.col("__e.row").alias("row"), F.col("__e.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("n_cm"))
    )


_BLOOM_WORD_BITS = 32  # bits packed per 64-bit word: staying below bit 32
                       # keeps every mask positive, so shift/AND semantics
                       # are unambiguous across engines (no sign-bit cases)


def _bloom_entries(value_col: str, m_bits: int, k: int) -> Column:
    """array<struct<word, mask>> of the k bit positions for one value.
    mask = 2^bit via pow (exact for bit < 32; the Python shiftleft API
    only accepts literal shift amounts)."""
    def entry(j: int) -> Column:
        pos = F.pmod(
            stable_hash64(F.col(value_col).cast("string"), salt=f"bl{j}|"),
            F.lit(m_bits),
        )
        return F.struct(
            F.shiftright(pos, 5).alias("word"),
            F.pow(F.lit(2.0), pos.bitwiseAND(F.lit(_BLOOM_WORD_BITS - 1)))
            .cast("bigint")
            .alias("mask"),
        )

    return F.array(*[entry(j) for j in range(k)])


def bloom_build(
    df: DataFrame, value_col: str, m_bits: int = 1024, k: int = 4
) -> DataFrame:
    """Bloom filter over a value column as a (word, word_bits) table:
    ``k`` salted hashes set ``k`` of ``m_bits`` bits; bits are OR-folded
    into m_bits/32 words. The third mergeable-sketch family next to HLL
    (cardinality) and count-min (frequency): set MEMBERSHIP with no false
    negatives. Merge = union the tables and re-``bit_or``.

    Scale: explode to k rows per input, map-side partial bit_or, shuffle
    at most m_bits/32 rows. The finished filter is a few KB — broadcast
    it to screen a corpus without joining the underlying set."""
    return (
        df.select(F.explode(_bloom_entries(value_col, m_bits, k)).alias("__e"))
        .select(F.col("__e.word").alias("word"), F.col("__e.mask").alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("word_bits"))
    )


def bloom_probe(
    df: DataFrame, id_col: str, value_col: str, bloom: DataFrame,
    m_bits: int = 1024, k: int = 4,
) -> DataFrame:
    """(id, maybe_member): True iff all k bits for the value are set in
    the filter — guaranteed True for every value that was inserted (no
    false negatives); False is definitive. A NULL value was never
    inserted (the builder's hash of NULL produces no entries), so its
    membership is a concrete False, not NULL — a NULL here would
    silently drop those rows through BOTH directions of a downstream
    ``filter(maybe_member)`` / ``filter(~maybe_member)``. The filter
    joins broadcast; the probe side is one explode + a per-id bool_and
    re-aggregation."""
    probes = df.select(
        F.col(id_col), F.explode(_bloom_entries(value_col, m_bits, k)).alias("__e")
    ).select(id_col, F.col("__e.word").alias("word"), F.col("__e.mask").alias("mask"))
    hit = (
        F.coalesce("word_bits", F.lit(0)).bitwiseAND(F.col("mask")) == F.col("mask")
    )
    return (
        probes.join(F.broadcast(bloom), "word", "left")
        .select(F.col(id_col), hit.alias("__hit"))
        .groupBy(id_col)
        .agg(F.coalesce(F.bool_and("__hit"), F.lit(False)).alias("maybe_member"))
    )


def hll_sql(
    table_expr: str, group_cols: Sequence[str], value_expr: str, p: int = 8
) -> str:
    """The bit-identical DuckDB formulation of ``hll_distinct`` (shared by
    oracle SQL and tests). ``value_expr`` must already be VARCHAR."""
    m = 1 << p
    width = _HASH_BITS - p
    g = ", ".join(group_cols)
    h = f"(('0x' || substr(md5({value_expr}), 1, 15))::UBIGINT)::BIGINT"
    return f"""
regs AS (
  SELECT {g}, h & {m - 1} AS register,
         max(CASE WHEN (h >> {p}) = 0 THEN {width + 1}
                  ELSE {width + 1} - length(bin(h >> {p})) END) AS max_rho
  FROM (SELECT {g}, {h} AS h FROM {table_expr})
  GROUP BY {g}, register),
folded AS (
  SELECT {g}, sum(pow(2.0, -max_rho)) AS s, count(*) AS present
  FROM regs GROUP BY {g}),
hll AS (
  SELECT {g},
         CASE WHEN (0.7213 / (1.0 + 1.079 / {float(m)})) * {m} * {m}
                   / (s + ({m} - present)::DOUBLE) <= 2.5 * {m}
                   AND ({m} - present) > 0
              THEN {float(m)} * ln({float(m)} / ({m} - present)::DOUBLE)
              ELSE (0.7213 / (1.0 + 1.079 / {float(m)})) * {m} * {m}
                   / (s + ({m} - present)::DOUBLE)
         END AS n_hll
  FROM folded)
"""


# ---------------------------------------------------------------------------
# Mergeable quantile sketch: fixed-bin histograms. The fourth member of
# the sketch family (HLL = distinct, count-min = frequency, Bloom =
# membership, this = quantiles): with bin edges FIXED up front (unlike
# operators.stats.histogram, whose edges are data-dependent), per-group /
# per-batch sketches merge EXACTLY by adding counts — the pre-aggregation
# shape that answers quantile queries over any group subset at 100 TB
# without touching raw data. Estimation interpolates linearly inside the
# covering bin (equi-width analogue of t-digest interpolation), so
# accuracy is bounded by the bin width.
# ---------------------------------------------------------------------------
def hist_sketch_table(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """(group..., bin, n) — mergeable fixed-edge histogram state. Values
    are clamped into [lo, hi] (the sketch contract: pick bounds from
    domain knowledge; out-of-range mass lands in the edge bins, which
    still bounds quantile error to one bin width at the extremes). One
    shuffle of at most |groups| * bins rows after map-side partials."""
    v = F.col(value_col).cast("double")
    idx = F.least(
        F.greatest(F.floor(((v - lo) * float(bins)) / (hi - lo)), F.lit(0)),
        F.lit(bins - 1),
    ).cast("int")
    return (
        df.filter(v.isNotNull())
        .select(*group_cols, idx.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def hist_merge(sketches: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Merge sketches up an aggregation level: counts ADD (exact, not
    approximate — mergeability is lossless for fixed-edge histograms)."""
    return sketches.groupBy(*group_cols, "bin").agg(F.sum("n").alias("n"))


def hist_quantiles(
    sketch: DataFrame,
    group_cols: Sequence[str],
    qs: Sequence[float],
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """Quantile estimates from a histogram sketch: cumulative counts via a
    per-group window over the (at most ``bins``-row) sketch, then linear
    interpolation inside the first bin whose cumulative count reaches
    q * total. Emits one column per requested quantile (``q50`` for 0.5).

    The window runs over sketch rows, never data rows — at any corpus
    size this stage touches |groups| * bins rows."""
    from pyspark.sql import Window

    width = (hi - lo) / float(bins)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy(*group_cols)
    cum = sketch.select(
        *group_cols,
        "bin",
        "n",
        F.sum("n").over(w).alias("__cum"),
        F.sum("n").over(tot).alias("__tot"),
    )
    aggs = []
    for q in qs:
        target = F.col("__tot") * float(q)
        # the UNIQUE covering bin: cum - n < target <= cum (later
        # qualifying bins would interpolate with a negative offset, so
        # gating on >= alone and taking min() picks wrong values)
        covering = (F.col("__cum") >= target) & ((F.col("__cum") - F.col("n")) < target)
        est = F.when(
            covering,
            lo
            + (
                F.col("bin")
                + (target - (F.col("__cum") - F.col("n"))) / F.col("n")
            )
            * width,
        )
        aggs.append(F.min(est).alias(f"q{int(round(q * 100))}"))
    return cum.groupBy(*group_cols).agg(*aggs)


# ---------------------------------------------------------------------------
# KMV / theta sketch: the k smallest distinct hash values of a set. The
# fifth member of the sketch family, and the one HLL cannot replace: KMV
# sketches support SET OPERATIONS — union, intersection, and difference
# estimates between sketches built independently (per-day, per-source,
# per-split), which is how a curation pipeline answers "how many documents
# do these two crawls share?" without ever co-scanning them. (HLL unions
# by register max but has no intersection; inclusion-exclusion on HLL
# estimates compounds error.)
#
# Built on stable_hash64 like the other sketches, so every retained hash,
# theta, and estimate has a bit-identical ANSI-SQL formulation (ORDER BY
# hash LIMIT k per group) and the approximation itself is oracle-checked.
#
# Scale: the global k-minimum set per group is a subset of the union of
# per-partition k-minimum sets, so a partition-local Arrow prune caps the
# shuffle at partitions * groups * k rows regardless of input cardinality
# (the same lossless two-phase shape as similarity._partition_local_topk);
# the Python path sees only (group, bigint-hash) columns, never values.
# ---------------------------------------------------------------------------
_KMV_POW = float(1 << _HASH_BITS)  # hash values are uniform in [0, 2^60)


def _partition_local_kmins(
    proj: DataFrame, group_cols: Sequence[str], k: int
) -> DataFrame:
    """Within each partition keep only the k smallest DISTINCT hashes per
    group — lossless for the global per-group k-min set. Batches stream
    through with O(groups * k) partition memory."""
    import pandas as pd

    gc = list(group_cols)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        # NULL values hash to NULL and are not distinct elements (KMV
        # estimates COUNT(DISTINCT v), which ignores NULLs) — drop them
        # BEFORE ranking, where pandas would sort them first but SQL
        # engines sort them last. Callers filter h IS NOT NULL upstream
        # (kmv_sketch_table does), so this is a cheap no-copy check in
        # the common path. NULL GROUP KEYS are real groups (dropna=False
        # matches Spark/SQL groupBy semantics).
        if pdf["h"].isna().any():
            pdf = pdf[pdf["h"].notna()]
        pdf = pdf.drop_duplicates(subset=[*gc, "h"]).sort_values(
            [*gc, "h"], kind="mergesort"
        )
        return pdf.groupby(gc, sort=False, dropna=False).head(k) if gc else pdf.head(k)

    def per_partition(batches):
        best: pd.DataFrame | None = None
        for pdf in batches:
            cur = prune(pdf)
            best = cur if best is None else prune(pd.concat([best, cur]))
        if best is not None:
            yield best

    return proj.mapInPandas(per_partition, proj.schema)


def kmv_sketch_table(
    df: DataFrame, group_cols: Sequence[str], value_col: str, k: int = 256
) -> DataFrame:
    """(group..., h) — the k smallest distinct ``stable_hash64`` values of
    ``value_col`` per group. This IS the mergeable sketch state: persist it
    per batch/day, then ``kmv_merge`` / ``kmv_estimate`` /
    ``kmv_set_estimates`` over any subset without touching raw data."""
    from pyspark.sql import Window

    # NULL values are not distinct elements (KMV estimates
    # COUNT(DISTINCT v)); filter BEFORE the Arrow boundary — a batch
    # containing NaN would force the 60-bit hash column to float64 in
    # pandas, rounding away bits above 2^53
    proj = df.select(
        *group_cols, stable_hash64(F.col(value_col).cast("string")).alias("h")
    ).where(F.col("h").isNotNull())
    pruned = _partition_local_kmins(proj, group_cols, k)
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        pruned.distinct()
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def kmv_merge(
    sketches: DataFrame, group_cols: Sequence[str], k: int = 256
) -> DataFrame:
    """Union-merge sketch tables (same k): distinct hashes, re-take the k
    smallest per group. Exactly the sketch of the unioned inputs — no
    accuracy lost by sketching fine and merging up (tested)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        sketches.distinct()
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def kmv_estimate(
    sketch: DataFrame, group_cols: Sequence[str], k: int = 256
) -> DataFrame:
    """(group..., n_kmv): distinct-count estimate per group. With fewer
    than k hashes retained the sketch holds the ENTIRE distinct hash set
    and the count is exact; otherwise the classic unbiased KMV estimator
    (k-1) / theta, theta = kth smallest hash / 2^60 (Bar-Yossef et al.
    2002; Beyer et al. 2007)."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"), F.max("h").alias("__kth")
    )
    est = F.when(F.col("__n") < k, F.col("__n").cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.col("__kth") / F.lit(_KMV_POW))
    )
    return agg.select(*group_cols, est.alias("n_kmv"))


def kmv_set_estimates(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Theta-sketch set algebra over two ungrouped sketch tables (column
    ``h``): one row with distinct-count estimates for A∪B, A∩B, and A\\B.

    theta = min of the two per-sketch thetas (1.0 when a side retained
    fewer than k hashes, i.e. is exact); each side's retained set is cut
    back to hashes strictly below theta, making the two samples drawn at
    the SAME inclusion probability — then |S| / theta estimates each
    region's cardinality (Dasgupta et al., the Theta-Sketch Framework).
    Every stage is a DataFrame op over <= 2k rows; nothing collects."""
    na_ma = a.agg(F.count(F.lit(1)).alias("__na"), F.max("h").alias("__ma"))
    nb_mb = b.agg(F.count(F.lit(1)).alias("__nb"), F.max("h").alias("__mb"))
    theta = (
        na_ma.crossJoin(nb_mb)
        .select(
            F.least(
                F.when(F.col("__na") < k, F.lit(1.0)).otherwise(
                    F.col("__ma") / F.lit(_KMV_POW)
                ),
                F.when(F.col("__nb") < k, F.lit(1.0)).otherwise(
                    F.col("__mb") / F.lit(_KMV_POW)
                ),
            ).alias("theta")
        )
    )
    tagged = a.select("h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")).unionAll(
        b.select("h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    )
    merged = tagged.groupBy("h").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    below = merged.crossJoin(F.broadcast(theta)).where(
        F.col("h") / F.lit(_KMV_POW) < F.col("theta")
    )
    return below.groupBy("theta").agg(
        (F.count(F.lit(1)) / F.col("theta")).alias("union_kmv"),
        (F.sum(F.col("in_a") * F.col("in_b")) / F.col("theta")).alias("inter_kmv"),
        (F.sum(F.col("in_a") * (1 - F.col("in_b"))) / F.col("theta")).alias(
            "aonly_kmv"
        ),
    ).drop("theta")


def cm_heavy_hitters(
    df: DataFrame,
    value_col: str,
    min_frac: float,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Every value whose true occurrence count is >= ``min_frac`` of all
    rows — found WITHOUT a full-cardinality groupBy. The 100 TB problem
    with exact heavy hitters is that ``groupBy(value).count()`` shuffles
    one row per DISTINCT value; this screens first:

    1. build the count-min sketch (depth x width cells — tiny, bounded by
       construction) and inline it into the screening plan as ``depth``
       literal arrays (the PQ/IVF literal-unrolling trick): est = min
       over rows of ``element_at(cells_row_j, hash_bucket + 1)``, pure
       whole-stage codegen with NO join. CM never underestimates, so the
       surviving set is a SUPERSET of the true heavy hitters — no false
       negatives, only collision-mass false positives;
    2. exact-count ONLY the surviving occurrences (the shuffle now
       carries heavy values + a bounded false-positive tail) and apply
       the threshold to the exact counts.

    Returns (value, n_cm, n_exact), truth-filtered. The total-row count
    rides the plan as a broadcast one-row aggregate — no eager count;
    the sketch itself is materialized eagerly (depth*width longs — the
    two-pass fit pattern, constant-size at any data scale). Literal
    inlining sizes the plan at depth*width*8 bytes, fine for the default
    4x1024; a deployment screening with width >> 64k should switch back
    to a broadcast-join screen."""
    # The input value stream is consumed by THREE passes (sketch build
    # collect below, the total count, the screen scan). Below the byte
    # threshold it is re-derived per pass — measured cheaper than
    # memory-store churn at bench scale (r12) — above it one
    # MEMORY_AND_DISK materialization replaces two corpus-scale re-scans
    # (scale-conditional persist, r12 verdict item 7; the cached plan is
    # reclaimed by the ContextCleaner once the caller drops the frame).
    from urban_traffic_data_lake_project_spark.sources.tables import (
        persist_for_reuse_if_large,
    )

    df = persist_for_reuse_if_large(df)
    total = df.agg(F.count(F.lit(1)).alias("__tot"))
    # One eager sketch build shared by all depth screens (the collect is
    # bounded by construction).
    cm_rows = cm_sketch_table(df, value_col, depth, width).collect()
    cells = [[0] * width for _ in range(depth)]
    for r in cm_rows:
        cells[r["row"]][r["bucket"]] = r["n"]
    out = df.select(value_col).crossJoin(F.broadcast(total))
    val = F.col(value_col).cast("string")
    ests = []
    for j in range(depth):
        bucket_j = _cm_bucket(val, j, width, depth)
        # one F.expr per row: a single py4j call carrying the whole array
        # as SQL text. F.lit(<python list>) converts element-by-element
        # over py4j — measured ~1.7 s of plan-build time per invocation
        # at 4x1024 cells.
        arr = F.expr(f"array({','.join(str(int(n)) for n in cells[j])})")
        ests.append(F.element_at(arr, (bucket_j + 1).cast("int")))
    screened = out.withColumn("__n_cm", F.least(*ests)).where(
        F.col("__n_cm") >= F.col("__tot") * F.lit(min_frac)
    )
    return (
        screened.groupBy(value_col)
        .agg(
            F.min("__n_cm").alias("n_cm"),
            F.count(F.lit(1)).alias("n_exact"),
            F.min("__tot").alias("__tot"),
        )
        .where(F.col("n_exact") >= F.col("__tot") * F.lit(min_frac))
        .drop("__tot")
    )
