"""Training-data curation operators: sampling, splitting, sharding.

Absent from the reference (whose pipeline is single-node pandas); these are
the corpus-preparation steps a 100 TB training-data pipeline runs after
dedup/quality filtering. Everything is DETERMINISTIC through the md5-derived
``stable_hash64`` — a seeded draw any engine reproduces bit-identically, so
each operator is oracle-checkable and re-runs produce identical corpora
(the property that actually matters for dataset reproducibility).

Scale notes:
- ``stratified_sample`` shuffles once on the strata key; the per-stratum
  ``row_number`` is bounded by stratum size (use it for per-class quotas,
  not for "sample 1% of everything" — that is ``df.sample``).
- ``train_eval_split`` is a pure projection (no shuffle, no RNG state):
  membership is a hash-range test, so the split is stable under re-runs,
  insertions, and repartitioning.
- ``pack_shards`` deliberately does NOT do a greedy global cumulative sum
  (a single-reducer global-order window): shard id is hash mod n_shards
  with n_shards sized from one total-tokens aggregate. Per-shard token
  totals concentrate tightly around budget by the law of large numbers at
  corpus scale — the standard trade for a shuffle-free, deterministic
  sharding.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from urban_traffic_data_lake_project_spark.functions import stable_hash64


def _seeded_hash(id_col: str, seed: int):
    return stable_hash64(
        F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string"))
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    id_col: str,
    n_per_stratum: int,
    seed: int = 42,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller): the rows with the smallest seeded hash — a uniform draw
    without replacement, deterministic across engines and runs."""
    h = _seeded_hash(id_col, seed)
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def train_eval_split(
    df: DataFrame, id_col: str, eval_per_mille: int = 10, seed: int = 42
) -> DataFrame:
    """Adds ``split`` ('train' | 'eval'): eval_per_mille/1000 of rows land
    in eval by hash range. A pure projection — membership of a given id
    never changes as the corpus grows, which is what keeps eval sets
    uncontaminated across dataset versions."""
    bucket = F.pmod(_seeded_hash(id_col, seed), F.lit(1000))
    return df.withColumn(
        "split", F.when(bucket < eval_per_mille, "eval").otherwise("train")
    )


def pack_shards(
    df: DataFrame,
    id_col: str,
    token_col: str,
    shard_token_budget: int,
    seed: int = 42,
) -> DataFrame:
    """Adds ``shard_id`` in [0, n_shards): n_shards = ceil(total_tokens /
    budget) from ONE aggregate, assignment = hash mod n_shards. See module
    docstring for why this beats a greedy cumulative-sum packing at scale."""
    total = df.agg(F.sum(token_col).alias("t")).first()["t"] or 0
    n_shards = max(1, -(-int(total) // int(shard_token_budget)))
    return df.withColumn(
        "shard_id", F.pmod(_seeded_hash(id_col, seed), F.lit(n_shards))
    )


def pack_sequences(
    df: DataFrame,
    shard_col: str,
    token_col: str,
    order_cols: Sequence[str],
    seq_token_budget: int,
) -> DataFrame:
    """Pack rows (typically document chunks) into fixed token-budget
    training sequences WITHIN each shard: rows are laid out in the
    deterministic ``order_cols`` order, and ``seq_id`` = which budget-sized
    bin the row's exclusive prefix-sum of tokens lands in. ``seq_pos`` is
    the row's position within its shard's layout.

    This is boundary-fill packing (a row whose tokens straddle a boundary
    starts the next bin's overflow, the standard streaming-packer trade) —
    NOT bin-packing, which is inherently sequential and cannot scale.

    Scale shape: ONE window partitioned by the shard id. Shards are
    token-budget-bounded by construction (``pack_shards``), so every
    window partition is small and uniform — the per-shard sort is the
    in-partition sort a training-data writer needs anyway, never a global
    single-reducer sort."""
    w = Window.partitionBy(shard_col).orderBy(*[F.col(c).asc() for c in order_cols])
    # explicit ROWS frame: same window spec as row_number, so both
    # expressions land in ONE Window node over one exchange (a RANGE-framed
    # sum would force a second Window + shuffle for the same partitioning)
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prefix_excl = F.sum(token_col).over(wr) - F.col(token_col)
    return df.select(
        "*",
        F.floor(prefix_excl / seq_token_budget).alias("seq_id"),
        F.row_number().over(w).alias("seq_pos"),
    )


def weighted_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows per group, where a
    row's selection probability is proportional to ``weight_col`` (e.g.
    quality-weighted corpus subsampling) — the Efraimidis–Spirakis A-ES
    scheme with exponential keys: key = -ln(u)/w for a per-row uniform u,
    keep the k smallest keys per group.

    u comes from the seeded id hash, not an RNG — the same row always
    draws the same u, so the sample is reproducible cross-engine and
    stable under re-runs and repartitioning. Rows with weight <= 0 are
    never selected.

    Scale shape: one window partitioned by the group (bounded by k after
    the rank filter); no global sort, no driver state."""
    two53 = 1 << 53
    u = (F.pmod(_seeded_hash(id_col, seed), F.lit(two53)) + 1) / F.lit(float(two53))
    key = -F.log(u) / F.col(weight_col)
    w = Window.partitionBy(*group_cols).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def resample_to_mix(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    resolution: int = 1_000_000,
) -> DataFrame:
    """Downsample each group so the surviving corpus matches the target
    mix ``weights`` (e.g. language/domain proportions), keeping as many
    rows as possible: the binding group (smallest count/weight ratio) is
    kept whole and every other group is thinned to match.

    Deterministic: a row survives iff hash(id) mod resolution falls under
    its group's acceptance threshold — re-runs, insertions elsewhere, and
    repartitioning never flip a kept row, and the identical rule is
    expressible in ANSI SQL (oracle-checkable).

    Scale shape: one tiny count aggregate per group, cross-joined as a
    broadcast threshold table; the corpus itself is filtered map-side —
    no shuffle of the data. Groups absent from ``weights`` are dropped."""
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in (kv[0], float(kv[1]))]
    )
    counts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__w", wmap[F.col(group_col)])
        .filter(F.col("__w").isNotNull())
    )
    scale = counts.agg(F.min(F.col("__n") / F.col("__w")).alias("__scale"))
    thresholds = counts.crossJoin(F.broadcast(scale)).select(
        group_col,
        F.least(
            F.lit(resolution).cast("bigint"),
            F.floor(F.lit(resolution) * F.col("__scale") * F.col("__w") / F.col("__n")),
        ).alias("__thr"),
    )
    return (
        df.join(F.broadcast(thresholds), group_col)
        .filter(F.pmod(_seeded_hash(id_col, seed), F.lit(resolution)) < F.col("__thr"))
        .drop("__thr")
    )


def temperature_resample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    temperature: float = 3.0,
    seed: int = 42,
    resolution: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled group rebalancing — the multilingual-mixture
    knob (mT5 / XLM-R, public): target proportions follow n_g^(1/T), so
    T=1 keeps the natural distribution and T->inf approaches uniform,
    lifting low-resource groups without fully flattening the mix.

    Same deterministic hash-threshold survival rule as
    ``resample_to_mix`` (a row survives iff hash(id) mod resolution
    falls under its group's acceptance threshold — re-runs, insertions
    elsewhere, and repartitioning never flip a kept row). The target
    normalization is deliberately FOLDED OUT: threshold_g = floor(
    resolution * min_h(n_h / n_h^(1/T)) * n_g^(1/T) / n_g) — the
    sum-over-groups normalizer cancels algebraically, and never
    computing it avoids a cross-engine float-summation-order hazard
    (Spark's aggregate sum order is nondeterministic; DuckDB's is not).
    min() is order-independent and division is IEEE-correctly rounded on
    both engines, but ``pow(double, double)`` is NOT guaranteed
    identically rounded between JVM ``Math.pow`` and C ``std::pow``
    (ADVICE r7): a 1-ulp drift in n^(1/T) could flip ``floor`` at an
    integer boundary. The acceptance RATIO (scale*p/n, always in [0,1],
    ulp ~2e-16) is therefore rounded to 9 decimals on both engines
    before the floor — a 5e-10 margin that collapses any few-ulp pow
    drift while leaving thresholds unchanged away from boundaries.

    Scale shape: one tiny count aggregate, one 1-row min attach
    (broadcast), then a map-side filter — the corpus never shuffles."""
    counts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__p", F.pow(F.col("__n"), F.lit(1.0 / float(temperature))))
    )
    scale = counts.agg(F.min(F.col("__n") / F.col("__p")).alias("__scale"))
    thresholds = counts.crossJoin(F.broadcast(scale)).select(
        group_col,
        F.least(
            F.lit(resolution).cast("bigint"),
            F.floor(
                F.lit(resolution)
                * F.round(F.col("__scale") * F.col("__p") / F.col("__n"), 9)
            ),
        ).alias("__thr"),
    )
    return (
        df.join(F.broadcast(thresholds), group_col)
        .filter(F.pmod(_seeded_hash(id_col, seed), F.lit(resolution)) < F.col("__thr"))
        .drop("__thr")
    )


def cluster_balanced_sample(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    cap: int = 40,
    seed: int = 42,
) -> DataFrame:
    """Diversity sampling over the embedding space (the SemDeDup-family
    shape): train spherical-k-means centroids, assign every vector to its
    max-cosine cluster, then keep at most ``cap`` rows per cluster — a
    uniform seeded draw within each cluster. Over-represented regions of
    the space are down-weighted; small clusters survive whole.

    Scale shape: centroid training collects only k*dim doubles per round
    (``kmeans_centroids``); assignment is a per-row expression against the
    literal centroid array — ZERO shuffle of the corpus; the per-cluster
    cap windows over (id, cluster_id) rows only — vectors are projected
    away before the exchange. Emits (id, cluster_id, n_cluster)."""
    from urban_traffic_data_lake_project_spark.operators.similarity import (
        _as_double,
        _norm,
        kmeans_centroids,
        with_nearest_centroids,
    )

    entries = kmeans_centroids(corpus, id_col, vec_col, k=k, iters=iters)
    # materialize the double vector as a column FIRST: the unrolled dots
    # reference it element-wise many times, and referencing the raw cast
    # transform would inline one copy per term (no CSE across expressions)
    base = corpus.select(
        id_col, _as_double(F.col(vec_col)).alias("__v")
    ).withColumn("__n", _norm(F.col("__v")))
    assigned = with_nearest_centroids(base, "__v", "__n", entries, 1, "__cids").select(
        id_col,
        F.element_at("__cids", 1).alias("cluster_id"),
    )
    h = _seeded_hash(id_col, seed)
    w = Window.partitionBy("cluster_id").orderBy(h.asc(), F.col(id_col).asc())
    return (
        assigned.withColumn("n_cluster", F.count(F.lit(1)).over(Window.partitionBy("cluster_id")))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def dsir_importance_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: F.Column,
    n_buckets: int = 256,
    alpha: float = 1.0,
    n_keep: int = 200,
    seed: int = 7,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    public): pick raw-pool documents that LOOK like a target domain by
    importance weights under hashed-n-gram bag-of-words models.

    - Features: unigrams + word bigrams of the normalized text, hashed to
      ``n_buckets`` buckets with the md5-derived ``stable_hash64`` (the
      same ANSI-SQL-expressible hash every sketch here uses).
    - Fit: ONE corpus pass — explode grams, one grouped count with a
      target-filtered conditional count riding along (map-side partials;
      the exchange carries at most ``n_buckets`` rows per task). Both
      bag-of-words models and their add-``alpha`` smoothed log-ratio
      lr[b] = ln(p_target[b]) - ln(p_raw[b]) are derived driver-side from
      that single bounded collect (<= n_buckets rows — the fitted DSIR
      model IS tiny; that is the point of hashed features).
    - Score: lr ships back as a LITERAL map, so each document's log
      importance weight sum_g lr[h(g)] is a zero-shuffle per-row fold.
      (The fold is a higher-order aggregate — per-token map lookups over
      a variable-length array cannot unroll; its lambda touches only its
      element argument, so nothing re-executes per element.)
    - Resample: Gumbel top-k — key = logw + g_i with g_i = -ln(-ln(u_i)),
      u_i a seeded-hash uniform in (0,1), equivalent to sampling without
      replacement ∝ exp(logw) but fully deterministic and replayable in
      SQL; ``TakeOrderedAndProject`` keeps the global sort bounded.

    Returns the ``n_keep`` selected rows:
    (id, n_grams, logw, resample_key, rank).

    100 TB posture: fit is one partial-agg'd shuffle bounded by
    n_buckets; scoring is a projection; selection is a top-k — no
    corpus-scale join or global sort materializes anywhere.
    """
    import math

    from urban_traffic_data_lake_project_spark.functions import normalize_text
    from urban_traffic_data_lake_project_spark.sources import spread_to_parallelism

    # `bucketed` (one md5 per gram) is evaluated twice — fit explode and
    # scoring fold; on a byte-small input both would run on the scan's one
    # split. Conditional round-robin spread (no-op at healthy split counts).
    df = spread_to_parallelism(df)
    B = int(n_buckets)
    w = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda x: x != ""
    )
    n_bi = F.greatest(F.size(w) - 1, F.lit(0))
    grams = F.concat(
        w,
        F.zip_with(
            F.slice(w, 1, n_bi), F.slice(w, 2, n_bi),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    )
    bucketed = df.select(
        F.col(id_col),
        target_pred.alias("__is_tgt"),
        F.transform(
            grams,
            lambda g: (
                F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint") % B
            ),
        ).alias("__b"),
    )

    fit = (
        bucketed.select("__is_tgt", F.explode("__b").alias("b"))
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.count_if(F.col("__is_tgt")).alias("n_tgt"),
        )
    )
    # InferFiltersFromGenerate would add `size(__b) > 0 AND isnotnull(__b)`
    # under the explode; predicate pushdown then substitutes the whole
    # md5-transform chain into that filter (bisected r8: 3.18 s -> 2.24 s
    # median at sf0.1 — the r7 bench regression). The array is never null
    # and explode already skips empties, so the inferred filter prunes
    # nothing: exclude the rule, scoped to this one action.
    from urban_traffic_data_lake_project_spark.session import (
        excluded_optimizer_rules,
    )

    with excluded_optimizer_rules(
        df.sparkSession,
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    ):
        stats = fit.collect()
    R = sum(r["n_raw"] for r in stats)
    T = sum(r["n_tgt"] for r in stats)
    lr = {
        int(r["b"]): math.log((r["n_tgt"] + alpha) / (T + alpha * B))
        - math.log((r["n_raw"] + alpha) / (R + alpha * B))
        for r in stats
    }
    from urban_traffic_data_lake_project_spark.operators.similarity import _f

    lut = F.expr(
        "map(" + ", ".join(f"{b}, {_f(v)}" for b, v in sorted(lr.items())) + ")"
    )

    u = (
        (stable_hash64(
            F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string"))
        ) + 1).cast("double")
        / float(2**60 + 1)
    )
    scored = bucketed.select(
        F.col(id_col),
        F.size("__b").alias("n_grams"),
        F.round(
            F.aggregate(
                "__b", F.lit(0.0), lambda acc, x: acc + F.element_at(lut, x)
            ),
            6,
        ).alias("logw"),
        F.round(-F.log(-F.log(u)), 6).alias("__g"),
    ).withColumn("resample_key", F.round(F.col("logw") + F.col("__g"), 6))
    # top-k FIRST (TakeOrderedAndProject — per-partition heaps, never a
    # global sort), THEN the rank window over the n_keep survivors only
    kept = scored.orderBy(
        F.col("resample_key").desc(), F.col(id_col).asc()
    ).limit(n_keep)
    rank_w = Window.orderBy(F.col("resample_key").desc(), F.col(id_col).asc())
    return kept.withColumn("rank", F.row_number().over(rank_w)).select(
        id_col, "n_grams", "logw", "resample_key", "rank"
    )


def kcenter_coreset(
    df: DataFrame, id_col: str, vec_col: str, dim: int, k: int = 8
) -> DataFrame:
    """Greedy k-center coreset over an embedding column — the classic
    data-pruning selection (farthest-point traversal, a 2-approximation
    of the k-center objective; the geometric cousin of SemDeDup's
    keep-farthest rule): start from the smallest id, then k-1 times pick
    the point FARTHEST from everything selected so far. The selected
    rows maximize coverage diversity — the opposite end of the dial from
    dedup, for building small evaluation/calibration subsets.

    Scale shape: one distributed argmax pass per round (TakeOrderedAndProject
    of exactly 1 row — never a collect of the corpus) plus a literal-center
    distance projection; the running min-distance column is
    localCheckpoint-ed each round so the expression tree stays at one
    round's 64 terms (the accumulated `least` chain would cross janino's
    64 KB method limit by round ~8, the BPE merge-loop lesson). k passes
    over the corpus is the algorithm's honest cost — at 100 TB pick k
    small or seed with a pre-clustered sample.

    Determinism: distances fold left-associatively over dims (identical
    to the SQL oracle's unrolled form), the per-round argmax orders by
    (round(dist, 9) DESC, id ASC) so a sub-9dp cross-engine ulp cannot
    flip the selection.

    Returns one row per selected center: (round, id, sel_dist — the
    min-distance that made it the farthest point, 0 for the seed) plus
    the post-selection coverage radius (max remaining min-distance, the
    k-center objective value) repeated on every row.
    """
    base = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )

    def dist_to(center: list[float]):
        # d*d, not pow(d, 2): Math.pow is not guaranteed ulp-identical to
        # the multiplication the SQL oracle uses
        diffs = [
            F.element_at("__v", i + 1) - F.lit(float(center[i])) for i in range(dim)
        ]
        terms = [d * d for d in diffs]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    def round6(x: float) -> float:
        # HALF_UP like SQL round() / F.round — Python round() is
        # banker's half-even, a divergence at exact .xxxxxx5 ties
        # (ADVICE r9); distances are >= 0 so half-up == half-away
        import decimal

        return float(
            decimal.Decimal(repr(float(x))).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    first = base.orderBy(id_col).first()
    selected = [(1, first[id_col], 0.0)]
    cur = base.withColumn("__md", dist_to(first["__v"])).localCheckpoint()
    for rnd in range(2, k + 1):
        nxt = cur.orderBy(F.desc(F.round("__md", 9)), F.asc(id_col)).first()
        selected.append((rnd, nxt[id_col], round6(nxt["__md"])))
        cur = cur.withColumn(
            "__md", F.least("__md", dist_to(nxt["__v"]))
        ).localCheckpoint()
    radius = round6(cur.agg(F.max(F.round("__md", 9))).first()[0])
    spark = df.sparkSession
    id_type = df.schema[id_col].dataType.simpleString()
    return spark.createDataFrame(
        [(r, i, d, radius) for r, i, d in selected],
        f"round int, {id_col} {id_type}, sel_dist double, coverage_radius double",
    )
