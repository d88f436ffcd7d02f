"""Join operators: the reference's suffixed merge (J1/R10/R11/R14,
scripts/merge.py:49-98) plus the idiomatic as-of join upgrade (SURVEY.md §2.3).

Scale design:
- ``suffix_join`` is a plain equi-join — Catalyst picks broadcast vs
  sort-merge; the suffix logic is pure column renaming (pandas
  ``suffixes=('_traffic','_weather')`` has no Spark equivalent, so we
  rename colliding non-key columns before joining).
- ``asof_join`` deliberately avoids the naive range join (which explodes to
  a near-cross-product per key). It uses the union-and-window formulation:
  tag both streams, union, sort within key, and carry the most recent right
  row forward with ``last(ignorenulls)``. Cost = one shuffle + sort per
  side on the key — identical to a sort-merge join, regardless of time
  density. This is the standard scalable as-of strategy (same shape as
  Flink temporal joins / kdb aj).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def suffix_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "left",
    lsuffix: str = "_left",
    rsuffix: str = "_right",
) -> DataFrame:
    """Equi-join with pandas-style suffixing of colliding non-key columns
    (reference merge.py:71-77 suffixes=('_traffic','_weather'))."""
    collisions = (set(left.columns) & set(right.columns)) - set(on)
    for c in collisions:
        left = left.withColumnRenamed(c, c + lsuffix)
        right = right.withColumnRenamed(c, c + rsuffix)
    return left.join(right, on=list(on), how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_on: str,
    right_on: str,
    right_cols: Sequence[str],
    suffix: str = "_asof",
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """As-of join, all three pandas ``merge_asof`` directions: for each
    left row attach, within the same ``by`` key,

    - ``backward``: the most recent right row with ``t_r <= t_l``
      (``<`` when ``strict``);
    - ``forward``: the earliest right row with ``t_r >= t_l``;
    - ``nearest``: whichever of the two has the smaller |t_l - t_r|
      (exact ties resolve backward, pandas-style).

    Right payload columns come back as ``{col}{suffix}``; unmatched left
    rows get NULLs. Union-and-window formulation — one shuffle+sort per
    side like a sort-merge join; scales linearly, no range explosion
    (``nearest`` runs the window in both orders: two sorts, still no
    candidate blow-up)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest (got {direction!r})")
    lcols = left.columns
    payload = F.struct(*[F.col(c) for c in right_cols], F.col(right_on).alias("__rt"))
    r = right.select(
        *[F.col(c) for c in by],
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        *[F.lit(None).alias(f"__l_{c}") for c in lcols],
    )
    l = left.select(
        *[F.col(c) for c in by],
        F.col(left_on).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    both = l.unionByName(r)

    def one_side(df: DataFrame, forward: bool, col_name: str) -> DataFrame:
        # At equal timestamps the right row sorts first (side 0 for
        # backward, reversed for forward) so it is visible to the left
        # row — unless strict, where the left row sorts out of reach.
        if not forward:
            order = [F.col("__t").asc(), F.col("__side").asc() if not strict else F.col("__side").desc()]
        else:
            order = [F.col("__t").desc(), F.col("__side").asc() if not strict else F.col("__side").desc()]
        w = (
            Window.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
        )
        return df.withColumn(col_name, F.last("__payload", ignorenulls=True).over(w))

    if direction == "backward":
        matched = one_side(both, False, "__match")
    elif direction == "forward":
        matched = one_side(both, True, "__match")
    else:  # nearest: both windows, pick the smaller absolute gap
        two = one_side(one_side(both, False, "__back"), True, "__fwd")
        gap_b = F.abs(F.col("__t").cast("double") - F.col("__back.__rt").cast("double"))
        gap_f = F.abs(F.col("__fwd.__rt").cast("double") - F.col("__t").cast("double"))
        pick_back = F.col("__fwd").isNull() | (
            F.col("__back").isNotNull() & (gap_b <= gap_f)
        )
        matched = two.withColumn(
            "__match", F.when(pick_back, F.col("__back")).otherwise(F.col("__fwd"))
        )
    matched = matched.filter(F.col("__side") == 1)
    out_cols = [F.col(f"__l_{c}").alias(c) for c in lcols]
    out_cols += [F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols]
    return matched.select(*out_cols)


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Interval join: pair each left row with every right row of the same
    ``by`` key whose timestamp lies within ±``window_seconds`` of the left
    timestamp. INNER only: the 3x bin explode would multiply unmatched
    left rows and the post-join range filter would drop null-matched rows,
    so any outer variant through this plan silently collapses back to
    inner — build outer semantics by left-anti-joining the matched ids and
    unioning the remainder back with null right columns.

    The naive formulation (non-equi `abs(l - r) <= w`) plans as a
    broadcast-nested-loop / cartesian per key — quadratic. This is the
    scale-correct BINNING pattern: bucket both sides into
    ``window_seconds``-wide epochs, explode the left row into its own and
    the two adjacent bins (3 rows), equi-join on (by, bin) — Catalyst gets
    a plain hash join — then filter the exact range predicate. Cost is
    3x the left side instead of |key group|^2 pairs; every candidate pair
    is within one bin of matching, so the post-filter discards at most
    2/3 of the joined rows."""
    # bins on truncated seconds; the exact predicate below is full
    # microsecond precision — |l - r| <= W still implies the truncated
    # bins differ by at most 1, so ±1-bin candidates remain complete
    if how != "inner":
        raise ValueError(
            f"range_join_binned supports only how='inner' (got {how!r}); "
            "outer semantics do not survive the bin explode + range filter"
        )
    # tolerate TIMESTAMP_NTZ inputs (unix_micros below requires TIMESTAMP;
    # the cast is identity under the pinned UTC session zone)
    if dict(left.dtypes).get(left_ts) == "timestamp_ntz":
        left = left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
    if dict(right.dtypes).get(right_ts) == "timestamp_ntz":
        right = right.withColumn(right_ts, F.col(right_ts).cast("timestamp"))
    lbin = (F.unix_timestamp(F.col(left_ts)) / window_seconds).cast("long")
    rbin = (F.unix_timestamp(F.col(right_ts)) / window_seconds).cast("long")
    l = left.withColumn(
        "__bin", F.explode(F.array(lbin - 1, lbin, lbin + 1))
    )
    r = right.withColumn("__bin", rbin)
    joined = l.join(r, [*by, "__bin"], how)
    in_range = (
        F.abs(F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(right_ts)))
        <= window_seconds * 1_000_000
    )
    return joined.filter(in_range).drop("__bin")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Skew-mitigating equi-join: the (large, skewed) left side gets a
    random salt in [0, salt_buckets); the right side is replicated once
    per salt value; the join key becomes (keys..., salt). A hot key's rows
    now spread over ``salt_buckets`` reducers instead of one.

    AQE's skew-join split (enabled in session defaults) handles most skew
    automatically — use this when a single key exceeds what one task can
    hold even after AQE splitting, or on engines/paths where AQE cannot
    apply (e.g. streaming-static joins). Supported: inner/left joins with
    the skewed side on the left. Results are identical to the unsalted
    join (verified in tests)."""
    salts = F.array(*[F.lit(i) for i in range(salt_buckets)])
    lsalted = left.withColumn("__salt", (F.rand(seed) * salt_buckets).cast("int"))
    rsalted = right.withColumn("__salt", F.explode(salts))
    return lsalted.join(rsalted, [*on, "__salt"], how).drop("__salt")


def day_key_merge(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    extra_keys: Sequence[str] = (),
    how: str = "left",
    lsuffix: str = "_left",
    rsuffix: str = "_right",
) -> DataFrame:
    """The reference's merge stage verbatim (merge.py:63-80): derive a
    day-granularity key from each side's timestamp (R10), left-join on
    (extra_keys..., day) with suffixing (J1/R14), drop the key (R11).
    Day-level keys fan out many-to-many by design."""
    lk, rk = "__day", "__day"
    left = left.withColumn(lk, F.to_date(F.col(left_ts)))
    right = right.withColumn(rk, F.to_date(F.col(right_ts)))
    joined = suffix_join(left, right, on=[*extra_keys, "__day"], how=how, lsuffix=lsuffix, rsuffix=rsuffix)
    return joined.drop("__day")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_seconds: int,
) -> DataFrame:
    """Interval-overlap join: pair rows of the same ``by`` key whose CLOSED
    intervals ``[l_start, l_end]`` and ``[r_start, r_end]`` intersect.

    The generalization of ``range_join_binned`` from points-vs-window to
    interval-vs-interval (session-vs-incident, outage-vs-job overlap — the
    shapes a point range join cannot express). Same scale discipline: the
    naive ``s1 <= e2 AND s2 <= e1`` theta join plans as a per-key nested
    loop; here BOTH sides explode to the ``bin_seconds``-wide epochs their
    interval covers (cost: rows x (len/bin + 1), so pick ``bin_seconds``
    near the typical interval length), equi-join on (by, bin) — a plain
    hash join — then apply the exact predicate. A pair sharing several
    bins would duplicate; it is kept ONLY in the later of the two start
    bins (a deterministic property of the pair), so no distinct shuffle
    is spent on dedup.
    """
    for df_name, df, cols in (("left", left, (l_start, l_end)), ("right", right, (r_start, r_end))):
        dt = dict(df.dtypes)
        for c in cols:
            if dt.get(c) == "timestamp_ntz":
                df = df.withColumn(c, F.col(c).cast("timestamp"))
        if df_name == "left":
            left = df
        else:
            right = df

    def bins(s: str, e: str):
        sb = F.floor(F.unix_timestamp(F.col(s)) / bin_seconds)
        eb = F.floor(F.unix_timestamp(F.col(e)) / bin_seconds)
        return sb, F.explode(F.sequence(sb, eb))

    lsb, lbins = bins(l_start, l_end)
    rsb, rbins = bins(r_start, r_end)
    l = left.withColumn("__lsb", lsb).withColumn("__bin", lbins)
    r = right.withColumn("__rsb", rsb).withColumn("__bin", rbins)
    joined = l.join(r, [*by, "__bin"], "inner")
    overlap = (F.unix_micros(F.col(l_start)) <= F.unix_micros(F.col(r_end))) & (
        F.unix_micros(F.col(r_start)) <= F.unix_micros(F.col(l_end))
    )
    first_shared = F.col("__bin") == F.greatest(F.col("__lsb"), F.col("__rsb"))
    return joined.filter(overlap & first_shared).drop("__bin", "__lsb", "__rsb")


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    combine: dict | None = None,
) -> DataFrame:
    """Relational MERGE/upsert: rows keyed in both frames are UPDATED
    (per-column ``combine`` expressions see both sides), source-only keys
    are INSERTED, target-only keys pass through — plus a ``merge_action``
    column ('update' / 'insert' / 'keep') for CDC auditing.

    ``combine`` maps column name -> fn(target_col, source_col) -> Column;
    columns without an entry take the source value when present
    (classic last-writer-wins). The plan is ONE full outer join on the
    keys — the same shape Delta/Iceberg MERGE INTO compiles to — so at
    scale it is a single co-partitioned shuffle, and bucketed/partitioned
    targets join shuffle-free on their layout."""
    tcols = [c for c in target.columns if c not in keys]
    scols = [c for c in source.columns if c not in keys]
    # explicit presence markers — payload columns may be legitimately NULL
    t = target.select(
        *keys, F.lit(1).alias("__t_present"), *[F.col(c).alias(f"__t_{c}") for c in tcols]
    )
    s = source.select(
        *keys, F.lit(1).alias("__s_present"), *[F.col(c).alias(f"__s_{c}") for c in scols]
    )
    j = t.join(s, list(keys), "full_outer")
    in_t = F.col("__t_present").isNotNull()
    in_s = F.col("__s_present").isNotNull()
    combine = combine or {}
    out_cols: list = [F.col(k) for k in keys]
    for c in sorted({*tcols, *scols}):
        tc = F.col(f"__t_{c}") if c in tcols else F.lit(None)
        sc = F.col(f"__s_{c}") if c in scols else F.lit(None)
        if c in combine:
            expr = F.when(in_t & in_s, combine[c](tc, sc)).otherwise(
                F.coalesce(sc, tc)
            )
        else:
            expr = F.coalesce(sc, tc)
        out_cols.append(expr.alias(c))
    action = (
        F.when(in_t & in_s, F.lit("update"))
        .when(in_s, F.lit("insert"))
        .otherwise(F.lit("keep"))
    )
    return j.select(*out_cols, action.alias("merge_action"))


def fuzzy_join_blocked(
    left: DataFrame,
    right: DataFrame,
    l_col: str,
    r_col: str,
    max_dist: int = 1,
    ngram: int = 3,
) -> DataFrame:
    """Edit-distance (Levenshtein) join with q-gram blocking — record
    linkage for dirty keys. The naive form is a cartesian filter; here
    candidates are generated by exploding each side's distinct character
    ``ngram``-grams and equi-joining on the gram (the same
    shingle-candidate shape as dedup_ngram_jaccard), then the exact
    ``levenshtein() <= max_dist`` predicate runs on candidates only.
    Complete for strings longer than ``ngram * (max_dist + 1) - 1``
    chars (an edit destroys at most ``ngram`` grams; shorter strings
    cannot guarantee a surviving shared gram — callers pad or
    exact-match those). Pairs sharing several grams are dropped to one
    row by the pair-level distinct before the (expensive) distance
    evaluation."""

    def grams(c: Column) -> Column:
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(c) - (ngram - 1)),
                lambda i: c.substr(i, F.lit(ngram)),
            )
        )

    lg = left.withColumn("__g", F.explode(grams(F.col(l_col))))
    rg = right.withColumn("__g", F.explode(grams(F.col(r_col))))
    cand = lg.join(rg, "__g").drop("__g").distinct()
    # thresholded levenshtein: banded DP, O(len * max_dist) per pair
    # instead of O(len^2); returns -1 past the threshold, which the
    # filter drops exactly like the unbounded form did
    return cand.withColumn(
        "dist", F.levenshtein(F.col(l_col), F.col(r_col), max_dist)
    ).filter(F.col("dist") >= 0)


def choose_block_width(
    df: DataFrame,
    name_col: str,
    part_cols: Sequence[str],
    max_width: int = 4,
    target_pairs_per_row: float = 32.0,
) -> int:
    """Auto-size the blocking-key width for blocked record linkage — the
    ``srp_choose_bands`` idea (operators/dedup.py) applied to suffix
    blocking: ONE aggregation pass over block occupancy at every
    candidate width (1..max_width trailing chars of ``name_col``, on top
    of the exact ``part_cols`` block keys), then the driver picks the
    NARROWEST width whose expected candidate pairs per probe row stays
    under ``target_pairs_per_row``.

    With both linkage sides drawn from the same population, candidate
    pairs per probe at width w are ~ sum_b(n_b^2) / n over the blocks b
    of (part_cols, right(name, w)) — the same sum-of-squares occupancy
    mass the SRP chooser bounds. The profile pass explodes each row into
    max_width (width, suffix) keys, so the whole decision costs one
    shuffle on the profiling side and a driver collect of max_width
    rows; everything downstream is unchanged equi-join plumbing.

    Deterministic given the data (integer counts, exact comparison), so
    an auto-tuned run is reproducible — and SQL-replayable: the DuckDB
    oracle recomputes the same profile and the same min-width pick
    (queries/windows.py::_RECORD_LINKAGE_SQL). Monotonicity (occupancy
    mass never increases with width) and parity with an explicit-width
    run are property-tested in tests/test_window_queries.py.
    """
    if max_width < 1:
        raise ValueError(f"max_width must be >= 1 (got {max_width})")
    widths = F.explode(
        F.array(*[F.lit(w) for w in range(1, max_width + 1)])
    ).alias("__w")
    occ = (
        df.select(*part_cols, F.col(name_col).alias("__nm"))
        .select(*part_cols, "__nm", widths)
        .groupBy(F.col("__w"), *part_cols, F.expr("right(__nm, __w)").alias("__blk"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    prof = {
        int(r["__w"]): (float(r["n"]), float(r["sq"]))
        for r in occ.groupBy("__w")
        .agg(
            F.sum("__c").alias("n"),
            F.sum(F.col("__c") * F.col("__c")).alias("sq"),
        )
        .collect()
    }
    for w in range(1, max_width + 1):
        n, sq = prof[w]
        if sq <= target_pairs_per_row * n:
            return w
    return max_width
