"""Similarity search over embedding columns (array<float>) — BASELINE.json
north-star surface, absent from the reference.

- ``cosine_topk``        : exact brute-force top-k. Queries broadcast to
                           every candidate partition; the dot product is a
                           JVM-side ``aggregate(zip_with(...))`` expression
                           (no Python, no shuffle of the corpus).
- ``cosine_topk_ivf``    : the scale path. Deterministic IVF: the first
                           ``n_centroids`` vectors (by id) act as centroids;
                           candidates are bucketed by nearest centroid;
                           queries probe the ``nprobe`` nearest buckets
                           only. At 100 TB the corpus shuffles once on
                           centroid id, and each query touches
                           nprobe/n_centroids of the data.

Everything is deterministic (ties broken by id) so results are
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity between two array columns (computed in double)."""
    da, db = _as_double(a), _as_double(b)
    return _dot(da, db) / (_norm(da) * _norm(db))


def grouped_vector_mean(
    df: DataFrame, group_cols: list, vec_col: str, out_col: str = "centroid"
) -> DataFrame:
    """Element-wise mean of an array column per group (per-class embedding
    centroids — the building block for class-balanced similarity stats and
    IVF training). posexplode -> grouped avg on (group, pos) -> reassemble
    ordered by position. One shuffle on (group, pos) WITH map-side partial
    aggregation — never a collect_list of whole vectors (which would move
    every vector to one reducer per group)."""
    ex = df.select(*group_cols, F.posexplode(_as_double(F.col(vec_col))).alias("__pos", "__v"))
    per = ex.groupBy(*group_cols, "__pos").agg(F.avg("__v").alias("__m"))
    return per.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list(F.struct("__pos", "__m")))
        .getField("__m")
        .alias(out_col)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector over the corpus.
    Returns (query_id, neighbor_id, cosine_sim, rank); self-matches are
    excluded; ties break to the smaller neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("__cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim",
            _dot(F.col("__qv"), F.col("__cv")) / (_norm(F.col("__qv")) * _norm(F.col("__cv"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def centroid_entries(
    corpus: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> list:
    """Deterministic IVF centroids — the ``n_centroids`` smallest-id corpus
    vectors — collected to the driver WITH their norms (norms computed by
    the same Spark expression used row-side, so literal-vs-column float
    behavior is identical)."""
    return (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("cid"),
            _as_double(F.col(vec_col)).alias("vec"),
            _norm(_as_double(F.col(vec_col))).alias("cnorm"),
        )
        .collect()
    )


def _centroid_literal(entries: list) -> Column:
    """The centroid table as ONE literal array<struct> column, broadcast
    implicitly inside the plan (n_centroids * dim doubles — tiny)."""
    return F.array(
        *[
            F.struct(
                F.lit(int(r["cid"])).alias("cid"),
                F.array(*[F.lit(float(x)) for x in r["vec"]]).alias("vec"),
                F.lit(float(r["cnorm"])).alias("cnorm"),
            )
            for r in entries
        ]
    )


def nearest_centroid_ids(v: Column, v_norm: Column, cents: Column, top: int) -> Column:
    """Array of the ``top`` nearest centroid ids for one row's vector — a
    pure per-row expression: cosine against the literal centroid array,
    ``array_sort`` over (neg_sim, cid) structs (ties -> smaller cid),
    slice, project ids. NO join, NO window, NO shuffle — the round-1
    formulation (row_number over a per-vector window after a centroid
    cross-join) shuffled the n_centroids-times-expanded corpus just to
    pick an argmax."""
    scored = F.transform(
        cents,
        lambda ct: F.struct(
            (-(_dot(v, ct["vec"]) / (v_norm * ct["cnorm"]))).alias("neg_sim"),
            ct["cid"].alias("cid"),
        ),
    )
    return F.slice(F.array_sort(scored), 1, top).getField("cid")


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k: IVF with deterministic centroids (the
    ``n_centroids`` smallest-id corpus vectors). Centroid assignment is a
    per-row expression against the literal centroid array (zero shuffle of
    the corpus); each query probes only its ``nprobe`` nearest centroid
    buckets via a broadcast join. At 100 TB the corpus is scanned once and
    never re-partitioned for assignment."""
    entries = centroid_entries(corpus, id_col, vec_col, n_centroids)
    cents = _centroid_literal(entries)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("__cv")
    ).withColumn("__cn", _norm(F.col("__cv")))
    assigned = c.select(
        "neighbor_id",
        "__cv",
        F.element_at(
            nearest_centroid_ids(F.col("__cv"), F.col("__cn"), cents, 1), 1
        ).alias("centroid_id"),
    )

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")
    ).withColumn("__qn", _norm(F.col("__qv")))
    probes = q.select(
        "query_id",
        "__qv",
        F.explode(
            nearest_centroid_ids(F.col("__qv"), F.col("__qn"), cents, nprobe)
        ).alias("centroid_id"),
    )

    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim",
            _dot(F.col("__qv"), F.col("__cv")) / (_norm(F.col("__qv")) * _norm(F.col("__cv"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )
