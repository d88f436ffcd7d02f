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
    ``n_centroids`` smallest-id corpus vectors). Each corpus vector is
    assigned to its nearest centroid (one broadcast join); each query
    scans only its ``nprobe`` nearest centroid buckets."""
    centroids = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), _as_double(F.col(vec_col)).alias("__ctv"))
    )

    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("__cv"))
    assign_w = Window.partitionBy("neighbor_id").orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    assigned = (
        c.join(F.broadcast(centroids), how="cross")
        .withColumn("__sim", _dot(F.col("__cv"), F.col("__ctv")) / (_norm(F.col("__cv")) * _norm(F.col("__ctv"))))
        .withColumn("__rn", F.row_number().over(assign_w))
        .filter(F.col("__rn") == 1)
        .select("neighbor_id", "__cv", "centroid_id")
    )

    q = queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv"))
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        q.join(F.broadcast(centroids), how="cross")
        .withColumn("__sim", _dot(F.col("__qv"), F.col("__ctv")) / (_norm(F.col("__qv")) * _norm(F.col("__ctv"))))
        .withColumn("__rn", F.row_number().over(probe_w))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "__qv", "centroid_id")
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
