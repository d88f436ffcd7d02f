"""Embedding-matrix statistics and PCA whitening over ``array<float>``
columns.

Net-new surface (the reference has no vector columns): the standard
embedding-pipeline preprocessing pair —

- ``embedding_moments`` / ``embedding_covariance``: the d-dim mean vector
  and d×d population covariance of an embedding column in ONE corpus scan.
  The per-batch Arrow stage computes BLAS-speed partial moments
  (``X.T @ X`` per batch — one GEMM instead of d(d+1)/2 JVM accumulator
  updates per row, and immune to the janino constant-pool cliff a
  2,080-aggregate expression form would risk), emits them in long form
  ``(kind, pos, val)``, and a single tiny groupBy-sum merges the partials.
  State is O(d²) per batch and per group — independent of row count — so
  the same plan holds at 100 TB: one scan, one ~d²-row shuffle.
- ``pca_fit`` / ``pca_project``: the fit/score split of the
  factor-analysis operator (SURVEY §2.8 M1, reference
  ``factor_analysis.py:190-209``) applied to embeddings: the
  eigendecomposition runs on the driver over the collected d×d covariance
  (bounded — d² doubles, never row-scale), and the projection/whitening
  is applied distributedly as literal-coefficient Catalyst expressions
  (k dot products of d literals — JVM-side, no Python in the hot path).

Whitening (project onto top-k eigenvectors, scale each coordinate by
1/sqrt(eigenvalue)) is the common preprocessing for SemDeDup-style
clustering and retrieval: it equalizes per-direction variance so cosine
distances aren't dominated by a few high-variance directions.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "embedding_moments",
    "merge_moments",
    "embedding_covariance",
    "covariance_from_moments",
    "pca_fit",
    "pca_project",
    "mahalanobis_topk",
]


def _partial_moments_gen(vec_col: str, dim: int):
    """Arrow stage: per-batch count / column-sum / upper-triangle Gram
    partials in long form (kind, pos, val). pos encodes (i, j) as
    i*dim + j for gram entries (i <= j), the dimension index for sums."""

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        iu0, iu1 = np.triu_indices(dim)
        pos_g = (iu0 * dim + iu1).astype("int64")
        pos_s = np.arange(dim, dtype="int64")
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            if V.shape[1] != dim:
                raise ValueError(f"embedding dim {V.shape[1]} != declared {dim}")
            g = (V.T @ V)[iu0, iu1]
            s = V.sum(axis=0)
            yield pd.DataFrame(
                {
                    "kind": ["n"] + ["s"] * dim + ["g"] * len(pos_g),
                    "pos": np.concatenate(([0], pos_s, pos_g)),
                    "val": np.concatenate(([float(len(V))], s, g)),
                }
            )

    return gen


def embedding_moments(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Merged moment table ``(kind, pos, val)`` — kind 'n' (count, pos 0),
    's' (per-dim sum, pos = dim index), 'g' (upper-triangle second-moment
    sum, pos = i*dim + j). One corpus scan; the merge groupBy holds
    ≤ 1 + d + d(d+1)/2 groups regardless of row count."""
    parts = df.select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_col)
    ).mapInPandas(
        _partial_moments_gen(vec_col, dim), schema="kind string, pos long, val double"
    )
    return parts.groupBy("kind", "pos").agg(F.sum("val").alias("val"))


def merge_moments(*moment_tables: DataFrame) -> DataFrame:
    """Merge moment tables from disjoint corpus slices into the moments
    of their union — sums are associative, so a persisted moment sidecar
    plus a new batch's moments equals a full recompute WITHOUT rescanning
    the old data (the incremental-maintenance property; cost ∝ the new
    batch + O(d²) merge, never the corpus)."""
    it = iter(moment_tables)
    out = next(it)
    for m in it:
        out = out.unionByName(m)
    return out.groupBy("kind", "pos").agg(F.sum("val").alias("val"))


def embedding_covariance(
    df: DataFrame, vec_col: str, dim: int, round_to: int | None = None
) -> DataFrame:
    """Population covariance matrix in long form ``(i, j, cov)`` (1-based,
    i <= j), computed fully distributedly from the merged moments:
    cov(i,j) = E[x_i x_j] − E[x_i]E[x_j]. The count and the two mean
    lookups attach via broadcast joins on the ≤ d²-row moment table —
    no second corpus scan, no row-scale shuffle."""
    return covariance_from_moments(embedding_moments(df, vec_col, dim), dim, round_to)


def covariance_from_moments(
    m: DataFrame, dim: int, round_to: int | None = None
) -> DataFrame:
    """Assembly half of ``embedding_covariance`` over an already-built
    (or merged / persisted) moment table."""
    n = m.filter(F.col("kind") == "n").select(F.col("val").alias("__n"))
    means = m.filter(F.col("kind") == "s").select(
        F.col("pos").alias("__d"), F.col("val").alias("__s")
    )
    g = (
        m.filter(F.col("kind") == "g")
        .select(
            (F.col("pos") / dim).cast("long").alias("__i0"),
            (F.col("pos") % dim).alias("__j0"),
            F.col("val").alias("__g"),
        )
        # the 1-row count broadcast-attaches to every gram entry
        .crossJoin(F.broadcast(n))
    )
    mi = means.select(F.col("__d").alias("__i0"), F.col("__s").alias("__si"))
    mj = means.select(F.col("__d").alias("__j0"), F.col("__s").alias("__sj"))
    cov = (
        g.join(F.broadcast(mi), "__i0")
        .join(F.broadcast(mj), "__j0")
        .select(
            (F.col("__i0") + 1).alias("i"),
            (F.col("__j0") + 1).alias("j"),
            (
                F.col("__g") / F.col("__n")
                - (F.col("__si") / F.col("__n")) * (F.col("__sj") / F.col("__n"))
            ).alias("cov"),
        )
    )
    if round_to is not None:
        # + 0.0 collapses IEEE -0.0 to +0.0: a tiny negative covariance
        # rounds to signed zero in one engine and plain zero in the other
        # (observed cross-engine at sf0.01), and the driver's value hash
        # distinguishes them
        cov = cov.select(
            "i", "j", (F.round("cov", round_to) + F.lit(0.0)).alias("cov")
        )
    return cov


def pca_fit(df: DataFrame, vec_col: str, dim: int, k: int) -> dict:
    """Driver-side PCA fit from the distributed moments (the bounded
    collect: 1 + d + d(d+1)/2 rows — independent of corpus size).
    Returns mean (d,), components (k, d) rows = descending eigenvectors,
    eigenvalues (k,), and total variance. Eigenvector SIGN is pinned
    deterministically (largest-|coefficient| entry made positive) so the
    fit is reproducible across runs and engines."""
    import numpy as np

    rows = embedding_moments(df, vec_col, dim).collect()
    n = 0.0
    s = np.zeros(dim)
    G = np.zeros((dim, dim))
    for r in rows:
        if r["kind"] == "n":
            n = r["val"]
        elif r["kind"] == "s":
            s[int(r["pos"])] = r["val"]
        else:
            i, j = divmod(int(r["pos"]), dim)
            G[i, j] = r["val"]
            G[j, i] = r["val"]
    if n <= 0:
        raise ValueError("empty corpus: cannot fit PCA")
    mean = s / n
    cov = G / n - np.outer(mean, mean)
    # numerical floor: eigh on the symmetrized matrix
    evals, evecs = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(evals)[::-1][:k]
    evals = np.maximum(evals[order], 0.0)
    comps = evecs[:, order].T  # (k, d)
    for c in range(comps.shape[0]):
        pivot = int(np.argmax(np.abs(comps[c])))
        if comps[c, pivot] < 0:
            comps[c] = -comps[c]
    return {
        "mean": mean,
        "components": comps,
        "eigenvalues": evals,
        "total_variance": float(np.trace(cov)),
        "n": int(n),
    }


def pca_project(
    df: DataFrame,
    vec_col: str,
    fit: dict,
    whiten: bool = False,
    out_prefix: str = "pc",
    eps: float = 1e-12,
) -> DataFrame:
    """Distributed projection onto the fitted components as pure Catalyst
    literal-coefficient expressions: pc_c = Σ_d (v[d] − mean_d)·w_cd
    (optionally ·1/sqrt(λ_c) for whitening). k×d literal multiply-adds
    per row, JVM-side, shuffle-free — the scoring half of the fit/score
    split. Constant-folds the mean into a single per-component offset so
    each output is one dot product plus a literal."""
    comps = fit["components"]
    mean = fit["mean"]
    evals = fit["eigenvalues"]
    k, dim = comps.shape
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    proj_cols: list[Column] = []
    for c in range(k):
        scale = 1.0 / math.sqrt(float(evals[c]) + eps) if whiten else 1.0
        w = comps[c] * scale
        offset = -float((w * mean).sum())
        expr = F.lit(offset)
        for d in range(dim):
            expr = expr + v[d] * F.lit(float(w[d]))
        proj_cols.append(expr.alias(f"{out_prefix}{c + 1}"))
    return df.select("*", *proj_cols)


def mahalanobis_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k_out: int = 20,
    ridge: float = 1e-6,
) -> DataFrame:
    """Mahalanobis outlier scoring over the embedding column — the
    covariance-aware outlier screen (equivalently: the squared norm in
    the fully-whitened space), the curation filter for encoder glitches
    and out-of-distribution vectors that plain L2-to-centroid misses
    when dimensions are correlated.

    Fit/score split: mean + covariance from the ONE-scan moment pass
    (bounded driver collect), ridge-regularized Cholesky on the driver,
    then a vectorized Arrow stage computes m² = ||L⁻¹(x − μ)||² per
    batch (one GEMM against the driver-inverted factor — BLAS, no
    generated code: the 4,096-term full-rank literal projection this
    replaces would cross janino's 64 KB method limit, the
    sim_embedding_pca k=8 form scaled 8×). Top-k outliers resolve by
    (score desc, id asc) through TakeOrderedAndProject — the corpus is
    never collected.

    Rows-only by nature (Cholesky factors are not SQL-expressible);
    tests/test_embedding_stats.py pins exact numpy parity.
    """
    import numpy as np

    rows = embedding_moments(df, vec_col, dim).collect()
    n = 0.0
    s = np.zeros(dim)
    G = np.zeros((dim, dim))
    for r in rows:
        if r["kind"] == "n":
            n = r["val"]
        elif r["kind"] == "s":
            s[int(r["pos"])] = r["val"]
        else:
            i, j = divmod(int(r["pos"]), dim)
            G[i, j] = r["val"]
            G[j, i] = r["val"]
    if n <= 0:
        raise ValueError("empty corpus: cannot fit the covariance")
    mean = s / n
    cov = G / n - np.outer(mean, mean)
    L = np.linalg.cholesky((cov + cov.T) / 2.0 + ridge * np.eye(dim))
    # driver-inverted once (64x64); the Arrow stage is then one GEMM per
    # batch (no scipy in the runtime, so no triangular solve)
    Linv = np.linalg.inv(L)

    id_type = df.schema[id_col].dataType

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) - mean
            Y = Linv @ X.T
            yield pd.DataFrame(
                {id_col: pdf[id_col], "mahal_sq": (Y * Y).sum(axis=0)}
            )

    from pyspark.sql.types import DoubleType, StructField, StructType

    scored = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_col),
    ).mapInPandas(
        score,
        StructType(
            [StructField(id_col, id_type), StructField("mahal_sq", DoubleType())]
        ),
    )
    from pyspark.sql import Window as _W

    top = scored.orderBy(
        F.desc(F.round("mahal_sq", 9)), F.asc(id_col)
    ).limit(k_out)
    rank_w = _W.orderBy(F.desc(F.round("mahal_sq", 9)), F.asc(id_col))
    return top.select(
        id_col,
        F.round("mahal_sq", 6).alias("mahal_sq"),
        F.row_number().over(rank_w).alias("rank"),
    )
