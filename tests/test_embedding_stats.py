"""Property tests for the embedding-moments / PCA-whitening operators
(operators/embedding_stats.py). The strict covariance oracle lives in the
registry (`sim_embedding_covariance`); these tests pin the parts SQL
cannot express: numpy parity of the distributed moments, the pinned-sign
deterministic fit, orthonormality, and the fit/score split's end-to-end
consistency (projected variance == eigenvalue; whitened variance == 1)."""

from __future__ import annotations

import numpy as np
import pytest

from urban_traffic_data_lake_project_spark.operators import embedding_stats as E
from urban_traffic_data_lake_project_spark.sources import load_table

DIM = 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def X(emb):
    pdf = emb.select("embedding").toPandas()
    return np.stack(pdf["embedding"].to_numpy()).astype(np.float64)


def test_covariance_matches_numpy(emb, X):
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in E.embedding_covariance(emb, "embedding", DIM).collect()
    }
    want = np.cov(X, rowvar=False, ddof=0)
    assert len(got) == DIM * (DIM + 1) // 2
    for (i, j), v in got.items():
        assert abs(v - want[i - 1, j - 1]) < 1e-9, (i, j)


def test_moments_row_count_is_corpus_size_independent(emb):
    # the merged moment table is O(d^2) rows whatever the corpus size —
    # the property that makes the single collect in pca_fit bounded
    m = E.embedding_moments(emb, "embedding", DIM)
    assert m.count() == 1 + DIM + DIM * (DIM + 1) // 2


def test_pca_fit_matches_numpy_eig(emb, X):
    fit = E.pca_fit(emb, "embedding", DIM, k=8)
    cov = np.cov(X, rowvar=False, ddof=0)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:8]
    assert np.allclose(fit["eigenvalues"], evals, atol=1e-9)
    # descending order, orthonormal rows, pinned sign
    assert all(a >= b - 1e-12 for a, b in zip(fit["eigenvalues"], fit["eigenvalues"][1:]))
    C = fit["components"]
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-9)
    for c in range(C.shape[0]):
        assert C[c, int(np.argmax(np.abs(C[c])))] > 0
    assert abs(fit["total_variance"] - np.trace(cov)) < 1e-9


def test_projection_variance_equals_eigenvalue(emb, X):
    fit = E.pca_fit(emb, "embedding", DIM, k=4)
    proj = E.pca_project(emb, "embedding", fit, whiten=False)
    pdf = proj.select(*[f"pc{c}" for c in range(1, 5)]).toPandas()
    for c in range(4):
        got = float(pdf[f"pc{c + 1}"].var(ddof=0))
        assert abs(got - fit["eigenvalues"][c]) < 1e-8
        # projections are centered (the folded mean offset is correct)
        assert abs(float(pdf[f"pc{c + 1}"].mean())) < 1e-9


def test_whitened_variance_is_one(emb):
    fit = E.pca_fit(emb, "embedding", DIM, k=4)
    proj = E.pca_project(emb, "embedding", fit, whiten=True)
    pdf = proj.select(*[f"pc{c}" for c in range(1, 5)]).toPandas()
    for c in range(4):
        assert abs(float(pdf[f"pc{c + 1}"].var(ddof=0)) - 1.0) < 1e-6


def test_full_rank_projection_preserves_total_variance(emb, X):
    # k = d: the projection is a rotation — per-component variances sum to
    # the total variance (nothing lost, the reconstruction-error analogue)
    fit = E.pca_fit(emb, "embedding", DIM, k=DIM)
    proj = E.pca_project(emb, "embedding", fit, whiten=False)
    pdf = proj.select(*[f"pc{c}" for c in range(1, DIM + 1)]).toPandas()
    total = sum(float(pdf[f"pc{c}"].var(ddof=0)) for c in range(1, DIM + 1))
    assert abs(total - fit["total_variance"]) < 1e-7


def test_moment_merge_equals_full_recompute(emb):
    # the incremental-maintenance property: moments of disjoint slices
    # merge (plain sums) into the moments of the union — no rescan of the
    # old slice, only float re-association noise
    old = emb.filter("vec_id % 3 != 0")
    batch = emb.filter("vec_id % 3 = 0")
    merged = {
        (r["kind"], r["pos"]): r["val"]
        for r in E.merge_moments(
            E.embedding_moments(old, "embedding", DIM),
            E.embedding_moments(batch, "embedding", DIM),
        ).collect()
    }
    full = {
        (r["kind"], r["pos"]): r["val"]
        for r in E.embedding_moments(emb, "embedding", DIM).collect()
    }
    assert merged.keys() == full.keys()
    for k, v in full.items():
        assert abs(merged[k] - v) <= 1e-9 * max(1.0, abs(v)), k


def test_empty_corpus_raises(emb):
    with pytest.raises(Exception, match="empty corpus"):
        E.pca_fit(emb.filter("vec_id < 0"), "embedding", DIM, k=2)


def test_mahalanobis_topk_matches_numpy_exactly(spark, sf_dir):
    """The Arrow-GEMM scoring must reproduce the local numpy Mahalanobis
    computation, rank deterministically, and actually differ from plain
    L2-to-centroid ranking (the reason the operator exists)."""
    import numpy as np

    from urban_traffic_data_lake_project_spark.operators.embedding_stats import (
        mahalanobis_topk,
    )
    from urban_traffic_data_lake_project_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = sorted(
        mahalanobis_topk(emb, "vec_id", "embedding", 64, k_out=20).collect(),
        key=lambda r: r["rank"],
    )
    rows = emb.select("vec_id", "embedding").collect()
    V = np.array([[float(x) for x in r["embedding"]] for r in rows], dtype=np.float64)
    vid = np.array([r["vec_id"] for r in rows])
    mean = V.mean(axis=0)
    cov = np.cov(V.T, bias=True)
    L = np.linalg.cholesky((cov + cov.T) / 2.0 + 1e-6 * np.eye(64))
    Y = np.linalg.inv(L) @ (V - mean).T
    m2 = (Y * Y).sum(axis=0)
    order = np.lexsort((vid, -np.round(m2, 9)))[:20]
    assert [r["vec_id"] for r in out] == [int(vid[i]) for i in order]
    for r, i in zip(out, order):
        assert abs(r["mahal_sq"] - m2[i]) < 1e-4, (r, m2[i])
    assert [r["rank"] for r in out] == list(range(1, 21))
    # covariance-aware ranking must disagree with plain L2 somewhere
    l2 = ((V - mean) ** 2).sum(axis=1)
    l2_order = np.lexsort((vid, -np.round(l2, 9)))[:20]
    assert [int(vid[i]) for i in order] != [int(vid[i]) for i in l2_order]
