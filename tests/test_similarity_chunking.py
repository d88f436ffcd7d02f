"""Chunk-budget invariance of the codegen-safe folds.

At the default ``_MAX_STAGE_TERMS`` most registry shapes compile as a
single stage, so the multi-chunk fold paths (the pinned array_sort /
transform islands with non-foldable dead-branch guards — see
`SCALING.md` "Expression-level pitfalls") would otherwise go
unexercised by the oracle gate. These tests force tiny budgets —
down to one centroid / one subspace / one query per stage, i.e. the
deepest possible fold chains — and assert results identical to the
effectively-unchunked plan. This is the correctness lock for the exact
machinery the 64 KB-codegen fix depends on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import urban_traffic_data_lake_project_spark.operators.similarity as S
from urban_traffic_data_lake_project_spark.sources import load_table

BIG = 1 << 30  # effectively unchunked


@pytest.fixture()
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _budget(monkeypatch, n: int) -> None:
    monkeypatch.setattr(S, "_MAX_STAGE_TERMS", n)


@pytest.mark.parametrize("top", [1, 4])
def test_nearest_centroids_invariant_under_chunking(spark, emb, top, monkeypatch):
    entries = S.centroid_entries(emb, "vec_id", "embedding", 16)
    c = emb.select(
        "vec_id", S._as_double(F.col("embedding")).alias("__v")
    ).withColumn("__n", S._norm(F.col("__v")))

    def assign(budget, impl="expr"):
        monkeypatch.setattr(S, "_MAX_STAGE_TERMS", budget)
        rows = S.with_nearest_centroids(
            c, "__v", "__n", entries, top, "cids", impl=impl
        ).select("vec_id", "cids").collect()
        return sorted((r["vec_id"], tuple(r["cids"])) for r in rows)

    base = assign(BIG)
    # dim=64 -> budget 64 is ONE centroid struct per stage (16 stages,
    # 15 island folds); 256 is the 4-chunk shape
    for budget in (64, 256):
        assert assign(budget) == base, f"budget={budget}, top={top}"
    # the DEFAULT vectorized Arrow path must agree bit-exactly with the
    # expression folds (same left-assoc accumulation -> same doubles,
    # same argmin ties)
    assert assign(BIG, impl="arrow") == base, f"arrow parity, top={top}"


def test_pq_encode_and_mse_invariant_under_chunking(spark, emb, monkeypatch):
    cb = S.pq_codebooks(emb, "vec_id", "embedding", m=8, k=16)

    def run(budget, impl="expr"):
        monkeypatch.setattr(S, "_MAX_STAGE_TERMS", budget)
        enc = S.pq_encode(emb, "vec_id", "embedding", cb, codes_col="codes", impl=impl)
        mse = S.pq_reconstruction_mse(enc, "vec_id", "embedding", cb, codes_col="codes")
        return sorted(
            (r["vec_id"], r["code_str"], r["mse"]) for r in mse.collect()
        )

    base = run(BIG)
    # terms_per_sub = k*sub = 128 -> budget 128 is ONE subspace per stage
    # (8 stages, 7 folds); 256 groups two
    for budget in (128, 256):
        assert run(budget) == base, f"budget={budget}"
    # default Arrow encode must agree bit-exactly with the expression form
    assert run(BIG, impl="arrow") == base, "arrow parity"


def test_pq_adc_topk_invariant_under_chunking(spark, emb, monkeypatch):
    cb = S.pq_codebooks(emb, "vec_id", "embedding", m=8, k=16)
    queries = emb.filter(F.col("vec_id") < 10)

    def run(budget):
        monkeypatch.setattr(S, "_MAX_STAGE_TERMS", budget)
        out = S.pq_adc_topk(emb, queries, "vec_id", "embedding", cb, k_top=5)
        return sorted(
            (r["query_id"], r["corpus_id"], r["adc_dist"], r["rank"])
            for r in out.collect()
        )

    base = run(BIG)
    # qgroup = budget/m -> budget 8 is ONE query struct per stage (10
    # stages at 10 queries); 32 groups four
    for budget in (8, 32):
        assert run(budget) == base, f"budget={budget}"
