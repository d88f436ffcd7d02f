"""Multimodal plumbing + scalar function queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from urban_traffic_data_lake_project_spark.operators import multimodal as MM
from urban_traffic_data_lake_project_spark.operators import similarity as S
from urban_traffic_data_lake_project_spark.queries import scalars as qs
from urban_traffic_data_lake_project_spark.sources import load_table


@pytest.mark.parametrize(
    "name", [n for n, spec in sorted(qs.REGISTRY.items()) if spec.oracle]
)
def test_scalar_query_matches_oracle(oracle, name):
    oracle(name)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return MM.ingest_binary(docs, "doc_id", "payload", "video", "mp4")


def _names_types(schema):
    return [(f.name, f.dataType) for f in schema.fields]


def test_ingest_schema_contract(media):
    assert _names_types(media.schema) == _names_types(MM.MEDIA_SCHEMA)
    row = media.first()
    assert row["byte_len"] == len(row["payload"])
    assert row["media_type"] == "video" and row["format"] == "mp4"


def test_decode_fills_metadata_deterministically(media):
    decoded = MM.decode_metadata(media)
    rows = decoded.orderBy("media_id").limit(5).collect()
    assert all(r["width"] is not None and 16 <= r["width"] < 80 for r in rows)
    rows2 = MM.decode_metadata(media).orderBy("media_id").limit(5).collect()
    assert [r.asDict() for r in rows] == [r.asDict() for r in rows2]


def test_feature_extraction_batch_shape_and_determinism(media):
    feats = MM.extract_features(media)
    assert _names_types(feats.schema) == _names_types(MM.FEATURE_SCHEMA)
    rows = feats.orderBy("media_id").limit(3).collect()
    assert all(len(r["feature"]) == 32 for r in rows)
    again = MM.extract_features(media).orderBy("media_id").limit(3).collect()
    assert [list(r["feature"]) for r in rows] == [list(r["feature"]) for r in again]
    assert all(-1.0 <= v <= 1.0 for r in rows for v in r["feature"])


def test_features_compose_with_similarity_search(spark, media):
    feats = MM.extract_features(media).withColumnRenamed("media_id", "vec_id").withColumnRenamed("feature", "embedding")
    q = feats.filter(F.col("vec_id") < 3)
    out = S.cosine_topk(feats, q, k=3)
    assert out.count() == 9


def test_resize_scales_metadata_preserving_aspect(spark, media):
    decoded = MM.decode_metadata(media)
    resized = MM.resize(decoded, max_side=20)
    rows = resized.join(
        decoded.select(
            F.col("media_id"), F.col("width").alias("w0"), F.col("height").alias("h0")
        ),
        "media_id",
    ).collect()
    for r in rows:
        assert max(r["width"], r["height"]) <= 20
        if max(r["w0"], r["h0"]) > 20:  # scaled down, aspect preserved +-rounding
            a0 = r["w0"] / r["h0"]
            assert abs(r["width"] / r["height"] - a0) / a0 < 0.15
        else:  # small media untouched
            assert (r["width"], r["height"]) == (r["w0"], r["h0"])


def test_frame_sampling(spark, media):
    decoded = MM.decode_metadata(media)
    frames = MM.frame_sample(decoded, every_ms=1000)
    joined = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).join(
        decoded.select("media_id", "duration_ms"), "media_id"
    )
    bad = joined.filter(
        F.col("n") != (F.floor((F.col("duration_ms") - 1) / 1000) + 1)
    ).count()
    assert bad == 0


def test_random_moments_distribution(spark, sf_dir):
    row = qs.REGISTRY["scalar_random_moments"].fn(spark, sf_dir).first()
    assert abs(row["mean_u"] - 0.5) <= 0.02
    assert abs(row["std_u"] - 0.29) <= 0.02  # 1/sqrt(12) ~ 0.289
    assert abs(row["mean_z"]) <= 0.1 and abs(row["std_z"] - 1.0) <= 0.1
    assert row["n_choices"] == 4


def test_balance_partitions(media):
    balanced = MM.balance_partitions(media, target_partition_bytes=64 * 1024)
    assert balanced.rdd.getNumPartitions() >= 2
