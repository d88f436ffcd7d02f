"""Exactly-once streaming sinks on raw parquet: idempotent per-batch
partition overwrite and MERGE-style versioned upsert."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from urban_traffic_data_lake_project_spark.sources import load_table
from urban_traffic_data_lake_project_spark.streaming.sinks import (
    current_version,
    foreach_batch_idempotent,
    foreach_batch_upsert,
    read_versioned,
)
from urban_traffic_data_lake_project_spark.streaming.windows import (
    read_table_stream,
)


def test_idempotent_sink_end_to_end_and_on_retry(spark, sf_dir, tmp_path):
    out = str(tmp_path / "out")
    stream = read_table_stream(spark, sf_dir, "events")
    sink = foreach_batch_idempotent(out)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    written = spark.read.parquet(out)
    batch = load_table(spark, sf_dir, "events")
    assert written.count() == batch.count()
    # a RETRIED epoch (same batch_id, same data) must not duplicate rows
    sink(batch, 0)
    assert spark.read.parquet(out).count() == batch.count()
    # ...while a new epoch appends under its own partition
    sink(batch.limit(5), 1)
    assert spark.read.parquet(out).count() == batch.count() + 5


def test_upsert_sink_keeps_latest_per_key_and_survives_retry(spark, tmp_path):
    table = str(tmp_path / "gold")
    sink = foreach_batch_upsert(table, keys=["k"], order_col="ver")

    b0 = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 10, "c")], "k int, ver int, val string"
    )
    b1 = spark.createDataFrame(
        [(2, 20, "b2"), (4, 20, "d")], "k int, ver int, val string"
    )
    sink(b0, 0)
    assert current_version(table) == 0
    sink(b1, 1)
    got = {r.k: (r.ver, r.val) for r in read_versioned(spark, table).collect()}
    assert got == {1: (10, "a"), 2: (20, "b2"), 3: (10, "c"), 4: (20, "d")}

    # retried epoch: rebuilds a new version from the same inputs -> the
    # visible table content is unchanged (no double-apply)
    sink(b1, 1)
    got2 = {r.k: (r.ver, r.val) for r in read_versioned(spark, table).collect()}
    assert got2 == got
    # old versions remain readable (time travel without a log)
    v0 = spark.read.parquet(os.path.join(table, "v=0"))
    assert {r.k for r in v0.collect()} == {1, 2, 3}


def test_upsert_sink_through_real_stream(spark, sf_dir, tmp_path):
    """Drive the upsert sink from an actual Structured Streaming query:
    the resulting table holds each user's LATEST event."""
    table = str(tmp_path / "users")
    stream = read_table_stream(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_upsert(table, keys=["user_id"], order_col="ts")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = read_versioned(spark, table)
    batch = load_table(spark, sf_dir, "events")
    expected = (
        batch.groupBy("user_id").agg(F.max("ts").alias("ts")).count()
    )
    assert got.count() == expected == batch.select("user_id").distinct().count()
    # spot-check one user: the kept row is the max-ts event
    u = got.first()
    mx = batch.filter(F.col("user_id") == u.user_id).agg(F.max("ts")).first()[0]
    assert u.ts == mx
