"""Structured Streaming: batch equivalence (AvailableNow), watermark
late-data semantics, stateful dedup."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from urban_traffic_data_lake_project_spark.queries import windows as qw
from urban_traffic_data_lake_project_spark.streaming import windows as sw


def _normalize(df):
    pdf = df.toPandas()
    return pdf.sort_values(list(sorted(pdf.columns))).reset_index(drop=True)[sorted(pdf.columns)]


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream = sw.read_events_stream(spark, sf_dir)
    got = sw.run_available_now(sw.tumbling_counts(stream), spark)
    expected = qw.batch_tumbling(spark, sf_dir)
    g, e = _normalize(got), _normalize(expected)
    assert g.equals(e), f"streaming vs batch mismatch:\n{g.compare(e) if g.shape == e.shape else (g.shape, e.shape)}"


def test_streaming_sliding_equals_batch(spark, sf_dir):
    stream = sw.read_events_stream(spark, sf_dir)
    got = sw.run_available_now(sw.sliding_counts(stream), spark)
    expected = qw.REGISTRY["win_sliding_events"].fn(spark, sf_dir)
    assert _normalize(got).equals(_normalize(expected))


def test_streaming_session_equals_batch(spark, sf_dir):
    stream = sw.read_events_stream(spark, sf_dir)
    got = sw.run_available_now(sw.session_counts(stream), spark)
    expected = qw.REGISTRY["win_session_events"].fn(spark, sf_dir)
    assert _normalize(got).equals(_normalize(expected))


@pytest.fixture()
def three_batch_dir(spark):
    """Three micro-batch files. Watermark semantics (Spark guarantee): a
    window is evicted+emitted once a batch runs with watermark past its
    end; late data arriving AFTER eviction is dropped. Timeline:
    - f1 (batch 0): events at 12:00 and 15:00 -> watermark after: 14:00
    - f2 (batch 1): event at 15:01; runs with wm=14:00 -> evicts+emits
      the [12:00,13:00) window with n=1
    - f3 (batch 2): LATE event at 12:05 -> window already evicted -> drop
    """
    import time

    d = tempfile.mkdtemp(prefix="stream_late_")
    base = dt.datetime(2024, 1, 1, 12, 0)
    schema = "event_id long, ts timestamp, user_id string, value double"
    files = [
        [(1, base, "u1", 1.0), (2, base + dt.timedelta(hours=3), "u1", 1.0)],
        [(3, base + dt.timedelta(hours=3, minutes=1), "u1", 1.0)],
        [(4, base + dt.timedelta(minutes=5), "u1", 1.0)],
    ]
    for i, rows in enumerate(files):
        mode = "overwrite" if i == 0 else "append"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(mode).parquet(f"{d}/f1")
        time.sleep(1.1)  # distinct mtimes -> deterministic batch order
    yield f"{d}/f1"
    shutil.rmtree(d, ignore_errors=True)


def test_watermark_drops_late_events_after_eviction(spark, three_batch_dir):
    schema = spark.read.parquet(three_batch_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(three_batch_dir)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    name = "late_data_sink"
    q = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = [(r["ws"], r["n"]) for r in spark.table(name).collect() if r["ws"].hour == 12]
    # exactly one finalized emission for the 12:00 window, without the
    # post-eviction late event
    assert rows == [(dt.datetime(2024, 1, 1, 12, 0), 1)], f"got {rows}"


def test_stream_static_join_enriches_events(spark, sf_dir):
    """Stream-static join: the streaming side joins a static dimension
    (per-user profile built from batch) without state explosion."""
    from urban_traffic_data_lake_project_spark.sources import load_table

    static_users = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.round(F.avg("value"), 4).alias("user_avg_value"))
    )
    stream = sw.read_events_stream(spark, sf_dir)
    enriched = stream.filter(F.col("event_type") == "purchase").join(
        F.broadcast(static_users), "user_id"
    )
    got = sw.run_available_now(
        enriched.select("event_id", "user_id", "user_avg_value"), spark, mode="append"
    )
    batch_n = (
        load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase").count()
    )
    assert got.count() == batch_n
    assert got.filter(F.col("user_avg_value").isNull()).count() == 0


def test_streaming_dedup_removes_duplicates(spark):
    import tempfile as tf

    d = tf.mkdtemp(prefix="stream_dedup_")
    base = dt.datetime(2024, 1, 1, 12, 0)
    rows = [(1, base, "u1", 1.0), (1, base, "u1", 1.0), (2, base, "u2", 2.0)]
    schema = "event_id long, ts timestamp, user_id string, value double"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(f"{d}/f")
    stream = spark.readStream.schema(schema).parquet(f"{d}/f")
    out = sw.run_available_now(sw.streaming_dedup(stream, ["event_id"]), spark)
    assert out.count() == 2
    shutil.rmtree(d, ignore_errors=True)


def test_stream_stream_interval_join_equals_batch_range_join(spark, sf_dir):
    from urban_traffic_data_lake_project_spark.operators.merge import range_join_binned

    stream = sw.read_events_stream(spark, sf_dir)
    clicks_s = stream.filter(F.col("event_type") == "click")
    views_s = stream.filter(F.col("event_type") == "view")
    got = sw.run_available_now(
        sw.stream_stream_interval_join(clicks_s, views_s, "user_id", 600), spark
    )

    from urban_traffic_data_lake_project_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("l_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("r_id"),
        F.col("value").alias("r_value"),
    )
    expected = range_join_binned(clicks, views, ["user_id"], "l_ts", "r_ts", 600).select(
        "user_id", "l_id", "r_id", "l_ts", "r_ts", "r_value"
    )
    g, x = _normalize(got), _normalize(expected)
    assert g.equals(x), (g.shape, x.shape)


def test_dedup_within_watermark_collapses_shifted_redelivery(spark):
    """The property plain dropDuplicates over (key, ts) misses: a
    re-delivery stamped with a FRESH timestamp still collapses, because
    only the key participates in the state lookup."""
    import tempfile as tf

    d = tf.mkdtemp(prefix="stream_dedup_wm_")
    base = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        (1, base, "u1", 1.0),
        (1, base + dt.timedelta(minutes=5), "u1", 1.0),  # shifted re-delivery
        (2, base, "u2", 2.0),
    ]
    schema = "event_id long, ts timestamp, user_id string, value double"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(f"{d}/f")
    stream = spark.readStream.schema(schema).parquet(f"{d}/f")

    plain = sw.run_available_now(
        sw.streaming_dedup(stream, ["event_id"]), spark, mode="append"
    )
    assert plain.count() == 3  # (key, ts) dedup misses the shifted copy

    within = sw.run_available_now(
        sw.streaming_dedup_within_watermark(stream, ["event_id"]), spark, mode="append"
    )
    assert within.count() == 2
    shutil.rmtree(d, ignore_errors=True)


def test_outer_interval_join_emits_unmatched_after_flush(spark):
    """Left-outer stream-stream join on a finite replay: the sentinel-
    flushed reader advances the watermark past the data so the unmatched
    click emits a NULL right side; without the flush it stays buffered."""
    import os as _os
    import tempfile as tf

    d = tf.mkdtemp(prefix="stream_outer_")
    base = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        (1, base, 7, "click", 1.0, None),                          # matched
        (2, base + dt.timedelta(seconds=60), 7, "view", 2.0, None),
        (3, base + dt.timedelta(hours=1), 8, "click", 3.0, None),  # unmatched
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    # collapse the multi-file spark write into the single file the flushed
    # reader stages
    part = [
        f for f in _os.listdir(f"{d}/events.parquet") if f.endswith(".parquet")
    ]
    assert part
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{d}/events.parquet")
    pq.write_table(tbl, f"{d}/events_single.parquet")
    shutil.rmtree(f"{d}/events.parquet")
    _os.rename(f"{d}/events_single.parquet", f"{d}/events.parquet")

    stream = sw.read_events_stream_flushed(spark, d)
    clicks = stream.filter(F.col("event_type") == "click")
    views = stream.filter(F.col("event_type") == "view")
    out = sw.run_available_now(
        sw.stream_stream_interval_join(clicks, views, "user_id", 600, how="left_outer"),
        spark,
    ).filter(F.col("user_id") >= 0)
    got = {(r["l_id"], r["r_id"]) for r in out.collect()}
    assert got == {(1, 2), (3, None)}
    shutil.rmtree(d, ignore_errors=True)


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Kill-and-resume from the SAME checkpoint dir (r11 verdict item 5):
    run one AvailableNow pass over batch 0, stop, land batch 1 (containing
    a fresh-timestamp re-delivery of a batch-0 key), restart from the same
    checkpoint. Exactly-once requires BOTH recoveries: committed offsets
    (batch-0 rows don't re-emit into the durable sink) and the dedup state
    store (the re-delivered key is suppressed across the restart). Output
    must equal the batch oracle over the union of all input files."""
    import datetime as dtm

    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    schema = "event_id long, ts timestamp, user_id string, value double"
    base = dtm.datetime(2024, 1, 1, 12, 0)
    f1 = [
        (1, base, "u1", 1.0),
        (1, base, "u1", 1.0),  # in-batch duplicate
        (2, base + dtm.timedelta(minutes=1), "u2", 2.0),
    ]
    spark.createDataFrame(f1, schema).coalesce(1).write.mode("overwrite").parquet(src)

    def run_pass():
        stream = spark.readStream.schema(schema).parquet(src)
        deduped = stream.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
            ["event_id"]
        )
        q = (
            deduped.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "streaming pass did not finish"

    run_pass()
    # the query object is gone ("crash"); batch 1 arrives while down:
    # event 1 re-delivered with a fresh timestamp + a genuinely new key
    f2 = [
        (1, base + dtm.timedelta(minutes=5), "u1", 1.0),
        (3, base + dtm.timedelta(minutes=2), "u3", 3.0),
    ]
    spark.createDataFrame(f2, schema).coalesce(1).write.mode("append").parquet(src)
    run_pass()

    got = sorted(r["event_id"] for r in spark.read.parquet(sink).collect())
    oracle = sorted(
        r["event_id"]
        for r in spark.read.parquet(src).dropDuplicates(["event_id"]).collect()
    )
    assert got == oracle == [1, 2, 3]
