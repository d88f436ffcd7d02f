"""Structured Streaming surface (SURVEY.md §2.9 — net-new: the reference is
batch-only). Event-time windows, watermarks + late-data handling, stateful
streaming dedup over the ``events`` table.

Batch equivalence is the correctness contract: each streaming query here is
the ``readStream`` form of a batch query in queries/windows.py, executed
with ``Trigger.AvailableNow`` into a memory sink and compared against the
batch result (tests/test_streaming.py). At scale the same plans run against
Kafka/file streams with real triggers — watermark state bounds memory.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from urban_traffic_data_lake_project_spark.sources.tables import normalize_event_ts

_sink_counter = itertools.count()


def events_schema_and_path(spark: SparkSession, sf_dir: str) -> tuple:
    """File streams need an explicit schema; reuse the batch reader's."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    return spark.read.parquet(path).schema, path


def read_table_stream(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """File stream over any testdata table (schema from the batch reader).
    The streaming analogue of ``sources.load_table``; event-time columns
    get the same representation normalization (``normalize_event_ts``)."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    schema = spark.read.parquet(path).schema
    if os.path.isfile(path):
        path = path[:-1] + f"[{path[-1]}]"  # see read_events_stream
    df = spark.readStream.schema(schema).parquet(path)
    return normalize_event_ts(df, "ts")


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    schema, path = events_schema_and_path(spark, sf_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        # FileStreamSource requires a directory; turn the literal file path
        # into a glob over its parent ("x.parquet" -> "x.parque[t]") so the
        # source treats the parent as base and matches exactly this file.
        path = path[:-1] + f"[{path[-1]}]"
    df = reader.parquet(path)
    # events.ts arrives as nanos-long or TIMESTAMP_NTZ depending on the
    # testdata generation — normalize to TIMESTAMP (see sources.tables);
    # withWatermark hard-rejects NTZ event-time columns.
    return normalize_event_ts(df, "ts")


def tumbling_counts(stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Streaming form of queries/windows.py::win_tumbling_events."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def sliding_counts(
    stream: DataFrame, window: str = "1 hour", slide: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming form of queries/windows.py::win_sliding_events."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts(stream: DataFrame, gap: str = "10 minutes", watermark: str = "2 hours") -> DataFrame:
    """Streaming session windows (stateful merge of gap-close events)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    window_seconds: int = 600,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join with an event-time interval condition:
    pair left rows with right rows of the same ``by`` key whose timestamp
    lies within ±``window_seconds``. BOTH sides carry watermarks and the
    join condition bounds the time skew, so Spark can evict buffered state
    once the watermark passes — the state-bounding contract stream-stream
    joins require (an unbounded-condition join would buffer both streams
    forever). Batch oracle: operators.merge.range_join_binned."""
    l = left.select(
        F.col(by).alias("__k"), F.col("ts").alias("l_ts"), F.col("event_id").alias("l_id")
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(by).alias("__rk"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_id"), F.col("value").alias("r_value"),
    ).withWatermark("r_ts", watermark)
    cond = (
        (F.col("__k") == F.col("__rk"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {window_seconds} SECONDS"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )
    # left_outer additionally emits unmatched left rows (NULL right side)
    # once the watermark passes l_ts + window — the state-eviction point;
    # the interval condition is what makes the outer form legal at all.
    return l.join(r, cond, how).select(
        F.col("__k").alias("user_id"), "l_id", "r_id", "l_ts", "r_ts", "r_value"
    )


def streaming_dedup(stream: DataFrame, keys: list[str], watermark: str = "1 hour") -> DataFrame:
    """Stateful exactly-once dedup within the watermark horizon."""
    return stream.withWatermark("ts", watermark).dropDuplicates([*keys, "ts"])


def run_available_now(
    result: DataFrame, spark: SparkSession, timeout_sec: int = 120, mode: str | None = None
) -> DataFrame:
    """Execute a streaming DataFrame to completion over all available input
    (Trigger.AvailableNow) into a memory sink; return the materialized
    result as a batch DataFrame.

    ``mode`` overrides the output-mode heuristic — needed e.g. for
    stream-static joins, where the static side may contain an Aggregate
    node but the streaming side has none (append is correct there)."""
    name = f"stream_sink_{next(_sink_counter)}"
    if mode is None:
        mode = "complete" if result.isStreaming and _has_aggregation(result) else "append"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        # Fresh per-query checkpoint subdir (the counter in `name`) under a
        # RAM-backed per-process root: a memory-sink AvailableNow drain is
        # ephemeral by construction, so its offset/commit logs don't need
        # durable storage — tmpfs skips the per-micro-batch fsyncs of the
        # HDFS metadata log (r12 verdict item 8, streaming lifecycle
        # floor). Never reused across runs — exactly-once state is per
        # drain, same as the default temp checkpoint this replaces.
        .option("checkpointLocation", os.path.join(_checkpoint_root(), name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return spark.table(name)


_CKPT_ROOT: str | None = None


def _checkpoint_root() -> str:
    """Per-process checkpoint root for memory-sink drains, on tmpfs when
    available (cleaned at exit)."""
    global _CKPT_ROOT
    if _CKPT_ROOT is None:
        import atexit
        import shutil
        import tempfile

        base = "/dev/shm" if os.path.isdir("/dev/shm") and os.access(
            "/dev/shm", os.W_OK
        ) else tempfile.gettempdir()
        _CKPT_ROOT = tempfile.mkdtemp(prefix="spark_graft_ckpt_", dir=base)
        atexit.register(shutil.rmtree, _CKPT_ROOT, True)
    return _CKPT_ROOT


def _has_aggregation(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().logical().toString()
    return "Aggregate" in plan


def streaming_dedup_within_watermark(
    stream: DataFrame, keys: list[str], watermark: str = "1 hour"
) -> DataFrame:
    """Exactly-once dedup with BOUNDED state and no timestamp in the key:
    ``dropDuplicatesWithinWatermark`` keeps one state entry per key only
    until the watermark passes, so re-deliveries within the delay collapse
    while state stays O(keys in the horizon) — the production shape for
    at-least-once sources, where ``dropDuplicates`` over (key, ts) would
    miss re-deliveries stamped with a fresh timestamp. First sight emits
    immediately (append mode), so no end-of-stream flush is needed."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def read_events_stream_flushed(
    spark: SparkSession, sf_dir: str, horizon_hours: int = 4
) -> DataFrame:
    """The events file stream plus one far-future SENTINEL row per
    event_type (user_id = -1), staged so the sentinels arrive in a later
    microbatch and drive the watermark past every real row. Append-mode
    operators whose output waits on the watermark — stream-stream OUTER
    joins, final event-time windows — can then flush under AvailableNow.

    A real deployment never needs this: its stream doesn't end, so the
    watermark keeps advancing with live traffic. It is the harness that
    gives a FINITE replay the same property. Downstream must drop rows
    with user_id < 0."""
    import tempfile
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "events.parquet")
    staged = tempfile.mkdtemp(prefix="spark_graft_flush_")
    data_path = os.path.join(staged, "000_events.parquet")

    # restage at TIMESTAMP(MICROS): the source may carry nanos (either as
    # legacy raw INT64 or Parquet NANOS), which Spark's batch inference
    # and the streaming reader can map to DIFFERENT types; a single
    # explicit precision keeps the two staged files and the stream schema
    # agreeing. Micros is Spark's native resolution (same div-1000 the
    # batch loader applies to nano longs).
    tbl = pq.read_table(src)
    i = tbl.schema.get_field_index("ts")
    f = tbl.schema.field(i)
    if pa.types.is_timestamp(f.type) and f.type.unit != "us":
        t = pa.timestamp("us", f.type.tz)
        tbl = tbl.set_column(i, pa.field("ts", t), tbl.column("ts").cast(t))
    elif pa.types.is_integer(f.type):
        # epoch-nanos as a raw long (legacy generation)
        t = pa.timestamp("us")
        ns = pa.compute.divide(tbl.column("ts"), 1000)
        tbl = tbl.set_column(i, pa.field("ts", t), ns.cast(t))
    pq.write_table(tbl, data_path)
    max_ts = pa.compute.max(tbl.column("ts").combine_chunks()).as_py()
    names = tbl.schema.names
    sentinels = []
    for i, etype in enumerate(("click", "view")):
        row = {}
        for name in names:
            if name == "event_id":
                row[name] = -1 - i
            elif name == "ts":
                # separated by > any join window so sentinels never pair
                row[name] = max_ts + __import__("datetime").timedelta(
                    hours=horizon_hours + i
                )
            elif name == "user_id":
                row[name] = -1 - i
            elif name == "event_type":
                row[name] = etype
            else:
                row[name] = None
        sentinels.append(row)
    sent_tbl = pa.Table.from_pylist(sentinels, schema=tbl.schema)
    sent_path = os.path.join(staged, "999_sentinel.parquet")
    pq.write_table(sent_tbl, sent_path)
    # FileStreamSource orders by modification time; make the ordering
    # unambiguous so maxFilesPerTrigger=1 puts the sentinel batch last
    now = _time.time()
    os.utime(data_path, (now - 60, now - 60))
    os.utime(sent_path, (now, now))

    schema = spark.read.parquet(data_path).schema
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    return normalize_event_ts(df, "ts")
