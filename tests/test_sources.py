"""Layer/catalog utilities: ensure, list, cross-store copy, dual write."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from urban_traffic_data_lake_project_spark.sources import catalog as cat
from urban_traffic_data_lake_project_spark.sources import load_table


@pytest.fixture()
def tmpbase():
    d = tempfile.mkdtemp(prefix="layers_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_ensure_layers_creates_namespaces(tmpbase):
    paths = cat.ensure_layers(tmpbase)
    assert set(paths) == {"bronze", "silver", "gold"}
    assert all(os.path.isdir(p) for p in paths.values())


def test_cross_store_copy_and_listing(spark, sf_dir, tmpbase):
    paths = cat.ensure_layers(tmpbase)
    src = f"{sf_dir}/nation.parquet"
    dst = os.path.join(paths["silver"], "nation")
    cat.cross_store_copy(spark, src, dst)
    assert spark.read.parquet(dst).count() == load_table(spark, sf_dir, "nation").count()
    assert cat.list_layer_tables(spark, paths["silver"]) == ["nation"]
    assert cat.list_layer_tables(spark, paths["gold"]) == []


def test_json_and_orc_round_trip(spark, sf_dir, tmpbase):
    """Source-format breadth: JSON-lines and ORC round-trip with schema
    preserved (CSV is exercised by the bronze layer, parquet everywhere)."""
    events = load_table(spark, sf_dir, "events").limit(200)
    jp, op = os.path.join(tmpbase, "events_json"), os.path.join(tmpbase, "events_orc")
    events.write.mode("overwrite").json(jp)
    events.write.mode("overwrite").orc(op)
    back_j = spark.read.schema(events.schema).json(jp)
    back_o = spark.read.orc(op)
    assert back_j.count() == back_o.count() == 200
    assert back_o.schema == events.schema
    # values survive the round trip
    a = sorted(r["event_id"] for r in events.collect())
    assert sorted(r["event_id"] for r in back_j.collect()) == a
    assert sorted(r["event_id"] for r in back_o.collect()) == a


def test_event_ts_normalized_across_representations(spark, sf_dir):
    """events.ts has shipped as epoch-nanos BIGINT (nanosAsLong) and as
    TIMESTAMP_NTZ (micros without isAdjustedToUTC) across testdata
    generations; the loader must coerce every representation to plain
    TIMESTAMP — withWatermark/unix_micros hard-reject NTZ — and all three
    must decode to the same instants under the UTC session zone."""
    from urban_traffic_data_lake_project_spark.sources.tables import normalize_event_ts

    assert dict(load_table(spark, sf_dir, "events").dtypes)["ts"] == "timestamp"

    micros = [1704067200_000_000, 1704070800_500_000]  # 2024-01-01 00:00/01:00 UTC
    as_bigint = spark.createDataFrame(
        [(m * 1000,) for m in micros], "ts bigint"
    )
    as_ntz = spark.createDataFrame([(m,) for m in micros], "ts bigint").select(
        F.timestamp_micros(F.col("ts")).cast("timestamp_ntz").alias("ts")
    )
    as_ts = spark.createDataFrame([(m,) for m in micros], "ts bigint").select(
        F.timestamp_micros(F.col("ts")).alias("ts")
    )
    outs = []
    for df in (as_bigint, as_ntz, as_ts):
        norm = normalize_event_ts(df, "ts")
        assert dict(norm.dtypes)["ts"] == "timestamp"
        outs.append(sorted(r["ts"] for r in norm.collect()))
    assert outs[0] == outs[1] == outs[2]


def test_events_stream_ts_is_watermarkable(spark, sf_dir):
    """The streaming reader applies the same normalization — a watermark
    on ts must analyze regardless of the on-disk representation."""
    from urban_traffic_data_lake_project_spark.streaming.windows import read_events_stream

    stream = read_events_stream(spark, sf_dir)
    assert dict(stream.dtypes)["ts"] == "timestamp"
    stream.withWatermark("ts", "1 hour")  # raises AnalysisException on NTZ


def test_dual_write(spark, sf_dir, tmpbase):
    region = load_table(spark, sf_dir, "region")
    a, b = os.path.join(tmpbase, "a"), os.path.join(tmpbase, "b")
    cat.dual_write(region, a, b)
    assert spark.read.parquet(a).count() == spark.read.parquet(b).count() == region.count()


def test_write_compacted_targets_file_size(spark, sf_dir, tmp_path):
    from urban_traffic_data_lake_project_spark.sources.writers import write_compacted

    li = load_table(spark, sf_dir, "lineitem").repartition(64)  # small-files shape
    path = str(tmp_path / "compacted")
    n = write_compacted(li, path, target_file_bytes=512 << 10)
    import glob

    files = glob.glob(f"{path}/*.parquet")
    assert len(files) == n and n < 64  # compacted well below input partitioning
    back = spark.read.parquet(path)
    assert back.count() == li.count()


def test_write_compacted_empty_input(spark, tmp_path):
    from urban_traffic_data_lake_project_spark.sources.writers import write_compacted

    empty = spark.range(0).selectExpr("id", "CAST(id AS STRING) AS s")
    path = str(tmp_path / "empty")
    assert write_compacted(empty, path) == 1
    assert spark.read.parquet(path).count() == 0


def test_write_sorted_files_cover_disjoint_ranges(spark, sf_dir, tmp_path):
    """Range layout contract, checked against the actual parquet metadata:
    each output file's [min, max] for the sort key must be disjoint from
    every other file's — that disjointness is what lets a range predicate
    skip whole files/row groups at 100 TB."""
    import glob

    import pyarrow.parquet as pq

    from urban_traffic_data_lake_project_spark.sources.writers import write_sorted

    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "sorted")
    write_sorted(li, path, ["l_shipdate"], n_files=4)

    spans = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("l_shipdate")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    assert len(spans) >= 2
    for (lo_a, hi_a), (lo_b, hi_b) in zip(spans, spans[1:]):
        assert hi_a <= lo_b, f"file ranges overlap: {hi_a} > {lo_b}"
    # and the data round-trips
    assert spark.read.parquet(path).count() == li.count()


def test_write_zordered_files_cluster_both_dimensions(spark, tmp_path):
    """Z-order contract: every output file covers a compact rectangle in
    BOTH dimensions (a single-key sort leaves the second dimension
    spanning the full range), verified from actual parquet footer stats."""
    import glob

    import pyarrow.parquet as pq

    from urban_traffic_data_lake_project_spark.sources.writers import (
        write_sorted,
        write_zordered,
    )

    df = spark.range(20000).select(
        (F.pmod(F.col("id") * 7919, F.lit(20000)) / 20000.0).alias("x"),
        (F.pmod(F.col("id") * 104729, F.lit(20000)) / 20000.0).alias("y"),
    )

    def spans(path, col):
        out = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            st = [md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)]
            out.append(max(s.max for s in st) - min(s.min for s in st))
        return out

    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, "x", "y", n_files=16)
    x_spans, y_spans = spans(zpath, "x"), spans(zpath, "y")
    # 16 z-slices over 2D -> ~quarter-range rectangles; allow slack for
    # sample-based range boundaries
    assert sum(x_spans) / len(x_spans) < 0.55
    assert sum(y_spans) / len(y_spans) < 0.55

    spath = str(tmp_path / "xsorted")
    write_sorted(df, spath, ["x"], n_files=16)
    # single-key sort clusters x tightly but leaves y unclustered
    assert sum(spans(spath, "x")) / 16 < 0.2
    assert sum(spans(spath, "y")) / 16 > 0.9
    assert spark.read.parquet(zpath).count() == 20000


def test_parquet_schema_evolution_merge(spark, sf_dir, tmp_path):
    """Schema evolution on the lake path: files written before a column
    existed still read alongside new files (mergeSchema), old rows
    surfacing NULL for the added column — the append-only evolution rule
    a medallion silver layer needs."""
    from pyspark.sql import functions as F

    from urban_traffic_data_lake_project_spark.sources import load_table

    path = str(tmp_path / "evolving")
    v1 = load_table(spark, sf_dir, "region")
    v1.write.mode("append").parquet(path)
    v2 = v1.withColumn("ingest_tag", F.lit("batch2"))
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "ingest_tag" in merged.columns
    n = v1.count()
    assert merged.count() == 2 * n
    assert merged.filter(F.col("ingest_tag").isNull()).count() == n
    assert merged.filter(F.col("ingest_tag") == "batch2").count() == n


def test_python_datasource_partition_parallel(spark):
    """The custom source's partitions() ranges must tile [0, rows) exactly
    once — verified by distinct-count and id coverage — and respect the
    requested partition count in the scan."""
    from urban_traffic_data_lake_project_spark.sources.pyds import (
        SyntheticTrafficDataSource,
    )

    spark.dataSource.register(SyntheticTrafficDataSource)
    df = (
        spark.read.format("synthetic_traffic")
        .option("rows", 101)
        .option("partitions", 7)
        .load()
    )
    assert df.rdd.getNumPartitions() == 7
    ids = sorted(r["reading_id"] for r in df.collect())
    assert ids == list(range(101))


def test_python_datasource_stream_equals_batch(spark):
    """The streaming form of the custom source, replayed with
    AvailableNow in microbatches, must equal the batch read — batch
    boundaries only partition the same deterministic id->row mapping."""
    import time

    from urban_traffic_data_lake_project_spark.sources.pyds import (
        SyntheticTrafficDataSource,
    )

    spark.dataSource.register(SyntheticTrafficDataSource)
    stream = (
        spark.readStream.format("synthetic_traffic")
        .option("rows", 500)
        .option("batch_rows", 120)
        .load()
    )
    # a Simple stream reader prefetches one batch per trigger, so
    # AvailableNow would stop after the first prefetch — drive a
    # continuous trigger and stop once the source is exhausted
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_stream_test")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("pyds_stream_test").count() >= 500:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.table("pyds_stream_test")
    batch = spark.read.format("synthetic_traffic").option("rows", 500).load()
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert g == b and len(g) == 500


def test_spread_to_parallelism_is_noop_on_presplit_input(spark):
    """An input already at (or above) the cluster's default parallelism
    must pass through UNTOUCHED — no RoundRobinPartitioning Exchange in
    the physical plan. At 100 TB every scan has plenty of splits, so the
    convoy-avoidance shuffle must never fire there (r11 verdict item 3);
    an under-partitioned input still gets spread."""
    from urban_traffic_data_lake_project_spark.sources import spread_to_parallelism

    target = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000).repartition(target + 4)
    out = spread_to_parallelism(wide)
    assert out is wide  # identity: no new plan node, no RoundRobin Exchange

    narrow = spark.range(0, 100).coalesce(1)
    spread = spread_to_parallelism(narrow)
    assert spread.rdd.getNumPartitions() == target
