"""Layer/catalog utilities (reference S5-S8, SURVEY.md §2.1).

The reference shuttles bytes between MinIO buckets and HDFS with bespoke
copy loops (copy_raw_to_bronze.py, copy_to_hdfs.py); Spark addresses any
store directly via the path scheme (``file://``, ``s3a://bucket/...``,
``hdfs://nn/...``), so "copy to another store" is a one-line read->write
and bucket bootstrap is directory/database creation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

LAYERS = ("bronze", "silver", "gold")


def ensure_layers(base: str) -> dict[str, str]:
    """Create the medallion layer namespaces (reference create_buckets.py:17-25).
    For object stores the 'directory' is a key prefix — creation is a no-op."""
    paths = {layer: os.path.join(base, layer) for layer in LAYERS}
    if "://" not in base or base.startswith("file://"):
        for p in paths.values():
            os.makedirs(p.removeprefix("file://"), exist_ok=True)
    return paths


def list_layer_tables(spark: SparkSession, layer_path: str) -> list[str]:
    """Names of parquet tables in a layer (reference list_objects loops,
    copy_to_hdfs.py:112-114 / notebook cells 3-4)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(layer_path)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return []
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(path)
        if st.isDirectory() or st.getPath().getName().endswith(".parquet")
    )


def cross_store_copy(spark: SparkSession, src: str, dst: str) -> None:
    """The reference's MinIO->HDFS copy step (copy_to_hdfs.py:109-142) as a
    single distributed read->write; works across any two supported
    filesystems, preserving schema."""
    spark.read.parquet(src).write.mode("overwrite").parquet(dst)


def dual_write(df: DataFrame, primary: str, secondary: str | None = None) -> None:
    """The reference's local+MinIO dual write (clean_traffic.py:133-146).
    At scale prefer ONE authoritative location; the second write is opt-in."""
    df.write.mode("overwrite").parquet(primary)
    if secondary:
        df.write.mode("overwrite").parquet(secondary)
