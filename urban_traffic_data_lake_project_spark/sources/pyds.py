"""Custom Python data source (Spark 4 DataSource V2 Python API) — the
extension point that replaces the reference's driver-side generator
scripts (python-service/scripts/generate_traffic_data.py:128) with a
DISTRIBUTED source: each InputPartition generates its id-range inside an
executor, so a 10^12-row synthetic corpus never touches the driver.

Values are md5-derived (the same first-15-hex-digits construction as
``functions.stable_hash64``), so every generated cell has a bit-identical
ANSI-SQL formulation and the source's OUTPUT — not just its plumbing —
is oracle-checkable.

Usage:
    spark.dataSource.register(SyntheticTrafficDataSource)
    spark.read.format("synthetic_traffic")
         .option("rows", 2000).option("partitions", 8).load()
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_SCHEMA = (
    "reading_id bigint, sensor_id int, speed_kmh double, vehicle_count int"
)


def _h(salt: str, i: int) -> int:
    """First 15 hex digits of md5(f"{salt}{i}") — stable_hash64's exact
    arithmetic, Python-side."""
    return int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:15], 16)


class SyntheticTrafficDataSource(DataSource):
    """Deterministic synthetic traffic readings, partition-parallel."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_traffic"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "SyntheticTrafficReader":
        return SyntheticTrafficReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticTrafficStreamReader":
        return SyntheticTrafficStreamReader(self.options)


class SyntheticTrafficReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):
        per = max(1, -(-self.rows // self.num_partitions))  # ceil div
        return [
            InputPartition((start, min(start + per, self.rows)))
            for start in range(0, self.rows, per)
        ]

    def read(self, partition: InputPartition):
        start, end = partition.value
        for i in range(start, end):
            yield (
                i,
                i % 50,
                (_h("sp|", i) % 1200) / 10.0,
                _h("vc|", i) % 300,
            )


class SyntheticTrafficStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the same deterministic generator: offsets are
    row ids, each microbatch emits the next ``batch_rows`` ids until
    ``rows`` is exhausted. Because batch boundaries only partition the
    SAME deterministic id->row mapping, an AvailableNow replay of the
    stream equals the batch read exactly — the equivalence the streaming
    tests assert for every other source here."""

    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 1000))
        self.batch_rows = int(options.get("batch_rows", 250))

    def initialOffset(self) -> dict:
        return {"next": 0}

    @staticmethod
    def _rows_for(lo: int, hi: int) -> list:
        # a LIST, not a generator: the rows are pickled to executors
        return [
            (i, i % 50, (_h("sp|", i) % 1200) / 10.0, _h("vc|", i) % 300)
            for i in range(lo, hi)
        ]

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch_rows, self.rows)
        return self._rows_for(lo, hi), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows_for(start["next"], end["next"])
