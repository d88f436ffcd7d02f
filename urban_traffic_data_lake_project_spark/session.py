"""SparkSession factory.

Local runs use ``local[$SPARK_GRAFT_CPUS]`` (default all cores); the same
config block is what we would ship to a 1000-executor cluster: AQE on
(runtime re-planning, skew-join splitting, partition coalescing), explicit
shuffle partitioning, Arrow for the few pandas-UDF operators, UTC session
time zone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # Catalyst / AQE: let the optimizer re-plan at runtime. At 100 TB the
    # static plan is always wrong somewhere — AQE coalesces post-shuffle
    # partitions, converts sort-merge to broadcast when a side turns out
    # small, and splits skewed partitions.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Broadcast anything under 64 MB — dimension tables (region, nation,
    # supplier, scenario specs, fitted-stats rows) never shuffle.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow transfer for pandas UDFs (factor scoring, multimodal decode).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics, matching the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Parquet TIMESTAMP(NANOS) (events.ts) is otherwise PARQUET_TYPE_ILLEGAL;
    # read as long and convert to micros in sources.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # NOTE: r6 globally excluded InferFiltersFromGenerate because the
    # rule's inferred `size(e) > 0 AND isnotnull(e)` below every explode
    # was substituted through the similarity family's chunked fold
    # projections (1.6 MB filter expressions, driver OOM) — a blunt
    # engine-wide tax on every explode-heavy query to fix a
    # similarity-only hazard (ADVICE r6). r7 removed the exclusion: the
    # similarity family's exploded arrays are now produced by vectorized
    # Arrow stages (operators/similarity.py), and predicate pushdown
    # cannot substitute through a Python map node, so the hazard is
    # structurally gone (plan-size + subprocess codegen tests enforce it).
    # ~128 MB input splits: good parquet scan granularity at any scale.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Don't let tiny files explode the task count on small SFs.
    "spark.sql.files.openCostInBytes": str(4 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


import threading
from contextlib import contextmanager

from pyspark.errors import SparkNoSuchElementException

_EXCLUDED_RULES_LOCK = threading.Lock()
# unset confs raise SparkNoSuchElementException (SQL_CONF_NOT_FOUND) in
# PySpark 4; KeyError covers testing doubles
_MISSING_CONF_ERRORS = (SparkNoSuchElementException, KeyError)


@contextmanager
def excluded_optimizer_rules(spark: SparkSession, *rules: str):
    """Scope a Catalyst-rule exclusion around one query's planning.

    Rule exclusions never change results (every excludable rule is a
    semantics-preserving rewrite), so this is a pure planning knob. Used
    where a rule is a measured pessimization for ONE plan shape — e.g.
    ``InferFiltersFromGenerate`` under DSIR's fit explode, where the
    inferred ``size(e) > 0 AND isnotnull(e)`` is substituted through the
    defining Project and re-evaluates the whole hashed-gram ``transform``
    chain per row in a filter that prunes nothing (the gram array is never
    null). r6 excluded that rule engine-wide — a blunt tax on every
    explode; this context keeps the exclusion scoped to the plan that
    needs it. The conf is read at optimization time, so wrapping the
    action (collect/write) is sufficient.

    CONCURRENCY (ADVICE r8): the exclusion mutates the SESSION-wide conf,
    so a query planned concurrently on another thread of the same
    SparkSession also loses the rule while the context is open. A lock
    serializes concurrent *uses of this context* against each other
    (nested/parallel contexts can no longer clobber each other's
    restore); a thread planning OUTSIDE any context still sees the
    temporary exclusion — acceptable because exclusions are
    semantics-preserving (plan shape, never results). Cross-session
    isolation would need ``spark.newSession()`` per thread.
    """
    key = "spark.sql.optimizer.excludedRules"
    with _EXCLUDED_RULES_LOCK:
        try:
            prev = spark.conf.get(key)
        except _MISSING_CONF_ERRORS:
            # missing key only — a transient RPC/session failure must
            # raise, not masquerade as prev=None and clobber a user-set
            # exclusion list on exit (ADVICE r8)
            prev = None
        merged = ",".join(([prev] if prev else []) + list(rules))
        spark.conf.set(key, merged)
        try:
            yield
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)


def get_spark(
    app_name: str = "urban-traffic-data-lake-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]``; on a real cluster
    the caller passes ``yarn``/``k8s://...`` and the same tuning applies.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
