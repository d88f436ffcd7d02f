"""Named query registry — the driver contract surface.

``REGISTRY`` maps query name -> QuerySpec (Spark fn + DuckDB oracle SQL).
Submodules group queries by domain; this module just assembles them.
"""

from __future__ import annotations

from urban_traffic_data_lake_project_spark.queries import (
    analytics,
    cleaning,
    core,
    curation,
    lakehouse,
    llm,
    scalars,
    windows,
)
from urban_traffic_data_lake_project_spark.queries.base import QuerySpec

# The driver's correctness gate records the FIRST ~50 oracle entries in
# registration order. Round-5 rotation policy: the window carries (a)
# every oracle query that has NEVER had a driver-recorded row in rounds
# 1-4 — the 25-query r4 in-session overflow — (b) the two r4 hash-red
# queries (text_boilerplate_lines, quality_expectations) whose
# env-hardened oracles must re-record green, and (c) sentinels recorded
# green in earlier rounds, prioritizing queries whose CODE was edited
# this round (IRLS caching/clamp, KMV null handling, CM materialize,
# bucketed-join fingerprint, versioned-profile cache, SRP auto-bands)
# plus one canary per operator family. Everything else is
# driver-recorded in a prior CORRECTNESS file and stays verified every
# round by tools/check_oracle.py (now with --strict dtype-kind parity)
# and the per-module pytest oracle parametrizations. The full
# round-by-round recording ledger lives in COVERAGE.md.
RECORD_WINDOW: tuple[str, ...] = (
    # (a) never driver-recorded in r1-r4 — the r4 in-session overflow
    "core_equidepth_histogram",
    "join_bucketed_colocated",
    "source_python_datasource",
    "ml_naive_bayes_lang",
    "text_zipf_fit",
    "sim_ivf_recall",
    "sim_pq_recall",
    "sample_leakage_safe_split",
    "dedup_cluster_sizes",
    "stream_dedup_within_watermark",
    "variant_extract_events",
    "events_markov_transitions",
    "analytics_rfm_segments",
    "events_cooccurrence_lift",
    "events_seasonality",
    "table_diff_unkeyed",
    "ml_logistic_irls",
    "events_drift_psi",
    "events_cohort_retention",
    "profile_functional_deps",
    "sketch_kmv_rollup",
    "corpus_datacard",
    "sketch_cm_heavy_hitters",
    "curation_source_quality",
    "lakehouse_cdc_diff",
    # (a continued) born this round, never recorded: the auto-banded SRP
    # whose oracle replays the band chooser, and the AVI container walk
    "dedup_embedding_srp_auto",
    "video_frame_index",
    # (b) r4 hash-red, fixed this round — must re-record green
    "text_boilerplate_lines",
    "quality_expectations",
    # (c) sentinels — recorded green in earlier rounds. First the queries
    # whose implementation changed in round 5 (regression proof for the
    # edits), then one canary per family; the r3-red NTZ trio stays.
    "lakehouse_time_travel",
    "lakehouse_merge_upsert",
    "dedup_embedding_srp",
    "sketch_kmv_setops",
    "sketch_hist_quantiles",
    "stream_sketch_quantiles",
    "text_profile",
    "curation_pipeline",
    "merge_range_join",
    "stream_interval_join",
    "stream_tumbling_available_now",
    "core_pricing_summary",
    "core_grand_aggs",
    "core_join_snowflake",
    "win_ewma",
    "win_resample_ffill",
    "text_bm25_topk",
    "sim_cosine_topk_ivf_trained",
    "decontam_embedding",
    "multimodal_pixels",
    "udf_surface",
)


def _assemble() -> dict[str, QuerySpec]:
    registry: dict[str, QuerySpec] = {}
    for m in (core, cleaning, llm, windows, analytics, scalars, curation, lakehouse):
        overlap = registry.keys() & m.REGISTRY.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        registry.update(m.REGISTRY)
    missing = [n for n in RECORD_WINDOW if n not in registry]
    if missing:
        raise ValueError(f"RECORD_WINDOW names not in registry: {missing}")
    window_index = {n: i for i, n in enumerate(RECORD_WINDOW)}

    # Window queries FIRST (stable order), then remaining oracle-backed
    # queries (locally verified), then rows-only (stochastic/ML) specs.
    def _key(kv: tuple[str, QuerySpec]):
        if kv[0] in window_index:
            return (0, window_index[kv[0]])
        return (2, 0) if kv[1].oracle is None else (1, 0)

    return dict(sorted(registry.items(), key=_key))


REGISTRY: dict[str, QuerySpec] = _assemble()

__all__ = ["RECORD_WINDOW", "REGISTRY", "QuerySpec"]
