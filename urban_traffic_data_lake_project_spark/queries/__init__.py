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
# registration order. Every oracle query has at least one driver-recorded
# green row; the rotation policy is freshness-first (since r6): the
# window carries (a) the entire least-recently-recorded vintage — after
# the r7 recording that is the 26 r4-vintage queries, (b) every
# never-recorded query (the r8-borns), and (c) changed-THIS-round
# implementations — round 8 touched the DSIR fit (scoped
# InferFiltersFromGenerate exclusion), temperature mixing (pow-rounding
# parity), the trained persisted IVF-PQ (hash-sampled k-means), the
# Arrow scorers' id dtype derivation (cosine_topk_ivf /
# dedup_embedding_cosine reps), and the Matryoshka rerank (IVF-composed
# prefilter). Remaining slots prepay the next-oldest (r5) vintage,
# doubling as sentinels: the two historically driver-red queries
# (text_boilerplate_lines, quality_expectations), the curation flagship,
# and the heavy sketch/lakehouse/stream reps. The rest of the r5 vintage
# is covered by this round's full check_oracle --strict sweep. The
# freshness contract is enforced by
# tests/test_core_queries.py::test_registry_driver_window_contract,
# which since r8 discovers recorded rounds by GLOB (no hardcoded round
# list to rot). Full ledger: COVERAGE.md.
RECORD_WINDOW: tuple[str, ...] = (
    # (a) the full r4 vintage — least-recently-recorded queries alive
    "agg_incremental_maintenance",
    "agg_mad_pandas_udaf",
    "audio_features",
    "audio_frame_energy",
    "core_histogram",
    "dedup_containment",
    "dedup_substring_spans",
    "events_anomaly_zscore",
    "gif_frame_index",
    "image_near_dup",
    "join_fuzzy_blocked",
    "merge_asof_directions",
    "merge_interval_overlap",
    "privacy_k_anonymity",
    "scd2_user_history",
    "stream_bounded_recent_stats",
    "stream_dedup_redelivery",
    "stream_interval_join_outer",
    "stream_static_enrich",
    "text_bigram_logprob",
    "text_bpe_tokens",
    "text_inverted_index",
    "text_strip_markup",
    "udtf_keyword_context",
    "win_funnel_steps",
    "win_time_range_rolling",
    # (b) born in round 8, never recorded (filled as queries land)
    "sim_matryoshka_ivf",
    "sim_int8_rerank",
    "sim_ivfpq_index_filtered",
    "text_bpe_train",
    "text_bpe_encode",
    # (c) changed in round 8 — one representative per touched plan shape
    "sample_dsir",
    "sample_temperature_mix",
    "sim_ivfpq_index_trained",
    "sim_cosine_topk_ivf",
    "dedup_embedding_cosine",
    "sim_matryoshka_rerank",
    # (d) r5-vintage prepay + sentinels (historic reds, heavy reps)
    "text_boilerplate_lines",
    "quality_expectations",
    "sketch_cm_heavy_hitters",
    "curation_pipeline",
    "dedup_embedding_srp",
    "lakehouse_merge_upsert",
    "lakehouse_time_travel",
    "core_join_snowflake",
    "text_bm25_topk",
    "events_drift_psi",
    "ml_naive_bayes_lang",
    "variant_extract_events",
    "stream_dedup_within_watermark",
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
