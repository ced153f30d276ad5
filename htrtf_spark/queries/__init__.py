"""Registry of (Spark query, DuckDB oracle SQL) pairs for the driver gate.

Each module exports ``QUERIES: dict[name, (fn, sql|None)]`` where ``fn``
takes (spark, sf_dir) → DataFrame and ``sql`` is the ANSI-SQL equivalent
DuckDB runs on the same parquet (views pre-registered by the driver).
``sql=None`` marks genuinely non-SQL-expressible ops (rows-only check).

Parity rules used throughout (so value-hash comparisons can't flake):
- money/measure doubles are converted to exact integer cents ONCE per row
  (CAST(ROUND(x*100) AS BIGINT)) and aggregated in integer domain;
- every computed column is aliased identically on both sides;
- every ORDER BY ... LIMIT is totally tie-broken;
- ratios are returned as basis points (bigint), never raw doubles.
"""

from __future__ import annotations

from htrtf_spark.queries import (
    augment_queries,
    dedup,
    extraction_queries,
    pipeline_queries,
    relational,
    relational2,
    relational3,
    relational4,
    textops,
    textops2,
    training_pipeline,
    vectors,
    vectors2,
)

_MODULES = [
    relational,
    relational2,
    relational3,
    relational4,
    textops,
    textops2,
    dedup,
    vectors,
    vectors2,
    extraction_queries,
    pipeline_queries,
    augment_queries,
    training_pipeline,
]


# The driver's correctness gate iterates queries() in dict insertion
# order and may stop early under a global budget (round 1 recorded
# exactly the first 50 of 65). Queries with no recorded row yet run
# FIRST so every operator accumulates a driver-verified row; newly
# added queries are prioritized the same way each round.
_RUN_FIRST = [
    # new this round (round 6): no driver row exists yet
    "q101_training_corpus_stripped",
    "q102_url_stats",
    "q103_top_domains",
    "q104_line_dedup",
    "q105_tfidf_topk",
    "q106_blocked_domains",
    # only remaining r3-vintage driver row (VERDICT r5 #3: lead with it)
    "q85_stratified_sample",
    # the 50 gates without an r5 driver row (their latest rows are r4);
    # re-record against round-6 code so the r5+r6 union covers the full
    # registry with nothing older than round 5
    "q12_sessionize",
    "q15_string_math_funcs",
    "q16_levenshtein",
    "q17_derived_key_rollup",
    "q30_label_vector_stats",
    "q31_extract_documents",
    "q32_extract_events",
    "q33_ctc_roundtrip",
    "q34_extract_synthetic",
    "q35_extraction_metrics",
    "q40_lsh_ann_topk",
    "q41_ivf_ann_topk",
    "q42_multimodal_features",
    "q43_cube_rollup",
    "q44_pivot_status_by_priority",
    "q45_median_order_value",
    "q48_keyword_spotting",
    "q49_conversation_stats_salted",
    "q50_ordered_extract",
    "q58_batch_cosine_topk",
    "q59_sql_function_extract",
    "q62_conversation_documents",
    "q66_beam_decode",
    "q68_event_time_eviction",
    "q69_augment_deterministic",
    "q70_augment_randomized",
    "q71_conv_featurize",
    "q72_net_decode",
    "q73_mdlstm_features",
    "q75_video_frame_sample",
    "q76_audio_framing",
    "q77_training_corpus",
    "q78_neardup_clusters",
    "q79_hash_split",
    "q82_iceberg_day_partitioned",
    "q83_incremental_dedup",
    "q83b_incremental_dedup_persisted",
    "q84_iceberg_incremental",
    "q86_pack_documents",
    "q87_iceberg_stats_pruned_window",
    "q88_bpe_token_counts",
    "q89_pack_documents_bpe",
    "q90_incremental_stats_window",
    "q91_streaming_source_extract",
    "q92_layout_segmentation",
    "q93_benchmark_contamination",
    "q94_semantic_dedup",
    "q95_repetition_stats",
    # least-stale tail (untouched trivial relational gates with green
    # r4 rows): listed last so a ~50-row driver budget drops these two,
    # not anything touched this round
    "q13_hourly_rollup",
    "q14_brand_set_ops",
    # (the 50 gates recorded in CORRECTNESS_r05 are kept out so the
    # list stays within the driver's ~50-row recording budget)
]


def registry() -> dict[str, tuple]:
    merged: dict[str, tuple] = {}
    for m in _MODULES:
        for name, pair in m.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name {name}")
            merged[name] = pair
    ordered: dict[str, tuple] = {}
    for name in _RUN_FIRST:
        if name in merged:
            ordered[name] = merged.pop(name)
    ordered.update(merged)
    return ordered


def spark_queries():
    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sqls():
    return {name: sql for name, (_fn, sql) in registry().items() if sql is not None}
