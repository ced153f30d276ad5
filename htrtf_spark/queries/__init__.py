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
    # new this round (round 5): no driver row exists yet
    # (new gates are prepended here as they land this round)
    "q96_repeated_substring_spans",
    "q97_substring_dedup_apply",
    "q98_conversation_documents_capped",
    "q99_pii_redaction",
    "q100_temperature_mixture",
    # stale driver rows: these 46 were last recorded in CORRECTNESS_r03
    # against round-3 code; re-record against current code (VERDICT r4 #2)
    "q01_pricing_summary",
    "q02_order_filter",
    "q03_top_revenue_orders",
    "q04_customers_with_urgent_orders",
    "q05_customers_without_orders",
    "q06_revenue_per_nation",
    "q07_global_stats",
    "q08_event_type_counts",
    "q09_argmax_per_segment",
    "q10_top3_events_per_user",
    "q11_running_totals",
    "q18_charset_clean",
    "q19_token_stats",
    "q20_quality_score",
    "q21_langid",
    "q22_fingerprint",
    "q23_distinct_vocab",
    "q24_exact_dedup",
    "q25_trigram_jaccard_pairs",
    "q26_minhash_lsh_candidates",
    "q27_minhash_neardup_verified",
    "q28_cosine_topk",
    "q29_near_pairs",
    "q36_simhash_pairs",
    "q37_quality_features",
    "q38_bpe_tokens",
    "q39_rolling_fingerprints",
    "q46_asof_click_view",
    "q47_approx_distinct_sanity",
    "q51_event_gaps",
    "q52_order_value_quartiles",
    "q53_grouping_sets",
    "q54_last_nonclick_carry",
    "q55_term_df_topk",
    "q56_kmeans_step",
    "q57_minhash_estimate",
    "q60_approx_percentile_sanity",
    "q61_null_semantics",
    "q63_dedup_keep_first",
    "q64_corpus_cer",
    "q65_text_density",
    "q67_iceberg_extract",
    "q74_iceberg_dedup_apply",
    "q80_extract_spans",
    "q81_extract_dom_spans",
    "q85_stratified_sample",
    # (round-4 gates q82-q95/q83b all have green r4 driver rows; kept
    # out so the list stays within the driver's ~50-row recording
    # budget -- the r4+r5 union then covers all 96 on round-4/5 code)
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
