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
    # new or fixed this round (round 3)
    "q86_pack_documents",
    "q85_stratified_sample",
    "q84_iceberg_incremental",
    "q83_incremental_dedup",
    "q82_iceberg_day_partitioned",
    "q81_extract_dom_spans",
    "q80_extract_spans",
    "q52_order_value_quartiles",
    "q55_term_df_topk",
    # r2-recorded but their machinery changed this round (iceberg layer)
    "q67_iceberg_extract",
    "q74_iceberg_dedup_apply",
    # stale driver rows: recorded in CORRECTNESS_r01 against round-1 code
    # and refactored since (dedup cache swap, capped shingles, simsearch
    # restaging) — re-record against current code first (VERDICT r2 #2)
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
    "q53_grouping_sets",
    "q54_last_nonclick_carry",
    "q56_kmeans_step",
    "q57_minhash_estimate",
    "q60_approx_percentile_sanity",
    "q61_null_semantics",
    "q63_dedup_keep_first",
    "q64_corpus_cer",
    "q65_text_density",
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
