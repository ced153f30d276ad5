"""Second text-analysis batch: quality feature vectors, BPE-ish token
counting, rolling-window fingerprints — driver-gate wrappers over
htrtf_spark.operators.textstats with full DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from htrtf_spark.operators import textstats as TS
from htrtf_spark.queries.util import t

# --------------------------------------------------------------------- q37


def q37_quality_features(spark, sf_dir):
    return TS.quality_features(t(spark, sf_dir, "documents"), "doc_id", "text")


_Q37_SQL = f"""
WITH base AS (
  SELECT doc_id AS id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
)
SELECT id,
       length(text) AS n_chars,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_types,
       CAST(ROUND(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
            * 10000.0 / GREATEST(length(text), 1)) AS BIGINT) AS alnum_ratio_bp,
       CAST(ROUND(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
            * 10000.0 / GREATEST(length(text), 1)) AS BIGINT) AS punct_ratio_bp,
       CAST(ROUND(len(list_filter(toks,
              x -> list_contains({TS.STOPWORDS!r}, x)))
            * 10000.0 / GREATEST(len(toks), 1)) AS BIGINT) AS stop_ratio_bp,
       CAST(ROUND(length(text) * 100.0 / GREATEST(len(toks), 1)) AS BIGINT)
           AS avg_token_len_cp
FROM base
"""

# --------------------------------------------------------------------- q38
# BPE-ish sub-word token counting (regex boundary splitting) over events
# props (which actually contain punctuation).


def q38_bpe_tokens(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        TS.bpe_ish_token_count(F.col("props")).alias("n_bpe"),
        TS.token_count(F.col("props")).alias("n_ws"),
    )


_Q38_SQL = r"""
SELECT event_id,
       len(list_filter(
             regexp_split_to_array(
               regexp_replace(props, '([0-9]+|[^\sA-Za-z0-9]+)', ' \1 ', 'g'),
               '\s+'),
             x -> x <> '')) AS n_bpe,
       len(list_filter(string_split(props, ' '), x -> x <> '')) AS n_ws
FROM events
"""

# --------------------------------------------------------------------- q39


def q39_rolling_fingerprints(spark, sf_dir):
    return TS.rolling_fingerprints(
        t(spark, sf_dir, "documents"), "doc_id", "text", window_tokens=16, stride=8
    )


_Q39_SQL = """
WITH base AS (
  SELECT doc_id AS id,
         list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents
  WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0
), wins AS (
  SELECT id,
         GREATEST(CAST(CEIL((len(w) - 16) / 8.0 + 1) AS BIGINT), 1) AS n_win,
         w
  FROM base
)
SELECT id, u.win_idx, u.fp FROM (
  SELECT id,
         unnest([{'win_idx': i - 1,
                  'fp': md5(array_to_string(w[(i-1)*8+1:(i-1)*8+16], ' '))}
                 for i in generate_series(1, n_win)]) AS u
  FROM wins
)
"""


QUERIES = {
    "q37_quality_features": (q37_quality_features, _Q37_SQL),
    "q38_bpe_tokens": (q38_bpe_tokens, _Q38_SQL),
    "q39_rolling_fingerprints": (q39_rolling_fingerprints, _Q39_SQL),
}


# --------------------------------------------------------------------- q88
# Real merge-table BPE token counts (round 4, VERDICT #5): the Spark
# side is operators/bpe's wrapped-symbol replace chain (pure JVM
# expressions); the oracle INLINES the identical merge table as nested
# DuckDB replace() calls over the same wrapped encoding — both engines
# run the same rank-ordered exhaustive leftmost merge scan, so counts
# are byte-exact, not approximations. Empty docs count 0 on both sides.


def q88_bpe_token_counts(spark, sf_dir):
    from htrtf_spark.operators import bpe

    return (
        bpe.bpe_token_counts(t(spark, sf_dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    )


def _q88_sql() -> str:
    from htrtf_spark.operators import bpe

    sep = bpe.SEP
    enc = bpe.merges_sql("w")
    return f"""
SELECT doc_id,
       CAST(COALESCE(list_sum(list_transform(
           list_filter(regexp_split_to_array(replace(text, '{sep}', ''), '\\s+'),
                       x -> x <> ''),
           w -> len(string_split({enc}, '{sep}{sep}')))), 0) AS INTEGER)
           AS n_bpe_tokens
FROM documents
"""


QUERIES["q88_bpe_token_counts"] = (q88_bpe_token_counts, _q88_sql())


# --------------------------------------------------------------------- q95
# Gopher-style repetition quality rules (round 4; Rae et al. 2021
# §A1.1): per-doc top-word ratio, top-bigram ratio (WITH repeats — the
# distinct shingles dedup uses would hide exactly the signal), and
# duplicate-line fraction, all floor'd basis points in exact integer
# arithmetic (engine-portable; ROUND differs at half-bp between
# HALF_UP and HALF_EVEN engines). Oracle restates every rule.


def q95_repetition_stats(spark, sf_dir):
    return (
        TS.repetition_stats(t(spark, sf_dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    )


_Q95_SQL = """
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS w,
         list_filter(string_split(text, chr(10)), x -> x <> '') AS lines_
  FROM documents
),
words AS (
  SELECT doc_id, unnest(w) AS tok FROM base
),
topw AS (
  SELECT doc_id, MAX(c) AS top_c FROM (
    SELECT doc_id, tok, COUNT(*) AS c FROM words GROUP BY doc_id, tok
  ) GROUP BY doc_id
),
bigr AS (
  SELECT doc_id, unnest(bgs) AS bg FROM (
    SELECT doc_id,
           CASE WHEN len(w) >= 2
                THEN [w[i] || ' ' || w[i+1]
                      for i in generate_series(1, len(w) - 1)]
                ELSE [] END AS bgs
    FROM base
  )
),
topb AS (
  SELECT doc_id, MAX(c) AS top_c FROM (
    SELECT doc_id, bg, COUNT(*) AS c FROM bigr GROUP BY doc_id, bg
  ) GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.w) AS BIGINT) AS n_words,
       CAST(COALESCE((tw.top_c * 10000) // len(b.w), 0) AS BIGINT)
           AS top_word_ratio_bp,
       CAST(CASE WHEN len(b.w) >= 2
                 THEN COALESCE((tb.top_c * 10000) // (len(b.w) - 1), 0)
                 ELSE 0 END AS BIGINT) AS top_bigram_ratio_bp,
       CAST(CASE WHEN len(b.lines_) > 0
                 THEN ((len(b.lines_) - len(list_distinct(b.lines_))) * 10000)
                      // len(b.lines_)
                 ELSE 0 END AS BIGINT) AS dup_line_frac_bp
FROM base b
LEFT JOIN topw tw USING (doc_id)
LEFT JOIN topb tb USING (doc_id)
"""

QUERIES["q95_repetition_stats"] = (q95_repetition_stats, _Q95_SQL)


# --------------------------------------------------------------------- q99
# PII redaction (operators/pii.py): the masking stage of the hygiene
# tier. The gate SEEDS deterministic PII into every document from
# doc_id (the synthetic corpus contains none organically), then
# redacts — the oracle restates both the seeding and the redaction via
# pii_sql(), so the pattern list can never drift between engines.


def q99_pii_redaction(spark, sf_dir):
    from htrtf_spark.operators.pii import redact_pii
    from htrtf_spark.plans.ordering import fan_out

    # the 17-regex chain is the most codegen-dense narrow stage in the
    # registry; a single-split local scan would run it on one core
    d = fan_out(t(spark, sf_dir, "documents"), "doc_id")
    seeded = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com via 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 call 555-867-530"),
            (F.col("doc_id") % 10).cast("string"),
            F.lit(" or +4915123456789 ssn 123-45-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" tel (202) 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" alt 303.555."),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            # Luhn-VALID card (must mask) + Luhn-INVALID candidate
            # (same digit shape, must pass through untouched)
            F.lit(" card 4111 1111 1111 1111 ref 1234 5678 9012 3456 ok"),
        ).alias("text"),
    )
    out = redact_pii(seeded, "text")
    return out.select(
        "doc_id",
        F.col("text").alias("redacted_text"),
        "n_email",
        "n_ipv4",
        "n_ssn",
        "n_phone",
        "n_phone_paren",
        "n_phone_intl",
        "n_cc",
        "n_redactions",
    )


def _q99_sql() -> str:
    from htrtf_spark.operators.pii import pii_sql

    seeded = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com via 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.7 call 555-867-530' || CAST(doc_id % 10 AS VARCHAR)"
        " || ' or +4915123456789 ssn 123-45-'"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
        " || ' tel (202) 555-'"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
        " || ' alt 303.555.'"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
        " || ' card 4111 1111 1111 1111 ref 1234 5678 9012 3456 ok'"
    )
    p = pii_sql(seeded)
    counts = p["counts"]
    total = " + ".join(counts[k] for k in counts)
    return f"""
SELECT doc_id,
       {p['masked']} AS redacted_text,
       {counts['email']} AS n_email,
       {counts['ipv4']} AS n_ipv4,
       {counts['ssn']} AS n_ssn,
       {counts['phone']} AS n_phone,
       {counts['phone_paren']} AS n_phone_paren,
       {counts['phone_intl']} AS n_phone_intl,
       {counts['cc']} AS n_cc,
       CAST({total} AS BIGINT) AS n_redactions
FROM documents
"""


QUERIES["q99_pii_redaction"] = (q99_pii_redaction, _q99_sql())


# -------------------------------------------------------------- q102/q103
# URL / domain link analysis (operators/textstats.py URL tier): the
# gate SEEDS deterministic URLs per document from doc_id (mixed-case
# hosts exercise the lower(); every 5th doc gets only one URL so
# counts vary), then profiles links per doc (q102) and ranks domains
# corpus-wide (q103). Patterns are fully explicit ASCII classes, so
# the identical pattern string drives both engines.

def _seed_urls(d):
    did = F.col("doc_id")
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://Site"),
            (did % 7).cast("string"),
            F.lit(".Example.COM/p/"),
            did.cast("string"),
            F.when(
                did % 5 != 0,
                F.concat(
                    F.lit(" and http://cdn"),
                    (did % 3).cast("string"),
                    F.lit(".example.org:8080/x?q="),
                    did.cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


_URL_SEED_SQL = (
    "text || ' see https://Site' || CAST(doc_id % 7 AS VARCHAR)"
    " || '.Example.COM/p/' || CAST(doc_id AS VARCHAR)"
    " || CASE WHEN doc_id % 5 <> 0 THEN"
    " ' and http://cdn' || CAST(doc_id % 3 AS VARCHAR)"
    " || '.example.org:8080/x?q=' || CAST(doc_id AS VARCHAR)"
    " ELSE '' END"
)


def q102_url_stats(spark, sf_dir):
    from htrtf_spark.operators.textstats import url_stats

    return url_stats(
        _seed_urls(t(spark, sf_dir, "documents")), "doc_id", "text"
    ).withColumnRenamed("id", "doc_id")


def _q102_sql() -> str:
    from htrtf_spark.operators.textstats import URL_HOST_PATTERN, URL_PATTERN

    urls = f"regexp_extract_all(text, '{URL_PATTERN}')"
    doms = (
        f"list_distinct(list_transform({urls},"
        f" u -> lower(regexp_extract(u, '{URL_HOST_PATTERN}', 1))))"
    )
    ntok = "len(list_filter(string_split(text, ' '), x -> x <> ''))"
    return f"""
WITH seeded AS (
  SELECT doc_id, {_URL_SEED_SQL} AS text FROM documents
)
SELECT doc_id,
       CAST(len({urls}) AS BIGINT) AS n_urls,
       CAST(len({doms}) AS BIGINT) AS n_domains,
       CAST(CASE WHEN {ntok} > 0
                 THEN (len({urls}) * 10000) // {ntok}
                 ELSE 0 END AS BIGINT) AS link_density_bp
FROM seeded
"""


QUERIES["q102_url_stats"] = (q102_url_stats, _q102_sql())

_Q103_K = 10


def q103_top_domains(spark, sf_dir):
    from htrtf_spark.operators.textstats import top_domains

    return top_domains(
        _seed_urls(t(spark, sf_dir, "documents")), "doc_id", "text",
        k=_Q103_K,
    )


def _q103_sql() -> str:
    from htrtf_spark.operators.textstats import URL_HOST_PATTERN, URL_PATTERN

    return f"""
WITH seeded AS (
  SELECT doc_id, {_URL_SEED_SQL} AS text FROM documents
),
u AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '{URL_PATTERN}')) AS url
  FROM seeded
),
d AS (
  SELECT doc_id,
         lower(regexp_extract(url, '{URL_HOST_PATTERN}', 1)) AS domain
  FROM u
)
SELECT domain,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq,
       CAST(COUNT(*) AS BIGINT) AS n_urls
FROM d GROUP BY domain
ORDER BY doc_freq DESC, n_urls DESC, domain
LIMIT {_Q103_K}
"""


QUERIES["q103_top_domains"] = (q103_top_domains, _q103_sql())


# -------------------------------------------------------------- q105
# Per-document tf-idf top-k terms (operators/textstats.py): the only
# libm call (ln) is quantized to an integer micro-idf immediately (the
# q100 recipe), so the ranking both engines compare is exact BIGINT.

_Q105_K = 3


def q105_tfidf_topk(spark, sf_dir):
    from htrtf_spark.operators.textstats import tfidf_topk_terms

    return tfidf_topk_terms(
        t(spark, sf_dir, "documents"), "doc_id", "text", k=_Q105_K
    ).withColumnRenamed("id", "doc_id")


_Q105_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
dfq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df_docs
  FROM tf GROUP BY term
),
scored AS (
  SELECT doc_id, term, tf, df_docs,
         tf * CAST(FLOOR(ln(
               CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
               / CAST(df_docs AS DOUBLE)) * 1000000) AS BIGINT) AS score
  FROM tf JOIN dfq USING (term)
)
SELECT doc_id, term, tf, df_docs, score FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS rn
  FROM scored
) WHERE rn <= {_Q105_K}
"""

QUERIES["q105_tfidf_topk"] = (q105_tfidf_topk, _Q105_SQL)


# -------------------------------------------------------------- q106
# Domain blocklist over the same seeded URLs as q102/q103: entry
# "example.org" blocks the cdnN.example.org URLs (subdomain match) but
# never the siteN.example.com ones — the gate returns the BLOCKED
# document set (keep_matches=True), i.e. exactly the docs that carry a
# cdn URL (doc_id % 5 != 0 by the seeding rule).

_Q106_BLOCKED = ["Example.ORG"]


def q106_blocked_domains(spark, sf_dir):
    from htrtf_spark.operators.textstats import filter_blocked_domains

    return filter_blocked_domains(
        _seed_urls(t(spark, sf_dir, "documents")),
        _Q106_BLOCKED,
        "doc_id",
        "text",
        keep_matches=True,
    ).select("doc_id")


def _q106_sql() -> str:
    from htrtf_spark.operators.textstats import URL_HOST_PATTERN, URL_PATTERN

    doms = (
        f"list_transform(regexp_extract_all(text, '{URL_PATTERN}'),"
        f" u -> lower(regexp_extract(u, '{URL_HOST_PATTERN}', 1)))"
    )
    return f"""
WITH seeded AS (
  SELECT doc_id, {_URL_SEED_SQL} AS text FROM documents
)
SELECT doc_id FROM seeded
WHERE len(list_filter(list_transform({doms}, d -> rtrim(d, '.')),
          d -> d = 'example.org' OR d LIKE '%.example.org')) > 0
"""


QUERIES["q106_blocked_domains"] = (q106_blocked_domains, _q106_sql())
