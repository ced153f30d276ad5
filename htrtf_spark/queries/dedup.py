"""Deduplication operator family over ``documents``: exact (hash groupBy),
n-gram Jaccard via inverted-index self-join, and MinHash+LSH
(shingle → minhash signature → band → bucket-join → verify).

Scale notes (the 100 TB story): exact dedup is one shuffle on the
fingerprint; Jaccard avoids the O(n²) cross product via the trigram
inverted index (join fan-out bounded by shingle frequency — at web scale
you'd also drop ultra-common shingles); MinHash/LSH replaces the
inverted-index join with k-band bucket joins whose fan-out is controlled
by band width, which is the standard sub-quadratic near-dup path.

All hashing is engine-portable: md5 strings + lexicographic MIN, so the
DuckDB oracle computes the identical signatures.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from htrtf_spark.queries.util import bp, t

N_MINHASH = 8
BAND_WIDTH = 2  # 4 bands of 2 signatures
JACCARD_BP_MIN = 5000

# --------------------------------------------------------------------- q24
# Exact dedup: group by canonical-text hash (hash-groupBy; one shuffle).


def q24_exact_dedup(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count("*").alias("n_copies"))
    )


_Q24_SQL = """
SELECT md5(text) AS fp, MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


# ------------------------------------------------------------ shared shingles
def _trigrams(spark, sf_dir):
    """doc_id → exploded DISTINCT word-trigram shingles."""
    d = t(spark, sf_dir, "documents")
    w = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    grams = F.when(
        F.size(w) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - 3),
            lambda i: F.array_join(F.slice(w, i + 1, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select("doc_id", F.explode(F.array_distinct(grams)).alias("ng"))
    )


_TRIGRAMS_CTE = """
grams AS (
  SELECT doc_id, unnest(ngs) AS ng FROM (
    SELECT doc_id,
           list_distinct(
             CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ')
                        for i in generate_series(1, len(w) - 2)]
                  ELSE [] END) AS ngs
    FROM (SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS w
          FROM documents)
  )
)
"""

# --------------------------------------------------------------------- q25
# n-gram Jaccard near-dup pairs via inverted-index self-join.


def q25_trigram_jaccard_pairs(spark, sf_dir):
    grams = _trigrams(spark, sf_dir).cache()
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = grams.alias("a")
    b = grams.alias("b")
    inter = (
        a.join(b, (F.col("a.ng") == F.col("b.ng")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            bp(F.col("inter"), F.col("sz_a") + F.col("sz_b") - F.col("inter")).alias(
                "jaccard_bp"
            ),
        )
        .filter(F.col("jaccard_bp") >= JACCARD_BP_MIN)
    )


_Q25_SQL = f"""
WITH {_TRIGRAMS_CTE},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM grams a JOIN grams b ON a.ng = b.ng AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(ROUND(10000.0 * inter / (sa.sz + sb.sz - inter)) AS BIGINT) AS jaccard_bp
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(ROUND(10000.0 * inter / (sa.sz + sb.sz - inter)) AS BIGINT) >= {JACCARD_BP_MIN}
"""


# ------------------------------------------------------------ minhash core
def _signatures(spark, sf_dir):
    """doc_id → N_MINHASH lexicographic-min md5 signatures (portable
    minhash: h_i(S) = MIN over shingles of md5(i || ':' || shingle))."""
    grams = _trigrams(spark, sf_dir)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("ng")))).alias(f"mh{i}")
        for i in range(N_MINHASH)
    ]
    return grams.groupBy("doc_id").agg(*aggs)


def _sig_sql_cols() -> str:
    return ",\n         ".join(
        f"MIN(md5('{i}:' || ng)) AS mh{i}" for i in range(N_MINHASH)
    )


_N_BANDS = N_MINHASH // BAND_WIDTH


def _band_cols():
    return [
        (
            k,
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"mh{k * BAND_WIDTH + j}") for j in range(BAND_WIDTH)]
                )
            ),
        )
        for k in range(_N_BANDS)
    ]


def _band_sql(k: int) -> str:
    parts = " || '|' || ".join(f"mh{k * BAND_WIDTH + j}" for j in range(BAND_WIDTH))
    return f"md5({parts})"

# --------------------------------------------------------------------- q26
# MinHash-LSH candidate pairs: any shared band → candidate.


def q26_minhash_lsh_candidates(spark, sf_dir):
    sig = _signatures(spark, sf_dir)
    bands = None
    for k, expr in _band_cols():
        part = sig.select(
            "doc_id", F.lit(k).alias("band_id"), expr.alias("band_val")
        )
        bands = part if bands is None else bands.union(part)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


_Q26_SQL = f"""
WITH {_TRIGRAMS_CTE},
sig AS (
  SELECT doc_id,
         {_sig_sql_cols()}
  FROM grams GROUP BY doc_id
),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {k} AS band_id, {_band_sql(k)} AS band_val FROM sig" for k in range(_N_BANDS))}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.doc_id < b.doc_id
"""

# --------------------------------------------------------------------- q27
# MinHash-LSH verified near-dups: candidates re-checked with true Jaccard.


def q27_minhash_neardup_verified(spark, sf_dir):
    cand = q26_minhash_lsh_candidates(spark, sf_dir)
    grams = _trigrams(spark, sf_dir).cache()
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ga = grams.select(F.col("doc_id").alias("doc_a"), "ng")
    gb = grams.select(F.col("doc_id").alias("doc_b"), "ng")
    inter = (
        cand.join(ga, "doc_a")
        .join(gb, ["doc_b", "ng"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            bp(F.col("inter"), F.col("sz_a") + F.col("sz_b") - F.col("inter")).alias(
                "jaccard_bp"
            ),
        )
        .filter(F.col("jaccard_bp") >= JACCARD_BP_MIN)
    )


_Q27_SQL = f"""
WITH {_TRIGRAMS_CTE},
sig AS (
  SELECT doc_id,
         {_sig_sql_cols()}
  FROM grams GROUP BY doc_id
),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {k} AS band_id, {_band_sql(k)} AS band_val FROM sig" for k in range(_N_BANDS))}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.doc_a
  JOIN grams gb ON gb.doc_id = c.doc_b AND gb.ng = ga.ng
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       CAST(ROUND(10000.0 * inter / (sa.sz + sb.sz - inter)) AS BIGINT) AS jaccard_bp
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(ROUND(10000.0 * inter / (sa.sz + sb.sz - inter)) AS BIGINT) >= {JACCARD_BP_MIN}
"""


QUERIES = {
    "q24_exact_dedup": (q24_exact_dedup, _Q24_SQL),
    "q25_trigram_jaccard_pairs": (q25_trigram_jaccard_pairs, _Q25_SQL),
    "q26_minhash_lsh_candidates": (q26_minhash_lsh_candidates, _Q26_SQL),
    "q27_minhash_neardup_verified": (q27_minhash_neardup_verified, _Q27_SQL),
}
