"""Exact repeated-substring deduplication (the suffix-array family of
Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better") over any (id, text) DataFrame.

Semantics: a character is *duplicated* when it lies inside at least one
length-``min_len`` window that occurs >= 2 times across the corpus (in
another document, or at another position of the same document); maximal
runs of duplicated characters form the spans — the union of the hit
windows' coverage, so spans are disjoint by construction. This is the
character set a suffix array surfaces with match length >= ``min_len``
(Lee et al. remove exactly these regions) — re-expressed Spark-first as
a fixed-window fingerprint shuffle instead of a monolithic suffix sort:

1. every document emits its length-L character windows (pos, gram);
2. one shuffle partitions windows by gram; windows whose gram occurs
   >= 2 times are *hits* (a window-count, no groupBy+join back);
3. per document, hit windows whose [pos, pos+L) intervals overlap or
   touch merge into MAXIMAL DISJOINT spans (interval merge: a new span
   starts when pos - previous_pos > L — plain gaps-and-islands on
   consecutive positions would emit OVERLAPPING spans whenever hit
   positions skip fewer than L characters, e.g. hits at 0 and 2).

Step 2's shuffle moves L bytes per input character — the exact
algorithm's inherent cost. ``prefilter_hash=True`` (default) first
shuffles 8-byte xxhash64 fingerprints and only re-checks the surviving
candidates against the real grams, so in the common corpus (a few % of
bytes duplicated) the wide shuffle carries candidates only; a same-hash
different-gram collision is discarded by the exact phase (false
negatives are impossible — equal grams hash equal). Output is identical
either way (pytest-asserted).

At 100 TB: windows are O(total chars) rows but the plan is two narrow
map stages + hash shuffles with AQE-sized partitions — no driver state,
no per-executor corpus residency, no suffix array that must fit one
machine. The per-gram window count only ever materializes one gram
bucket per task; skew (one gram repeated 10^9 times) is boilerplate by
definition and can be pre-capped the same way the n-gram inverted index
caps stop shingles (operators/dedup.py).

Reference analog: the reference has no substring dedup; this fills the
corpus-hygiene tier between exact-document (operators/dedup.py:170) and
near-duplicate (operators/dedup.py:306) dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MIN_LEN = 50


def _windows(df: DataFrame, id_col: str, text_col: str, L: int) -> DataFrame:
    """(id, pos, g): every length-L character window of every document
    long enough to hold one. Narrow (no shuffle); generated JVM-side.

    The exploded collection is the INTEGER position sequence (~8
    bytes/element), with the gram substring computed per generated row
    in the pipelined projection — exploding a pre-built gram array
    would materialize O(doc_len × L) bytes per document inside one
    Generate operator (a 100 MB whale at L=50 → gigabytes in one
    task), which is exactly the per-executor residency this module
    promises not to have."""
    return (
        df.where(F.length(text_col) >= L)
        .select(
            F.col(id_col).alias("id"),
            F.col(text_col).alias("_t"),
            F.explode(
                F.sequence(F.lit(0), F.length(text_col) - L)
            ).alias("pos"),
        )
        .select(
            "id", "pos", F.expr(f"substring(_t, pos + 1, {L})").alias("g")
        )
    )


def repeated_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = DEFAULT_MIN_LEN,
    prefilter_hash: bool = True,
) -> DataFrame:
    """Maximal duplicated character spans, as
    (id, span_start, span_end, span_len) with [span_start, span_end)
    0-based character offsets into the document text. See module
    docstring for semantics and the scale shape."""
    L = int(min_len)
    if L < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    grams = _windows(df, id_col, text_col, L)

    if prefilter_hash:
        # phase 1: shuffle 8-byte fingerprints, keep candidate windows
        cand = (
            grams.withColumn("h", F.xxhash64("g"))
            .withColumn("n", F.count("*").over(Window.partitionBy("h")))
            .where(F.col("n") >= 2)
            .drop("h", "n")
        )
    else:
        cand = grams
    # exact phase: count over the REAL gram (collision-proof)
    hits = (
        cand.withColumn("n", F.count("*").over(Window.partitionBy("g")))
        .where(F.col("n") >= 2)
        .select("id", "pos")
    )

    # interval merge, not consecutive-position islands: hit intervals
    # [pos, pos+L) overlap-or-touch exactly when the position gap is
    # <= L, so a new span starts on a gap > L — output spans are
    # maximal AND disjoint (the invariant strip_repeated_spans relies
    # on; consecutive-position grouping broke it for near-offset hits)
    run = Window.partitionBy("id").orderBy("pos")
    runf = run.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    new_span = (
        F.lag("pos").over(run).isNull()
        | (F.col("pos") - F.lag("pos").over(run) > F.lit(L))
    )
    return (
        hits.withColumn("grp", F.sum(new_span.cast("long")).over(runf))
        .groupBy("id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(L)).alias("span_end"),
        )
        .select(
            "id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_len"),
        )
    )


def strip_repeated_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply-side: cut every duplicated span out of the text (the
    drop-duplicated-regions policy; documents without spans pass through
    unchanged). Returns the input columns with ``text_col`` replaced by
    the kept text plus ``removed_chars``.

    Spans per document are collected into one sorted array (spans are
    maximal, hence disjoint) and the kept text is rebuilt with a single
    JVM-side ``aggregate`` over the gaps — no UDF, no per-row Python.
    Per-task memory is bounded by the largest single document, exactly
    like conversation assembly (plans/pipeline.py)."""
    sp = (
        spans.groupBy(F.col("id").alias(id_col))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("span_start", "span_end"))
            ).alias("_spans")
        )
    )
    joined = df.join(sp, on=id_col, how="left")
    kept = F.expr(
        f"""CASE WHEN _spans IS NULL THEN {text_col} ELSE
        aggregate(
          _spans,
          struct(0 AS cur, '' AS acc),
          (s, x) -> struct(
            x.span_end AS cur,
            concat(s.acc,
                   substring({text_col}, s.cur + 1, x.span_start - s.cur))
              AS acc),
          s -> concat(s.acc, substring({text_col}, s.cur + 1,
                                       length({text_col}) - s.cur)))
        END"""
    )
    out_cols = [
        kept.alias(text_col) if c == text_col else F.col(c)
        for c in df.columns
    ]
    return joined.select(
        *out_cols,
        (F.length(text_col) - F.length(kept)).alias("removed_chars"),
    )
