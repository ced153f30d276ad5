"""Evaluation metrics: exact-match, CER, WER between extracted and golden
text — the reference's validation instruments re-expressed as one join +
built-in aggregates.

Reference parity:
- char edit distance (normalized + absolute): tf.edit_distance at
  /root/reference/Projects/IAM_lines/Structure_006/Structure_006.py:145-159,
  hand-rolled Levenshtein at /root/reference/Modules/utils.py:29-47
  → F.levenshtein (JVM-side).
- WER: word-level Levenshtein accumulated over records, words split on
  '|' after whitespace removal (/root/reference/Modules/tasks.py:183-194)
  → here words split on whitespace; the word-level distance is a small
  Arrow-batched pandas UDF (no JVM builtin exists).
- incremental cross-batch accumulation (previousCost/ED feeds,
  Structure_006.py:128,147,155) → partial+final aggregation, free in
  HashAggregateExec.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_lev(a: list[str], b: list[str]) -> int:
    """Classic DP Levenshtein over word tokens (utils.py:29-47 semantics,
    applied at word granularity like tasks.py:183)."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, wa in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, wb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (wa != wb))
        prev = cur
    return prev[-1]


def _wer_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        dists = []
        for got, gold in zip(pdf["_got"], pdf["_gold"]):
            ga = (got or "").split()
            gb = (gold or "").split()
            dists.append(_word_lev(ga, gb))
        out = pdf.drop(columns=["_got", "_gold"]).copy()
        out["word_dist"] = pd.array(dists, dtype="int64")
        yield out


def per_turn_distances(
    extracted: DataFrame,
    golden: DataFrame,
    keys: tuple[str, str] = ("conv_id", "turn_idx"),
    got_col: str = "extracted_text",
    gold_col: str = "golden_text",
) -> DataFrame:
    """Join prediction↔target on (conv_id, turn_idx) (the alignment join
    J4, tasks.py:177-184) and attach char- and word-level distances."""
    j = extracted.join(golden, on=list(keys), how="inner")
    got = F.coalesce(F.col(got_col), F.lit(""))
    gold = F.coalesce(F.col(gold_col), F.lit(""))
    with_char = j.select(
        *keys,
        got.alias("_got"),
        gold.alias("_gold"),
        F.levenshtein(got, gold).alias("char_dist"),
        F.length(gold).alias("gold_chars"),
        # any-whitespace tokenization, matching _wer_stage's str.split()
        # (a single-space split would disagree on tabs/newlines and skew
        # the WER denominator)
        F.size(F.filter(F.split(gold, r"\s+"), lambda x: x != F.lit(""))).alias(
            "gold_words"
        ),
        (got == gold).cast("int").alias("exact"),
    )
    key_types = {f.name: f.dataType.simpleString() for f in j.schema.fields}
    schema = (
        ", ".join(f"{k} {key_types[k]}" for k in keys)
        + ", char_dist int, gold_chars int, gold_words int, exact int, word_dist long"
    )
    return with_char.mapInPandas(_wer_stage, schema=schema)


def evaluation_summary(distances: DataFrame) -> DataFrame:
    """One-row CER/WER/exact-match report (print_valid_results analog,
    utils.py:373-390). CER_abs = Σ edit / Σ gold_chars
    (setTotalChars normalization, tasks.py:112,194)."""
    return distances.agg(
        F.count("*").alias("n_turns"),
        F.sum("exact").alias("n_exact"),
        F.round(F.avg(F.col("exact") * 10000)).cast("long").alias("exact_bp"),
        F.sum("char_dist").alias("total_char_dist"),
        F.round(
            F.sum("char_dist") * F.lit(10000.0)
            / F.greatest(F.sum("gold_chars"), F.lit(1))
        ).cast("long").alias("cer_abs_bp"),
        F.sum("word_dist").alias("total_word_dist"),
        F.round(
            F.sum("word_dist") * F.lit(10000.0)
            / F.greatest(F.sum("gold_words"), F.lit(1))
        ).cast("long").alias("wer_bp"),
    )
