"""Merge-table BPE tokenization as pure JVM-side expressions.

Real byte-pair-encoding token counts (not the whitespace/``bpe_ish``
approximations in textstats): words are split to characters and a FIXED
ordered merge table is applied rule by rule — each rule exhaustively,
left to right — exactly the fast-path BPE encode (apply merges in rank
order) used by production tokenizers, and the subword analog of the
reference's per-character charset encode
(/root/reference/Projects/IAM_lines/create_IAM_lines_dataset.py:50-52).

Engine-portable formulation (the q40-hyperplane trick — restate the
exact computation in SQL): every symbol is wrapped in a separator,
``|a||b||c|``, so one non-overlapping left-to-right ``replace`` of
``|a||b|`` → ``|ab|`` merges EVERY occurrence of a pair in one pass —
matches never share characters, so chains like ``aaaa`` merge to
``aa aa`` (leftmost-greedy), byte-identical to the reference scan. The
whole encode is a chain of ``replace`` calls: whole-stage-codegen
JVM-side in Spark, plain nested ``replace()`` in the DuckDB oracle —
zero Python in the hot path on either engine.

The separator is U+001F (unit separator); it is stripped from input
text first, i.e. the tokenizer's alphabet excludes it (the same
contract as the reference charset projection dropping out-of-charset
characters).

``DEFAULT_MERGES`` is a small demonstration vocab (common English
digraphs, rank-ordered). A production vocab drops in as a list of
(left, right) pairs read from a public ``merges.txt`` — the expression
chain is generated from the table either way; at vocab sizes where an
expression chain stops being practical (~thousands of merges), swap
the same merge loop into a pandas UDF over Arrow batches with the
merge table broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"

# (left, right) — rank order; each merged symbol may feed later rules.
DEFAULT_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("e", "n"), ("a", "t"), ("o", "r"),
    ("e", "s"), ("s", "t"), ("a", "r"), ("a", "l"), ("i", "t"),
    ("a", "s"), ("t", "o"), ("i", "s"), ("e", "d"), ("o", "f"),
    ("in", "g"), ("an", "d"), ("o", "u"), ("c", "o"), ("d", "e"),
    ("s", "e"), ("l", "e"), ("m", "e"), ("h", "a"), ("n", "o"),
    ("w", "h"), ("l", "i"), ("m", "a"), ("p", "r"), ("t", "er"),
    ("c", "h"), ("r", "o"), ("u", "s"), ("v", "al"), ("u", "e"),
]


def _encode_word(w: Column, merges: list[tuple[str, str]]) -> Column:
    """``|c1||c2|…`` wrapping + the rank-ordered replace chain."""
    enc = F.regexp_replace(w, "(.)", f"{SEP}$1{SEP}")
    for left, right in merges:
        enc = F.replace(
            enc,
            F.lit(f"{SEP}{left}{SEP}{SEP}{right}{SEP}"),
            F.lit(f"{SEP}{left}{right}{SEP}"),
        )
    return enc


def _words(text_col: str | Column) -> Column:
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    clean = F.translate(col, SEP, "")
    return F.filter(F.split(clean, r"\s+"), lambda x: x != F.lit(""))


def bpe_token_count(
    text_col: str | Column, merges: list[tuple[str, str]] | None = None
) -> Column:
    """Exact BPE token count of a text column (int). One expression —
    no shuffle, no Python; composes with pack_documents via
    ``token_expr`` so packing budgets match what a real trainer sees."""
    merges = DEFAULT_MERGES if merges is None else merges
    per_word = F.transform(
        _words(text_col),
        lambda w: F.size(F.split(_encode_word(w, merges), f"{SEP}{SEP}")),
    )
    # NULL text counts 0, matching the UDF path and the q88 oracle's
    # COALESCE — a NULL here would silently consume no packing budget
    return F.coalesce(
        F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x), F.lit(0)
    )


def bpe_tokenize(
    text_col: str | Column, merges: list[tuple[str, str]] | None = None
) -> Column:
    """BPE token array of a text column (array<string>), word by word."""
    merges = DEFAULT_MERGES if merges is None else merges
    toks = F.transform(
        _words(text_col),
        lambda w: F.transform(
            F.split(_encode_word(w, merges), f"{SEP}{SEP}"),
            # interiors never contain SEP, so translate strips exactly
            # the wrapping separators
            lambda t: F.translate(t, SEP, ""),
        ),
    )
    return F.coalesce(F.flatten(toks), F.array().cast("array<string>"))


def bpe_token_counts(
    df: DataFrame, id_col: str, text_col: str,
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """(id, n_bpe_tokens) per document."""
    return df.select(
        F.col(id_col).alias("id"),
        bpe_token_count(text_col, merges).cast("int").alias("n_bpe_tokens"),
    )


def merges_sql(word_expr: str, merges: list[tuple[str, str]] | None = None) -> str:
    """The identical encode as a DuckDB expression over ``word_expr`` —
    returns the wrapped-token string after all merges (the oracle
    restatement; count via len(string_split(…, SEP||SEP)))."""
    merges = DEFAULT_MERGES if merges is None else merges
    enc = f"regexp_replace({word_expr}, '(.)', '{SEP}\\1{SEP}', 'g')"
    for left, right in merges:
        enc = (
            f"replace({enc}, '{SEP}{left}{SEP}{SEP}{right}{SEP}', "
            f"'{SEP}{left}{right}{SEP}')"
        )
    return enc


def bpe_token_counts_udf(
    df: DataFrame, id_col: str, text_col: str,
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """(id, n_bpe_tokens) via an Arrow-batched pandas stage — the
    LARGE-VOCAB path: expression chains stop being practical around a
    few hundred merges, while this form takes a full production merge
    table (tens of thousands of rules) broadcast once per executor.

    Output is identical to ``bpe_token_counts`` for any merge table
    (parity-tested). Not per-row Python in the harmful sense: batches
    cross via Arrow, the merge loop runs per DISTINCT word with a
    per-batch memo (natural-language word frequency makes the memo hit
    rate high), and a substring quick-reject skips rules whose symbols
    cannot occur in the word."""
    import re

    import pandas as pd
    from pyspark.sql import types as T

    merges = DEFAULT_MERGES if merges is None else merges
    # split EXACTLY like the expression path's Java \s+ (ASCII class,
    # incl. \x0b) — python str.split() is unicode-whitespace and would
    # diverge on e.g. non-breaking space
    ws = re.compile(r"[ \t\n\r\f\x0b]+")
    spark = df.sparkSession
    b_merges = spark.sparkContext.broadcast(list(merges))

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_bpe_tokens", T.IntegerType(), False),
        ]
    )

    def _encode_len(word: str, rules: list[tuple[str, str]]) -> int:
        toks = list(word)
        for left, right in rules:
            if left not in word or right not in word:
                # a merged pair's symbols are substrings of the word;
                # cheap reject skips most of a big table
                continue
            out, i, n = [], 0, len(toks)
            while i < n:
                if i + 1 < n and toks[i] == left and toks[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return len(toks)

    def _batches(it):
        rules = b_merges.value
        memo: dict[str, int] = {}
        for pdf in it:
            texts = pdf[text_col].fillna("")
            counts = []
            for t in texts:
                total = 0
                for w in ws.split(t.replace(SEP, "")):
                    if not w:
                        continue
                    c = memo.get(w)
                    if c is None:
                        c = _encode_len(w, rules)
                        memo[w] = c
                    total += c
                counts.append(total)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "n_bpe_tokens": counts}
            )

    return (
        df.select(id_col, text_col)
        .mapInPandas(_batches, schema=out_schema)
        .withColumnRenamed(id_col, "id")
    )
