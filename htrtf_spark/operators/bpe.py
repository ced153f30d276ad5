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
    return F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x)


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
    return F.flatten(toks)


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
