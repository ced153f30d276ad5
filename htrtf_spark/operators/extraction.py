"""Vectorized main-content extraction — the Arrow-batched Spark stage.

Implements the canonical per-turn extraction spec (see
``htrtf_spark.charset`` for the spec constants and
``htrtf_spark.oracle`` for the independent row-at-a-time ground truth)
entirely with vectorized pandas string ops, suitable for
``DataFrame.mapInPandas`` — no per-row Python in the hot path.

Stage chain per the north star, mirroring the reference's eval path
(/root/reference/Modules/tasks.py:153-191):
  tokenize (mode detect + line split) → classify (boilerplate/link-density)
  → decode (CTC collapse / stream decode / tag strip) → normalize
  (charset projection + whitespace canonicalization) → lineage columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from htrtf_spark import charset as cs

# Spark-side output schema (DDL string form, usable by mapInPandas).
EXTRACTED_DDL = (
    "conv_id string, turn_idx int, role string, mode string, "
    "extracted_text string, n_chars int, reject_reason string"
)


def _finish(raw: pd.Series) -> pd.Series:
    """Charset projection + whitespace canonicalization, vectorized."""
    filtered = raw.str.replace(cs.CHARSET_FILTER_PATTERN, "", regex=True)
    return filtered.str.split().str.join(" ")


def _decode_ctc(st: pd.Series) -> pd.Series:
    tail = st.str.slice(len(cs.CTC_MARKER))
    collapsed = tail.str.replace(cs.CTC_COLLAPSE_PATTERN, r"\1", regex=True)
    deblanked = collapsed.str.replace(cs.BLANK_CHAR, "", regex=False)
    return deblanked.str.replace(cs.WORD_SEP, " ", regex=False)


def _decode_iam(st: pd.Series) -> pd.Series:
    # '|'-joined word stream: runs of '|' become spaces; canon trims ends.
    return st.str.replace(r"\|+", " ", regex=True)


def _decode_wash(st: pd.Series) -> pd.Series:
    chars = st.str.slice(start=0, step=2)
    return chars.str.replace(cs.WORD_SEP, " ", regex=False)


def _decode_dom(st: pd.Series) -> pd.Series:
    """Boilerplate classify + tag strip over exploded lines (index must be
    unique — caller guarantees a RangeIndex)."""
    out = pd.Series("", index=st.index, dtype="object")
    if len(st) == 0:
        return out
    lines = st.str.split("\n").explode()
    lines = lines[lines.str.len() > 0]
    if len(lines) == 0:
        return out
    boiler = lines.str.contains(cs.BOILERPLATE_PATTERN, regex=True)
    without_anchors = lines.str.replace(cs.ANCHOR_SPAN_PATTERN, "", regex=True)
    link_density = (lines.str.len() - without_anchors.str.len()) / lines.str.len()
    kept = lines[~boiler & (link_density <= cs.LINK_DENSITY_MAX)]
    stripped = kept.str.replace(cs.TAG_STRIP_PATTERN, " ", regex=True)
    stripped = stripped[stripped.str.strip() != ""]
    if len(stripped) == 0:
        return out
    joined = stripped.groupby(level=0).agg(" ".join)
    out.update(joined)
    return out


def extract_pandas(pdf: pd.DataFrame) -> pd.DataFrame:
    """Extract every turn in one pandas batch. Row order preserved."""
    pdf = pdf.reset_index(drop=True)
    text = pdf["text"]
    is_null = text.isna()
    s = text.where(~is_null, "").astype("object")
    st = s.str.strip()

    is_empty = ~is_null & (st == "")
    live = ~is_null & ~is_empty
    m_ctc = live & st.str.startswith(cs.CTC_MARKER)
    m_dom = live & ~m_ctc & st.str.contains(cs.TAG_DETECT_PATTERN, regex=True)
    m_iam = live & ~m_ctc & ~m_dom & st.str.match(cs.IAM_STREAM_PATTERN)
    m_wash = live & ~m_ctc & ~m_dom & ~m_iam & st.str.match(cs.WASH_STREAM_PATTERN)
    m_plain = live & ~m_ctc & ~m_dom & ~m_iam & ~m_wash

    raw = pd.Series("", index=st.index, dtype="object")
    if m_ctc.any():
        raw.loc[m_ctc] = _decode_ctc(st[m_ctc])
    if m_dom.any():
        raw.loc[m_dom] = _decode_dom(st[m_dom])
    if m_iam.any():
        raw.loc[m_iam] = _decode_iam(st[m_iam])
    if m_wash.any():
        raw.loc[m_wash] = _decode_wash(st[m_wash])
    if m_plain.any():
        raw.loc[m_plain] = st[m_plain]

    final = pd.Series(None, index=st.index, dtype="object")
    if live.any():
        final.loc[live] = _finish(raw[live])
    final.loc[is_empty] = ""

    mode = pd.Series(cs.MODE_PLAIN, index=st.index, dtype="object")
    mode.loc[is_null] = cs.MODE_NULL
    mode.loc[is_empty] = cs.MODE_EMPTY
    mode.loc[m_ctc] = cs.MODE_CTC
    mode.loc[m_dom] = cs.MODE_DOM
    mode.loc[m_iam] = cs.MODE_IAM
    mode.loc[m_wash] = cs.MODE_WASH

    reject = pd.Series(None, index=st.index, dtype="object")
    reject.loc[is_null] = cs.REJECT_NULL
    reject.loc[~is_null & (final == "")] = cs.REJECT_EMPTY

    n_chars = final.str.len().astype("Int32")

    return pd.DataFrame(
        {
            "conv_id": pdf["conv_id"].values,
            "turn_idx": pdf["turn_idx"].astype("int32").values,
            "role": pdf["role"].values,
            "mode": mode.values,
            "extracted_text": final.values,
            "n_chars": n_chars.values,
            "reject_reason": reject.values,
        }
    )


def extract_map_in_pandas(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas entrypoint: df.mapInPandas(extract_map_in_pandas,
    schema=EXTRACTED_DDL)."""
    for pdf in batches:
        yield extract_pandas(pdf)
