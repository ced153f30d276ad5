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
    """Charset projection + whitespace canonicalization, vectorized.

    regex '\\s+'→' ' + strip is byte-identical to ' '.join(s.split())
    (verified: the re \\s set equals the str.split whitespace set over
    every Unicode codepoint) and avoids allocating a token list per row.
    """
    filtered = raw.str.replace(cs.CHARSET_FILTER_PATTERN, "", regex=True)
    return filtered.str.replace(cs.WS_RUN_PATTERN, " ", regex=True).str.strip()


_BLANK_CP = ord(cs.BLANK_CHAR)
_WORDSEP_CP = ord(cs.WORD_SEP)


def _ctc_collapse_one(s: str) -> str:
    """Greedy CTC over one frame string, on uint32 codepoints (numpy):
    merge repeats → drop blanks → word-sep → space. Byte-identical to the
    oracle's char loop (codepoint == str iteration unit) and ~8× faster
    than the backreference-regex formulation."""
    a = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    if a.size == 0:
        return ""
    keep = np.empty(a.shape, dtype=bool)
    keep[0] = True
    np.not_equal(a[1:], a[:-1], out=keep[1:])
    a = a[keep]
    a = a[a != _BLANK_CP]
    if a.size == 0:
        return ""
    a = np.where(a == _WORDSEP_CP, np.uint32(32), a)
    return a.tobytes().decode("utf-32-le")


def _decode_ctc(st: pd.Series) -> pd.Series:
    tail = st.str.slice(len(cs.CTC_MARKER))
    return pd.Series(
        [_ctc_collapse_one(s) for s in tail.values], index=st.index, dtype="object"
    )


def _decode_iam(st: pd.Series) -> pd.Series:
    # '|'-joined word stream: runs of '|' become spaces; canon trims ends.
    return st.str.replace(r"\|+", " ", regex=True)


def _decode_wash(st: pd.Series) -> pd.Series:
    chars = st.str.slice(start=0, step=2)
    return chars.str.replace(cs.WORD_SEP, " ", regex=False)


def _dom_keep(lines: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """THE vectorized DOM keep rule (classify/segment), single copy shared
    by the decode path and the spans path: boilerplate + link-density on
    every nonempty line, TAG_STRIP only on the survivors (hot-path
    laziness). Returns (keep mask aligned to ``lines``, stripped text of
    the kept lines in order)."""
    boiler = lines.str.contains(cs.BOILERPLATE_PATTERN, regex=True).to_numpy()
    without_anchors = lines.str.replace(cs.ANCHOR_SPAN_PATTERN, "", regex=True)
    lens = lines.str.len().to_numpy()
    link_density = (lens - without_anchors.str.len().to_numpy()) / lens
    cand_mask = ~boiler & (link_density <= cs.LINK_DENSITY_MAX)
    stripped = lines[cand_mask].str.replace(cs.TAG_STRIP_PATTERN, " ", regex=True)
    ok = (stripped.str.strip() != "").to_numpy()
    keep_mask = cand_mask.copy()
    keep_mask[cand_mask] = ok
    return keep_mask, stripped.to_numpy()[ok]


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
    keep_mask, stripped_vals = _dom_keep(lines)
    if not keep_mask.any():
        return out
    # lines of one row are contiguous after explode — join with a single
    # linear pass (pandas groupby.agg machinery is ~10× slower here)
    idx_arr = lines.index.values[keep_mask]
    val_arr = stripped_vals
    keys: list = []
    vals: list = []
    prev = None
    acc: list = []
    for i, v in zip(idx_arr, val_arr):
        if i != prev and prev is not None:
            keys.append(prev)
            vals.append(" ".join(acc))
            acc = []
        prev = i
        acc.append(v)
    if prev is not None:
        keys.append(prev)
        vals.append(" ".join(acc))
    out.loc[keys] = vals
    return out


def _classify_modes(st: pd.Series, live: pd.Series):
    """Mode dispatch masks (ctc, dom, iam, wash, plain) over stripped
    text, each predicate evaluated only on rows still unclassified."""

    def _narrow(mask: pd.Series, matcher) -> pd.Series:
        out_mask = pd.Series(False, index=st.index)
        if mask.any():
            out_mask.loc[mask] = matcher(st[mask])
        return out_mask

    m_ctc = _narrow(live, lambda s: s.str.startswith(cs.CTC_MARKER))
    rem = live & ~m_ctc
    m_dom = _narrow(rem, lambda s: s.str.contains(cs.TAG_DETECT_PATTERN, regex=True))
    rem &= ~m_dom
    m_iam = _narrow(rem, lambda s: s.str.match(cs.IAM_STREAM_PATTERN))
    rem &= ~m_iam
    m_wash = _narrow(rem, lambda s: s.str.match(cs.WASH_STREAM_PATTERN))
    m_plain = rem & ~m_wash
    return m_ctc, m_dom, m_iam, m_wash, m_plain


def extract_pandas(pdf: pd.DataFrame) -> pd.DataFrame:
    """Extract every turn in one pandas batch. Row order preserved."""
    pdf = pdf.reset_index(drop=True)
    if pdf["turn_idx"].isna().any() or pdf["conv_id"].isna().any():
        # a schema-pinned read of a non-transcripts file yields all-null
        # keys — fail loudly here instead of a cryptic cast error later
        raise ValueError(
            "transcripts rows with null conv_id/turn_idx — the input is "
            "not a transcripts table (schema-pinned read of a wrong file?)"
        )
    text = pdf["text"]
    is_null = text.isna()
    s = text.where(~is_null, "").astype("object")
    st = s.str.strip()

    is_empty = ~is_null & (st == "")
    live = ~is_null & ~is_empty

    m_ctc, m_dom, m_iam, m_wash, m_plain = _classify_modes(st, live)

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


# --------------------------------------------------------------- spans path
# Optional kept-content spans (the north rule's "extracted text/spans"):
# half-open (start, end) offsets into the ORIGINAL text per kept region.
# Spec + per-mode rules: oracle.extract_turn_spans. Kept out of the hot
# extraction stage — callers that need provenance pay for it explicitly.

EXTRACTED_SPANS_DDL = (
    EXTRACTED_DDL + ", span_starts array<int>, span_ends array<int>"
)


def _dom_spans(st: pd.Series, lead: pd.Series) -> pd.Series:
    """Per-row list of (start, end) offsets of kept DOM lines (the keep
    rule is _dom_keep — the same single copy the decode path runs),
    offsets relative to the original text."""
    out = pd.Series([[] for _ in range(len(st))], index=st.index, dtype="object")
    if len(st) == 0:
        return out
    lines = st.str.split("\n").explode()
    lens = lines.str.len()
    step = lens + 1
    pos = step.groupby(level=0).cumsum() - step  # line start offset within st
    nonempty = (lens > 0).to_numpy()
    ne = lines[nonempty]
    if len(ne) == 0:
        return out
    keep, _stripped = _dom_keep(ne)
    kept_pos = pos[nonempty][keep]
    kept_len = lens[nonempty][keep]
    for i, p, ln in zip(kept_pos.index, kept_pos.values, kept_len.values):
        base = int(lead.loc[i])
        out.loc[i].append((base + int(p), base + int(p) + int(ln)))
    return out


def extract_spans_pandas(pdf: pd.DataFrame) -> pd.DataFrame:
    """extract_pandas + kept-content span columns (span_starts/span_ends,
    parallel int arrays; None for null turns, [] for rejected turns)."""
    pdf = pdf.reset_index(drop=True)
    base = extract_pandas(pdf)

    text = pdf["text"]
    is_null = text.isna()
    s = text.where(~is_null, "").astype("object")
    st = s.str.strip()
    live = ~is_null & (st != "")
    m_ctc, m_dom, _m_iam, _m_wash, _m_plain = _classify_modes(st, live)

    lead = (s.str.len() - s.str.lstrip().str.len()).astype("int64")
    end = lead + st.str.len().astype("int64")

    spans = pd.Series([[] for _ in range(len(st))], dtype="object")
    one_span = live & ~m_dom  # plain / iam / wash / ctc: one region
    start_one = lead.where(~m_ctc, lead + len(cs.CTC_MARKER))
    for i in spans.index[one_span]:
        spans.loc[i].append((int(start_one.loc[i]), int(end.loc[i])))
    if m_dom.any():
        spans.loc[m_dom] = _dom_spans(st[m_dom], lead[m_dom]).values

    rejected = base["reject_reason"].notna()
    spans.loc[rejected.values] = pd.Series(
        [[] for _ in range(int(rejected.sum()))], dtype="object"
    ).values
    starts = spans.map(lambda sp: [a for a, _b in sp])
    ends = spans.map(lambda sp: [b for _a, b in sp])
    starts[is_null.values] = None
    ends[is_null.values] = None
    base["span_starts"] = starts.values
    base["span_ends"] = ends.values
    return base


def extract_spans_map_in_pandas(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas entrypoint for the spans-enabled stage."""
    for pdf in batches:
        yield extract_spans_pandas(pdf)
