"""Single-process reference-semantics oracle.

Row-at-a-time, loop-based pure Python. Deliberately NOT vectorized and
deliberately NOT sharing code with the Spark stage
(``htrtf_spark.operators.extraction``): the test suite asserts the two
implementations agree byte-for-byte on every turn, which is the graft's
analog of the reference's golden Target-vs-Output comparison
(/root/reference/Modules/tasks.py:179-181) with the north rule's
CER=0 ⇔ byte-equality upgrade.

Only the *spec constants* (charset, markers, regex pattern strings) are
shared, via ``htrtf_spark.charset``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from htrtf_spark import charset as cs

_TAG_DETECT = re.compile(cs.TAG_DETECT_PATTERN)
_BOILER = re.compile(cs.BOILERPLATE_PATTERN)
_ANCHOR = re.compile(cs.ANCHOR_SPAN_PATTERN)
_TAG_STRIP = re.compile(cs.TAG_STRIP_PATTERN)
_IAM = re.compile(cs.IAM_STREAM_PATTERN)
_WASH = re.compile(cs.WASH_STREAM_PATTERN)


@dataclass(frozen=True)
class Extracted:
    text: str | None
    mode: str
    reject_reason: str | None


def _charset_filter(s: str) -> str:
    """Charset-membership projection (create_IAM_lines_dataset.py:48-52).

    Keeps whitespace so word boundaries survive until canonicalization.
    """
    out = []
    for ch in s:
        if ch in cs.CHARSET_SET or ch.isspace():
            out.append(ch)
    return "".join(out)


def _canon(s: str) -> str:
    """Whitespace canonicalization: ' '.join(s.split()) (tasks.py:176-178)."""
    return " ".join(s.split())


def _finish(s: str) -> str:
    return _canon(_charset_filter(s))


def _ctc_decode_text(tail: str) -> str:
    """Greedy CTC over a char frame stream: merge repeats, drop blanks,
    word-sep → space (Structure_006.py:142-143 semantics)."""
    collapsed = []
    prev = None
    for ch in tail:
        if ch != prev:
            collapsed.append(ch)
        prev = ch
    out = []
    for ch in collapsed:
        if ch == cs.BLANK_CHAR:
            continue
        out.append(" " if ch == cs.WORD_SEP else ch)
    return "".join(out)


def _dom_strip(text: str) -> str:
    """Boilerplate classification + tag strip (the classify/segment stages)."""
    kept = []
    for line in text.split("\n"):
        if len(line) == 0:
            continue
        if _BOILER.search(line):
            continue
        without_anchors = _ANCHOR.sub("", line)
        link_chars = len(line) - len(without_anchors)
        if link_chars / len(line) > cs.LINK_DENSITY_MAX:
            continue
        stripped = _TAG_STRIP.sub(" ", line)
        if stripped.strip() == "":
            continue
        kept.append(stripped)
    return " ".join(kept)


def _iam_decode(st: str) -> str:
    """'|'-joined word stream → words joined by single spaces
    (create_IAM_lines_dataset.py:48)."""
    words = [w for w in st.split(cs.WORD_SEP) if w != ""]
    return " ".join(words)


def _wash_decode(st: str) -> str:
    """'-'-alternating char stream; '|' is the space
    (create_Washington_lines_dataset.py:49-52)."""
    chars = []
    for i in range(0, len(st), 2):
        ch = st[i]
        chars.append(" " if ch == cs.WORD_SEP else ch)
    return "".join(chars)


def extract_turn(text: str | None) -> Extracted:
    """Canonical per-turn main-content extraction. THE spec."""
    if text is None:
        return Extracted(None, cs.MODE_NULL, cs.REJECT_NULL)
    st = text.strip()
    if st == "":
        return Extracted("", cs.MODE_EMPTY, cs.REJECT_EMPTY)
    if st.startswith(cs.CTC_MARKER):
        mode = cs.MODE_CTC
        raw = _ctc_decode_text(st[len(cs.CTC_MARKER):])
    elif _TAG_DETECT.search(st):
        mode = cs.MODE_DOM
        raw = _dom_strip(st)
    elif _IAM.match(st):
        mode = cs.MODE_IAM
        raw = _iam_decode(st)
    elif _WASH.match(st):
        mode = cs.MODE_WASH
        raw = _wash_decode(st)
    else:
        mode = cs.MODE_PLAIN
        raw = st
    final = _finish(raw)
    if final == "":
        return Extracted("", mode, cs.REJECT_EMPTY)
    return Extracted(final, mode, None)


def extract_turn_spans(text: str | None) -> list[tuple[int, int]] | None:
    """Kept-content spans: half-open (start, end) character offsets into
    the ORIGINAL ``text`` of the source regions the extractor derived
    content from (the north rule's "extracted text/spans" counterpart).

    Per mode: null → None; rejected (null/empty-after-clean) → [];
    plain/IAM/Washington → one span over the stripped region; CTC → one
    span over the payload after the marker; DOM → one span per kept line
    (the lines that survive boilerplate, link-density, and
    empty-after-strip classification).
    """
    ex = extract_turn(text)
    if ex.mode == cs.MODE_NULL:
        return None
    if ex.reject_reason is not None:
        return []
    assert text is not None
    lead = len(text) - len(text.lstrip())
    st = text.strip()
    if ex.mode == cs.MODE_CTC:
        return [(lead + len(cs.CTC_MARKER), lead + len(st))]
    if ex.mode == cs.MODE_DOM:
        spans: list[tuple[int, int]] = []
        pos = 0
        for line in st.split("\n"):
            ln = len(line)
            if ln > 0 and not _BOILER.search(line):
                without_anchors = _ANCHOR.sub("", line)
                if (ln - len(without_anchors)) / ln <= cs.LINK_DENSITY_MAX:
                    if _TAG_STRIP.sub(" ", line).strip() != "":
                        spans.append((lead + pos, lead + pos + ln))
            pos += ln + 1
        return spans
    return [(lead, lead + len(st))]


def ctc_greedy_decode_ids(ids: list[int]) -> str:
    """Greedy CTC decode over a label-id sequence: merge repeated ids, drop
    blanks, map id→char (Structure_006.py:142-143 + tasks.py:175-178)."""
    lookup = cs.id_to_char()
    out = []
    prev = None
    for i in ids:
        if i != prev and i != cs.BLANK_ID:
            ch = lookup.get(int(i), "")
            out.append(" " if ch == cs.WORD_SEP else ch)
        prev = i
    return " ".join("".join(out).split())


def extract_frame(pdf):
    """Run the oracle over a pandas DataFrame of transcripts.

    Input needs columns conv_id, turn_idx, role, text. Returns the
    extraction output frame in the same row order. Used by tests to build
    golden outputs; never used inside Spark.
    """
    import pandas as pd

    texts = pdf["text"].tolist()
    results = [extract_turn(t if isinstance(t, str) else None) for t in texts]
    return pd.DataFrame(
        {
            "conv_id": pdf["conv_id"].values,
            "turn_idx": pdf["turn_idx"].values,
            "role": pdf["role"].values,
            "mode": [r.mode for r in results],
            "extracted_text": [r.text for r in results],
            "n_chars": pd.array(
                [len(r.text) if r.text is not None else None for r in results],
                dtype="Int32",
            ),
            "reject_reason": [r.reject_reason for r in results],
        }
    )
