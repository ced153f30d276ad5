"""CTC-style encode / greedy-decode over label-id sequences (T7/T8 of
SURVEY.md §2.9; reference: ctc_beam_search_decoder at
/root/reference/Projects/IAM_lines/Structure_006/Structure_006.py:142-143,
sparse→dense + id→char map at /root/reference/Modules/tasks.py:175-178).

Vectorized with numpy inside Arrow batches. The frame expansion
(`encode_frames`) inserts a blank between every character's repeat-run so
greedy decode is an exact inverse on canonical text — the roundtrip
identity is the oracle for the decode operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from htrtf_spark import charset as cs

_CHAR_ARR = np.array(list(cs.CHARSET) + [""])  # BLANK_ID maps to ''
_C2I = cs.char_to_id()

CTC_DECODED_DDL = "doc_id long, decoded string"


def encode_frames(text: str, repeats: int = 2) -> np.ndarray:
    """text → frame-level label ids: each char id repeated ``repeats``
    times, a blank after each run (so repeated chars survive decode)."""
    ids = []
    for ch in text:
        i = _C2I.get(ch)
        if i is None:
            continue  # charset projection: out-of-charset chars dropped
        ids.extend([i] * repeats)
        ids.append(cs.BLANK_ID)
    return np.asarray(ids, dtype=np.int64)


def greedy_decode(ids: np.ndarray) -> str:
    """Vectorized greedy CTC: merge repeats → drop blanks → map to chars
    → word-sep to space → whitespace canon."""
    ids = np.asarray(ids, dtype=np.int64)
    if ids.size == 0:
        return ""
    keep = np.empty(ids.shape, dtype=bool)
    keep[0] = True
    np.not_equal(ids[1:], ids[:-1], out=keep[1:])
    collapsed = ids[keep]
    collapsed = collapsed[collapsed != cs.BLANK_ID]
    chars = _CHAR_ARR[np.clip(collapsed, 0, cs.BLANK_ID)]
    s = "".join(chars).replace(cs.WORD_SEP, " ")
    return " ".join(s.split())


def roundtrip_map_in_pandas(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: (doc_id, text) → (doc_id, decoded) where decoded
    = greedy_decode(encode_frames(text)). Identity on canonical text."""
    for pdf in batches:
        decoded = [greedy_decode(encode_frames(t)) for t in pdf["text"]]
        yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "decoded": decoded})


def decode_ids_map_in_pandas(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas stage over an array<int> column named ``ids``."""
    for pdf in batches:
        decoded = [greedy_decode(np.asarray(v)) for v in pdf["ids"]]
        out = pdf.drop(columns=["ids"]).copy()
        out["decoded"] = decoded
        yield out
