"""Deterministic synthetic multi-turn transcripts (the primary input table).

Shape per BASELINE.json ``input_hint``:
    (conv_id string, turn_idx int32, role string, text string,
     tool string, ts timestamp)

Generation is seeded and **per-conversation deterministic**: conversation
``k`` is produced by an RNG seeded from ``(seed, k)`` only, so the same
rows come out whether generated single-process (pandas, for tests/oracle)
or distributed (``spark.range(n_convs).mapInPandas``, for benches) — and
independently of partitioning.

The text mixture covers every extraction mode plus its failure cases
(FIXTURES.md §1): clean prose, boilerplate-wrapped DOM, CTC frame
streams, IAM '|'-word streams, Washington '-'-char streams, out-of-charset
junk, empty-after-clean rows, whitespace-only rows, nulls. A deterministic
1% of conversations are ~100× longer than the median (long-conversation
skew — the salting test; reference analog: width chunking of very wide
images, /root/reference/Modules/layers.py:345-369).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from htrtf_spark import charset as cs

_WORDS = (
    "the quick brown fox jumps over a lazy dog while spark shuffles "
    "partitions across executors and catalyst prunes columns for every "
    "scan filter join window agg sort batch stream table row value key "
    "hash merge broadcast skew salt arrow pandas vector decode charset"
).split()

_ROLES = ["user", "assistant", "system", "tool"]

_BASE_TS = datetime(2025, 1, 1, 0, 0, 0)

# text kinds and weights (kept explicit + deterministic)
_KINDS = [
    ("plain", 0.32),
    ("dom", 0.20),
    ("ctc", 0.15),
    ("iam", 0.10),
    ("wash", 0.05),
    ("junk", 0.06),
    ("symbols_only", 0.04),
    ("ws_only", 0.03),
    ("null", 0.03),
    ("repeats", 0.02),
]


def _sentence(rs: np.random.RandomState, n_lo: int = 3, n_hi: int = 12) -> str:
    n = rs.randint(n_lo, n_hi + 1)
    return " ".join(_WORDS[i] for i in rs.randint(0, len(_WORDS), n))


def _ctc_stream(rs: np.random.RandomState, target: str) -> str:
    """Frame-expand a target string: per char 1-3 repeats, random blanks,
    spaces encoded as the '|' word separator."""
    frames: list[str] = []
    for ch in target:
        sym = cs.WORD_SEP if ch == " " else ch
        if rs.rand() < 0.5:
            frames.append(cs.BLANK_CHAR * rs.randint(1, 4))
        frames.append(sym * rs.randint(1, 4))
    if rs.rand() < 0.5:
        frames.append(cs.BLANK_CHAR * rs.randint(1, 3))
    return cs.CTC_MARKER + "".join(frames)


def _dom_text(rs: np.random.RandomState) -> str:
    lines = [
        "<header><h1>site header chrome</h1></header>",
        "<nav><a href='/a'>home</a> <a href='/b'>docs</a></nav>",
    ]
    for _ in range(rs.randint(1, 4)):
        lines.append(f"<p>{_sentence(rs)}</p>")
    if rs.rand() < 0.5:
        # link-farm line: > 50% of chars inside anchors → must be dropped
        anchors = " ".join(
            f"<a href='/x{i}'>{_WORDS[rs.randint(0, len(_WORDS))]}</a>"
            for i in range(4)
        )
        lines.append(anchors)
    if rs.rand() < 0.3:
        lines.append(f"<div>{_sentence(rs, 2, 5)} <b>bold</b> tail</div>")
    lines.append("<footer>copyright footer boilerplate</footer>")
    rs.shuffle(lines)  # order of lines varies; content decides survival
    return "\n".join(lines)


def _junk_text(rs: np.random.RandomState) -> str:
    body = _sentence(rs)
    junk = ["é", "ü", "™", "\U0001f600", "#", "%", "@", "~", "ß"]
    toks = body.split()
    for _ in range(rs.randint(1, 5)):
        pos = rs.randint(0, len(toks))
        toks.insert(pos, junk[rs.randint(0, len(junk))])
    return " ".join(toks)


def _turn_text(rs: np.random.RandomState) -> str | None:
    r = rs.rand()
    acc = 0.0
    kind = _KINDS[-1][0]
    for name, w in _KINDS:
        acc += w
        if r < acc:
            kind = name
            break
    if kind == "plain":
        return _sentence(rs)
    if kind == "dom":
        return _dom_text(rs)
    if kind == "ctc":
        return _ctc_stream(rs, _sentence(rs, 2, 6))
    if kind == "iam":
        words = _sentence(rs, 2, 8).split()
        return cs.WORD_SEP + cs.WORD_SEP.join(words) + cs.WORD_SEP
    if kind == "wash":
        target = _sentence(rs, 2, 4)
        chars = [cs.WORD_SEP if c == " " else c for c in target]
        return "-".join(chars)
    if kind == "junk":
        return _junk_text(rs)
    if kind == "symbols_only":
        return "".join(["#", "%", "@", "~", "*"][rs.randint(0, 5)] for _ in range(rs.randint(2, 9)))
    if kind == "ws_only":
        return " \t " * rs.randint(1, 3)
    if kind == "repeats":
        word = _WORDS[rs.randint(0, len(_WORDS))]
        return " ".join([word] * rs.randint(2, 6))
    return None  # "null"


def is_whale(k: int) -> bool:
    """Deterministic 1%: conversation k is a long-tail whale."""
    return k % 100 == 0


def conv_pandas(k: int, seed: int = 42) -> pd.DataFrame:
    """All turns of conversation k. Deterministic in (k, seed) only."""
    rs = np.random.RandomState((seed * 1_000_003 + k) % (2**31 - 1))
    n_turns = int(rs.randint(600, 1200)) if is_whale(k) else int(rs.randint(2, 17))
    conv_id = f"conv-{k:08d}"
    rows = []
    for t in range(n_turns):
        role = _ROLES[int(rs.randint(0, 4))]
        text = _turn_text(rs)
        tool = f"tool_{_WORDS[int(rs.randint(0, len(_WORDS)))]}" if role == "tool" else None
        ts = _BASE_TS + timedelta(seconds=k * 1000 + t)
        rows.append((conv_id, t, role, text, tool, ts))
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def synth_pandas(n_convs: int = 100, seed: int = 42, shuffled: bool = True) -> pd.DataFrame:
    """Single-process generation of the full table (tests / oracle input).

    Rows are written in a seeded shuffled order so nothing downstream can
    rely on on-disk order — stable (conv_id, turn_idx) ordering must come
    from the engine (the north rule's window sort).
    """
    parts = [conv_pandas(k, seed) for k in range(n_convs)]
    pdf = pd.concat(parts, ignore_index=True)
    if shuffled:
        rs = np.random.RandomState(seed + 7)
        pdf = pdf.iloc[rs.permutation(len(pdf))].reset_index(drop=True)
    return pdf


TRANSCRIPTS_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def synth_spark(spark, n_convs: int = 1000, seed: int = 42, partitions: int = 32):
    """Distributed generation: one task generates a slice of conv ids via
    the same per-conversation generator → identical rows to synth_pandas
    regardless of parallelism."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            frames = [conv_pandas(int(k), seed) for k in pdf["id"].astype(int)]
            if frames:
                # one Arrow batch per input batch, not per conversation —
                # per-conv yields paid the Arrow boundary thousands of
                # times per task for ~9-row frames
                yield pd.concat(frames, ignore_index=True)

    ids = spark.range(0, n_convs).repartition(partitions)
    return ids.mapInPandas(gen, schema=TRANSCRIPTS_DDL)
