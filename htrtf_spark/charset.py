"""Canonical extraction spec: charset + mode markers + regex patterns.

This module is the single source of truth for the *specification* of the
per-turn extraction semantics. Two independent implementations consume it:

- ``htrtf_spark.oracle``               — row-at-a-time pure Python (ground truth)
- ``htrtf_spark.operators.extraction`` — vectorized pandas (the Spark stage)

and the test suite asserts byte-equality between them (the analog of the
reference's per-record ``Target:`` vs ``Output:`` golden comparison,
/root/reference/Modules/tasks.py:179-181).

Reference parity notes (all paths relative to /root/reference):

- charset-membership projection: chars outside the allowed vocabulary are
  dropped (Projects/IAM_lines/create_IAM_lines_dataset.py:48-52).
- '|' is the word separator character and is itself part of the charset
  (create_IAM_lines_dataset.py:48,98); it decodes to a space.
- CTC greedy decode semantics: merge repeated labels, then drop blanks
  (Projects/IAM_lines/Structure_006/Structure_006.py:142-143 with
  blank id = num_classes-1, Modules/utils.py:142-144).
- whitespace canonicalization: ``' '.join(s.split()).strip()`` semantics
  (Modules/tasks.py:176-178).
- empty-after-clean rows are rejected, with an audit counter
  (create_IAM_lines_dataset.py:53-61).
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# Charset (the "label dictionary"). Mirrors charlist.txt / H5 `labels`
# (create_IAM_lines_dataset.py:259-261; Modules/utils.py:142-144).
# Index in this string == label id. The CTC blank id is len(CHARSET)
# (num_classes - 1 convention, Structure_006.py:259).
# ---------------------------------------------------------------------------
CHARSET: str = (
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789"
    " .,:;!?'\"()-|&/"
)
CHARSET_SET = frozenset(CHARSET)
BLANK_ID: int = len(CHARSET)          # CTC blank label id
NUM_CLASSES: int = len(CHARSET) + 1

# Blank sentinel character in frame-stream ("CTC mode") text. NOT in CHARSET.
BLANK_CHAR: str = "_"

# Word-separator character (IAM convention: '|'+'|'.join(words)+'|',
# create_IAM_lines_dataset.py:48). Decodes to a single space.
WORD_SEP: str = "|"

# Marker prefix identifying a turn whose text is a frame-level label
# stream that must be greedy-CTC-decoded (collapse repeats, drop blanks).
CTC_MARKER: str = "[CTC]"

# ---------------------------------------------------------------------------
# Regex patterns — *strings* so both implementations compile the identical
# pattern with Python `re` (identical engine → identical semantics).
# ---------------------------------------------------------------------------

# Any HTML-ish tag → the turn is DOM mode.
TAG_DETECT_PATTERN = r"<[a-zA-Z/!][^>]*>"

# Boilerplate container lines are dropped wholesale (the
# text-density/link-density "classify" stage of the north star; analog of
# the status/charset filters create_IAM_lines_dataset.py:45-61).
BOILERPLATE_PATTERN = r"(?i)<(?:nav|header|footer|script|style|aside|form)\b"

# Closed anchor spans, used for link-density (chars inside <a>..</a> / line).
ANCHOR_SPAN_PATTERN = r"(?is)<a\b[^>]*>.*?</a>"

# Strip remaining tags (replaced by a space; whitespace canon collapses).
TAG_STRIP_PATTERN = r"<[^>]*>"

# IAM pipe-stream detection: stripped text starts and ends with '|'
# and contains no whitespace (a '|'-joined word stream, not prose).
IAM_STREAM_PATTERN = r"^\|\S*\|$"

# Washington/Parzival dash-stream detection: strictly alternating
# char '-' char '-' ... char (create_Washington_lines_dataset.py:49).
WASH_STREAM_PATTERN = r"^(?:[^-]-)+[^-]$"

# THE whitespace set: exactly the characters where str.isspace() is True
# (== Python re \s over every codepoint — verified). Spelled out as
# literal characters because '\s' means three different things across
# the engines that execute the spec (Python re: this set; Java/Spark
# regexp_replace: ASCII incl. \x0b; DuckDB RE2: ASCII excl. \x0b) —
# an explicit class is the only form all three parse identically.
WS_CHARS: str = "".join(
    chr(c)
    for c in (
        0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20,
        0x85, 0xA0, 0x1680,
        0x2000, 0x2001, 0x2002, 0x2003, 0x2004, 0x2005, 0x2006, 0x2007,
        0x2008, 0x2009, 0x200A, 0x2028, 0x2029, 0x202F, 0x205F, 0x3000,
    )
)
WS_RUN_PATTERN = f"[{WS_CHARS}]+"

# Charset projection: delete every char not in CHARSET and not whitespace
# (whitespace survives until the canon step so word boundaries are kept).
_charset_class = re.escape(CHARSET)
CHARSET_FILTER_PATTERN = rf"[^{_charset_class}{WS_CHARS}]"

# Link-density threshold above which a line is classified boilerplate.
LINK_DENSITY_MAX: float = 0.5

# Extraction modes (recorded per turn for lineage).
MODE_NULL = "null"
MODE_EMPTY = "empty"
MODE_CTC = "ctc"
MODE_DOM = "dom"
MODE_IAM = "iam"
MODE_WASH = "washington"
MODE_PLAIN = "plain"

# Reject reasons (audit counters, analog n_ok/n_err_tr/n_err_simb,
# create_IAM_lines_dataset.py:57-65).
REJECT_NULL = "null_text"
REJECT_EMPTY = "empty_after_clean"


def char_to_id() -> dict[str, int]:
    """char → label id mapping (the encode dictionary, J2)."""
    return {c: i for i, c in enumerate(CHARSET)}


def id_to_char() -> dict[int, str]:
    """label id → char mapping (the decode dictionary, tasks.py:176-178)."""
    return dict(enumerate(CHARSET))
