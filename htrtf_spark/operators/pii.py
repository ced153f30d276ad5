"""PII redaction — the masking stage every production training-data
pipeline runs before text reaches a model (emails, IPv4 addresses,
phone numbers → typed placeholder tokens), plus per-kind match counts
for audit/lineage.

Engine-portable by construction: every pattern uses only the syntax
subset shared by Java regex (Spark's ``regexp_replace``/
``regexp_count``) and RE2 (DuckDB, Go, etc.) — ASCII character
classes, non-capturing groups, bounded quantifiers, ``\\b`` word
boundaries; NO lookaround, NO backreferences (RE2 has neither), and
replacement markers free of ``$``/``\\`` (special in Java
replacements). That is what lets the driver gate (q99) hash-compare
the redaction against a DuckDB restatement byte-for-byte.

Scale shape: one narrow projection — per-row regex work JVM-side
inside whole-stage codegen, no shuffle, no UDF; counts come from the
ORIGINAL text (order-independent), masking applies the patterns in
list order (markers contain no digits/@ so later patterns can never
match inside an earlier replacement).

Reference analog: none (the reference predates LLM hygiene); this
fills the redaction slot of the corpus-hygiene tier next to
quality/langid/Gopher rules (operators/textstats.py) and the dedup
family (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (kind, pattern, replacement) — applied in order; patterns restricted
#: to the Java∩RE2 syntax subset (see module docstring)
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\b\d{3}-\d{3}-\d{4}\b",
        "<PHONE>",
    ),
    (
        "phone_intl",
        r"\+\d{9,15}\b",
        "<PHONE>",
    ),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Replace ``text_col`` with the redacted text and append one
    ``n_<kind>`` count column per pattern (matches in the ORIGINAL
    text) plus ``n_redactions`` (their sum). Pure Catalyst expressions
    — no shuffle, no Python in the row path."""
    pats = PII_PATTERNS if patterns is None else patterns
    masked = F.col(text_col)
    for _kind, pat, rep in pats:
        masked = F.regexp_replace(masked, pat, rep)
    counts = {
        kind: F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        for kind, pat, _rep in pats
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    out_cols = [
        masked.alias(text_col) if c == text_col else F.col(c)
        for c in df.columns
    ]
    return df.select(
        *out_cols,
        *[c.alias(f"n_{kind}") for kind, c in counts.items()],
        total.alias("n_redactions"),
    )


def pii_sql(text_expr: str, patterns: list[tuple[str, str, str]] | None = None) -> dict:
    """The DuckDB restatement of ``redact_pii`` over ``text_expr``:
    returns {"masked": sql, "counts": {kind: sql}} — the same pattern
    list rendered as RE2 calls, used by the q99 oracle so operator and
    oracle can never drift apart."""
    pats = PII_PATTERNS if patterns is None else patterns
    masked = text_expr
    for _kind, pat, rep in pats:
        p = pat.replace("'", "''")
        masked = f"regexp_replace({masked}, '{p}', '{rep}', 'g')"
    counts = {
        kind: (
            "CAST(len(regexp_extract_all("
            f"{text_expr}, '{pat.replace(chr(39), chr(39) * 2)}')) AS BIGINT)"
        )
        for kind, pat, _rep in pats
    }
    return {"masked": masked, "counts": counts}
