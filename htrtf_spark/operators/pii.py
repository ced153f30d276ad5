"""PII redaction — the masking stage every production training-data
pipeline runs before text reaches a model (emails, IPv4 addresses,
SSNs, phone numbers in their common written forms, Luhn-validated
credit-card numbers → typed placeholder tokens), plus per-kind match
counts for audit/lineage.

Engine-portable by construction: every pattern uses only the syntax
subset shared by Java regex (Spark's ``regexp_replace``/
``regexp_count``) and RE2 (DuckDB, Go, etc.) — ASCII character
classes, non-capturing groups, bounded quantifiers, ``\\b`` word
boundaries; NO lookaround, NO backreferences (RE2 has neither).
Replacement strings are escaped for each engine's replacement
metacharacters (``$``/``\\`` in Java, ``\\`` in RE2, quotes in SQL),
so custom (pattern, replacement) tuples are safe verbatim — though the
built-in markers deliberately contain no digits or ``@`` so later
patterns can never match inside an earlier replacement.

Credit cards are NOT a pure-regex kind: the digit shape (13-19 digits,
optional single space/dash separators) only nominates CANDIDATES, and
the Luhn checksum — a JVM-side ``aggregate`` over the candidate's
digits, still zero Python — decides which get masked, so
"4111 1111 1111 1111" redacts while a random 16-digit number passes
through. Masking folds the valid candidate strings over the text with
all-occurrence ``replace`` (both engines fold identically, which is
what lets the q99 oracle hash-match byte-for-byte).

Scale shape: one narrow projection — per-row regex work JVM-side
inside whole-stage codegen, no shuffle, no UDF; per-kind pattern
counts come from the ORIGINAL text (order-independent), masking
applies the patterns in list order, credit cards last (phone/SSN
forms cannot match inside a card's uniform digit grouping, but a
13+-digit international phone number must be typed as a phone, not
Luhn-gambled as a card). ``n_cc`` alone counts over the
pattern-masked text — the candidates the card fold actually masks —
so a Luhn-valid intl phone never double-counts as a card.

Deliberately excluded kinds: IPv6 (any portable colon-group pattern
also matches clock times "12:30:45" and MAC addresses — the
false-positive rate on prose corpora outweighs the coverage; add a
corpus-specific pattern via ``patterns=`` if the domain warrants it)
and free-form street addresses (not regex-shaped).

Reference analog: none (the reference predates LLM hygiene); this
fills the redaction slot of the corpus-hygiene tier next to
quality/langid/Gopher rules (operators/textstats.py) and the dedup
family (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    (
        "phone",
        r"\b\d{3}-\d{3}-\d{4}\b",
        "<PHONE>",
    ),
    (
        "phone_paren",
        r"\(\d{3}\) ?\d{3}[-. ]\d{4}\b",
        "<PHONE>",
    ),
    (
        "phone_dot",
        r"\b\d{3}\.\d{3}\.\d{4}\b",
        "<PHONE>",
    ),
    (
        "phone_space",
        r"\b\d{3} \d{3} \d{4}\b",
        "<PHONE>",
    ),
    (
        "phone_intl",
        r"\+\d{9,15}\b",
        "<PHONE>",
    ),
]

#: Credit-card CANDIDATE shape: 13-19 digits, each optionally followed
#: by one space or dash (uniform or no grouping both match). Candidates
#: are masked only if the Luhn checksum holds — see luhn-fold below.
CC_PATTERN = r"\b(?:\d[ -]?){12,18}\d\b"
CC_MARKER = "<CC>"


def _escape_java_replacement(rep: str) -> str:
    """Java ``Matcher.replaceAll`` treats ``\\`` and ``$`` (group refs)
    specially in the replacement — escape both so custom replacement
    strings are taken literally (ADVICE r5)."""
    return rep.replace("\\", "\\\\").replace("$", "\\$")


def _escape_re2_replacement(rep: str) -> str:
    """RE2 rewrite strings treat ``\\`` (group refs) specially."""
    return rep.replace("\\", "\\\\")


def _sq(s: str) -> str:
    """Single-quote escape for SQL string literals (ADVICE r5: a quote
    in a custom pattern/replacement must not break the oracle SQL)."""
    return s.replace("'", "''")


def _luhn_ok(cand: Column) -> Column:
    """Luhn checksum over a candidate string's digits — pure Catalyst
    (``aggregate`` over the reversed digit array with an (index, sum)
    struct accumulator), no UDF. True iff 13-19 digits and the mod-10
    check holds."""
    ds = F.regexp_replace(cand, F.lit("[^0-9]"), F.lit(""))
    chars = F.split(F.reverse(ds), "")

    def step(acc, ch):
        d = ch.cast("int")
        doubled = d * 2
        contrib = F.when(
            acc["i"] % 2 == 1,
            F.when(doubled > 9, doubled - 9).otherwise(doubled),
        ).otherwise(d)
        return F.struct(
            (acc["i"] + 1).alias("i"), (acc["s"] + contrib).alias("s")
        )

    total = F.aggregate(
        chars,
        F.struct(F.lit(0).alias("i"), F.lit(0).alias("s")),
        step,
        lambda acc: acc["s"],
    )
    n = F.length(ds)
    return (n >= 13) & (n <= 19) & (total % 10 == 0)


def _cc_valid(text: Column) -> Column:
    """Array of Luhn-valid credit-card candidate strings in ``text``
    (leftmost non-overlapping matches, invalid checksums dropped)."""
    return F.filter(
        F.regexp_extract_all(text, F.lit(CC_PATTERN), F.lit(0)), _luhn_ok
    )


def _cc_mask(
    text: Column, marker: str = CC_MARKER, cands: Column | None = None
) -> Column:
    """Fold the valid candidates over ``text``, replacing each
    candidate's \\b-BOUNDED occurrences (a duplicate candidate folds
    idempotently). The word boundaries matter: a Luhn-INVALID digit run
    can contain a valid candidate as an inner substring
    ("34111111111111111" contains "4111111111111111"), and a literal
    all-occurrence replace would garble the invalid run the module
    contract says passes through untouched — inner positions have word
    characters on both sides, so the bounded pattern skips them.
    Candidates are digits/space/dash only (no regex metacharacters),
    so the candidate string itself is literal-safe inside the pattern.
    Both engines fold in the same candidate order with the same RE2∩
    Java pattern, so the q99 oracle reproduces the output
    byte-for-byte. ``cands`` supplies a precomputed valid-candidate
    array (the staged redact_pii path) so the ONE fold implementation
    serves both callers."""
    return F.aggregate(
        _cc_valid(text) if cands is None else cands,
        text,
        lambda acc, m: F.regexp_replace(
            acc,
            F.concat(F.lit(r"\b"), m, F.lit(r"\b")),
            F.lit(marker),
        ),
    )


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
    redact_cc: bool = True,
) -> DataFrame:
    """Replace ``text_col`` with the redacted text and append one
    ``n_<kind>`` count column per pattern (matches in the ORIGINAL
    text) plus ``n_cc`` (Luhn-valid card candidates) and
    ``n_redactions`` (their sum). Pure Catalyst expressions — no
    shuffle, no Python in the row path. Credit-card masking runs after
    the pattern chain (see module docstring for the ordering why);
    pass ``redact_cc=False`` to skip it."""
    pats = PII_PATTERNS if patterns is None else patterns
    masked = F.col(text_col)
    for _kind, pat, rep in pats:
        masked = F.regexp_replace(masked, pat, _escape_java_replacement(rep))
    counts = {
        kind: F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        for kind, pat, _rep in pats
    }
    if not redact_cc:
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

    # Credit-card path, STAGED through named columns: the pattern-masked
    # text feeds three consumers (the candidate count, the Luhn filter,
    # and the fold's seed) and the valid-candidate array feeds two — a
    # single flat projection would re-evaluate the full regex chain per
    # consumer (the higher-order Luhn fold is codegen-fallback, so
    # whole-stage-codegen subexpression elimination cannot dedupe it).
    # Catalyst's CollapseProject keeps non-cheap aliases referenced more
    # than once as separate projections, so each stage runs ONCE per
    # row. Output is expression-identical to the flat form (pytest +
    # q99 oracle). Still one narrow pipeline: no shuffle, no UDF.
    pm, ccs = "__pii_masked", "__pii_ccs"
    for c in (pm, ccs):
        if c in df.columns:
            raise ValueError(f"input already has reserved column {c!r}")
    # a custom pattern whose kind is literally "cc" keeps masking in
    # the chain but its count column is superseded by the Luhn count —
    # the flat form's dict semantics (counts["cc"] overwrote it); two
    # n_cc columns would be an invalid output frame
    counts = {k: c for k, c in counts.items() if k != "cc"}
    staged = df.select(
        *[F.col(c) for c in df.columns if c != text_col],
        masked.alias(pm),
        # per-kind counts read the ORIGINAL text (order-independent)
        *[c.alias(f"n_{kind}") for kind, c in counts.items()],
    ).select(
        # n_cc counts the candidates the fold ACTUALLY masks — i.e.
        # over the pattern-masked text, not the original: a Luhn-valid
        # 13-15-digit international phone number is typed (and counted)
        # as a phone by the chain above and must not double-count as a
        # card redaction that never produced a <CC> marker.
        "*",
        _cc_valid(F.col(pm)).alias(ccs),
    )
    count_cols = [F.col(f"n_{kind}") for kind in counts] + [
        F.size(ccs).cast("long")
    ]
    total = None
    for c in count_cols:
        total = c if total is None else total + c
    folded = _cc_mask(F.col(pm), cands=F.col(ccs))
    out_cols = [
        folded.alias(text_col) if c == text_col else F.col(c)
        for c in df.columns
    ]
    return staged.select(
        *out_cols,
        *[F.col(f"n_{kind}") for kind in counts],
        F.size(ccs).cast("long").alias("n_cc"),
        total.alias("n_redactions"),
    )


def _luhn_sql(cand: str) -> str:
    """DuckDB restatement of ``_luhn_ok`` over the SQL expression
    ``cand`` (digit strip → reversed-index list comprehension →
    list_sum mod 10)."""
    ds = f"regexp_replace({cand}, '[^0-9]', '', 'g')"
    d = f"CAST(substring(reverse({ds}), i, 1) AS INT)"
    return (
        f"length({ds}) BETWEEN 13 AND 19 AND "
        f"list_sum([CASE WHEN (i-1)%2 = 1 THEN "
        f"CASE WHEN 2*{d} > 9 THEN 2*{d} - 9 ELSE 2*{d} END "
        f"ELSE {d} END "
        f"for i in generate_series(1, length({ds}))]) % 10 = 0"
    )


def pii_sql(
    text_expr: str,
    patterns: list[tuple[str, str, str]] | None = None,
    redact_cc: bool = True,
) -> dict:
    """The DuckDB restatement of ``redact_pii`` over ``text_expr``:
    returns {"masked": sql, "counts": {kind: sql}} — the same pattern
    list rendered as RE2 calls plus the Luhn candidate fold, used by
    the q99 oracle so operator and oracle can never drift apart."""
    pats = PII_PATTERNS if patterns is None else patterns
    masked = text_expr
    for _kind, pat, rep in pats:
        masked = (
            f"regexp_replace({masked}, '{_sq(pat)}', "
            f"'{_sq(_escape_re2_replacement(rep))}', 'g')"
        )
    counts = {
        kind: (
            "CAST(len(regexp_extract_all("
            f"{text_expr}, '{_sq(pat)}')) AS BIGINT)"
        )
        for kind, pat, _rep in pats
    }
    if redact_cc:
        def valid(src: str) -> str:
            return (
                f"list_filter(regexp_extract_all({src}, '{_sq(CC_PATTERN)}'), "
                f"s -> {_luhn_sql('s')})"
            )

        # same \b-bounded fold and actually-masked count as redact_pii
        counts["cc"] = f"CAST(len({valid(masked)}) AS BIGINT)"
        masked = (
            f"list_reduce(list_prepend({masked}, {valid(masked)}), "
            f"(acc, m) -> regexp_replace(acc, '\\b' || m || '\\b', "
            f"'{CC_MARKER}', 'g'))"
        )
    return {"masked": masked, "counts": counts}
