"""Exact repeated-substring deduplication (the suffix-array family of
Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better") over any (id, text) DataFrame.

Semantics: a character is *duplicated* when it lies inside at least one
length-``min_len`` window that occurs >= 2 times across the corpus (in
another document, or at another position of the same document); maximal
runs of duplicated characters form the spans — the union of the hit
windows' coverage, so spans are disjoint by construction. This is the
character set a suffix array surfaces with match length >= ``min_len``
(Lee et al. remove exactly these regions) — re-expressed Spark-first as
a fixed-window fingerprint shuffle instead of a monolithic suffix sort:

1. every document emits its length-L character windows (pos, gram),
   generated in bounded CHUNKS so no per-row array scales with whole-
   document length (a 100 MB whale yields ~1.5k outer chunk rows, each
   owning <= ``chunk_chars`` positions — never one 10^8-element array);
2. one shuffle partitions windows by gram; windows whose gram occurs
   >= 2 times are *hits* (a window-count, no groupBy+join back).
   BOILERPLATE ROUTING (``max_gram_freq``, ON by default): grams whose
   occurrence count exceeds the cap — license headers, templates,
   repeated 10^6-10^9 times across a web corpus — would buffer their
   entire occurrence set inside ONE window task (the classic straggler).
   They are counted with a map-side-combined groupBy instead (heavy
   keys partially aggregate to ~one row per task, no single-task
   buffering) and routed around the window: count > cap >= 1 implies
   count >= 2, so every heavy-gram position is DEFINITIONALLY a hit —
   output is provably identical with the cap on or off
   (pytest-asserted), only the plan shape changes;
3. per document, hit windows whose [pos, pos+L) intervals overlap or
   touch merge into MAXIMAL DISJOINT spans (interval merge: a new span
   starts when pos - previous_pos > L — plain gaps-and-islands on
   consecutive positions would emit OVERLAPPING spans whenever hit
   positions skip fewer than L characters, e.g. hits at 0 and 2).

Step 2's shuffle moves L bytes per input character — the exact
algorithm's inherent cost. ``prefilter_hash=True`` (default) first
shuffles 8-byte xxhash64 fingerprints and only re-checks the surviving
candidates against the real grams, so in the common corpus (a few % of
bytes duplicated) the wide shuffle carries candidates only; a same-hash
different-gram collision is discarded by the exact phase (false
negatives are impossible — equal grams hash equal). Output is identical
either way (pytest-asserted).

At 100 TB: windows are O(total chars) rows but the plan is narrow map
stages + hash shuffles with AQE-sized partitions — no driver state, no
per-executor corpus residency, no suffix array that must fit one
machine. Window-stage buffering is bounded by ``max_gram_freq`` rows
per key (heavy keys never reach a window), per-row arrays are bounded
by ``chunk_chars``, and the heavy-detection pass counts only a
1-in-``heavy_detect_sample`` position sample (default 64) — detection
is routing-only (both routes re-check exactness), so the guard's cost
is a cheap sampled count pass, not a second full generation; the cap's
effect is observable through ``repeated_gram_stats`` (the
``stop_shingle_stats`` sibling).

Policy note: ``strip_repeated_spans`` removes EVERY duplicated span,
including the "first" occurrence — a keep-one-copy variant is
deliberately not offered at span level because spans are merged UNIONS
of many overlapping window hits with different duplication partners:
no single occurrence is canonical, and Lee et al.'s own release
removes all occurrences the same way. For keep-first semantics use the
coarser granularities (exact_duplicates / strip_duplicated_lines),
where occurrences are well-defined.

Reference analog: the reference has no substring dedup; this fills the
corpus-hygiene tier between exact-document (operators/dedup.py:170) and
near-duplicate (operators/dedup.py:306) dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MIN_LEN = 50

# Window-generation chunk: one outer row owns at most this many window
# positions, so the largest per-row array is chunk_chars ints (~512 KB)
# and the largest carried substring is chunk_chars + L - 1 chars — both
# constants, regardless of document size. Outer chunk count is
# doc_len / chunk_chars (a 100 MB whale -> ~1.5k rows), so neither level
# of the two-level generate scales a per-row allocation with the whale.
DEFAULT_CHUNK_CHARS = 65536

# Occurrence cap above which a gram (or its 8-byte hash class) is
# boilerplate: counted via map-side-combined groupBy and routed around
# the per-key window (positions emitted as hits directly — count > cap
# implies count >= 2). Bounds window-task buffering to cap rows per key.
# Pass max_gram_freq=None to disable explicitly (output identical).
DEFAULT_MAX_GRAM_FREQ = 100_000

# Heavy-key lists up to this size are inlined as isin literals; beyond
# it the broadcast semi/anti joins take over (same semantics) — the
# same two-regime shape as operators/dedup.py STOP_LIST_INLINE_MAX.
HEAVY_LIST_INLINE_MAX = 10_000


def _windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    L: int,
    chunk: int = DEFAULT_CHUNK_CHARS,
) -> DataFrame:
    """(id, pos, g): every length-L character window of every document
    long enough to hold one. Narrow (no shuffle); generated JVM-side in
    two bounded explodes:

    - outer: chunk start offsets 0, C, 2C, ... <= len-L — an array of
      O(doc_len / C) longs (a 100 MB doc at C=64Ki -> ~1.5k elements);
    - inner: positions within one chunk — at most C ints, over a
      carried chunk substring of C + L - 1 chars.

    No generated array or carried string scales with WHOLE-document
    length (a single F.sequence(0, len-L) would put ~10^8 longs of one
    whale into one Generate row — exactly the per-task residency this
    module promises not to have)."""
    return (
        df.where(F.length(text_col) >= L)
        .select(
            F.col(id_col).alias("id"),
            F.col(text_col).alias("_t"),
            F.explode(
                F.sequence(
                    F.lit(0), F.length(text_col) - L, F.lit(int(chunk))
                )
            ).alias("_c0"),
        )
        .select(
            "id",
            "_c0",
            F.least(
                F.lit(int(chunk) - 1), F.length("_t") - L - F.col("_c0")
            ).alias("_hi"),
            F.expr(f"substring(_t, _c0 + 1, {int(chunk) + L - 1})").alias(
                "_ct"
            ),
        )
        .select(
            "id",
            "_c0",
            "_ct",
            F.explode(F.sequence(F.lit(0), F.col("_hi"))).alias("_p"),
        )
        .select(
            "id",
            (F.col("_c0") + F.col("_p")).alias("pos"),
            F.expr(f"substring(_ct, _p + 1, {L})").alias("g"),
        )
    )


# Heavy-key DETECTION samples 1-in-N window positions (hash of
# (id, pos), deterministic). Detection is routing-only — both routes
# re-check exactness — so a missed heavy key only slows the window and
# a false flag only rides the (exact) broadcast route; output is
# identical for EVERY detection outcome (pytest-asserted). At the
# default cap=100k a heavy key still lands ~cap/128 sampled hits, so
# detection is reliable while the counting pass touches 1/64 of the
# corpus (and Catalyst pushes the sample filter below the gram
# projection, so skipped positions never cut their substring).
DEFAULT_HEAVY_SAMPLE = 64


def _heavy_keys(
    rows: DataFrame, key: str, cap: int, sample: int
) -> list | DataFrame | None:
    """Keys LIKELY heavier than ``cap``, counted on a deterministic
    1-in-``sample`` position sample with a map-side-combined groupBy
    (a key repeated 10^9 times partially aggregates to ~one row per
    task — no single-task buffering, unlike a window). Returns None
    (no flagged keys), a literal list (inline regime), or the keys
    DataFrame (broadcast regime). Detection quality affects only the
    plan, never the output (see module note above)."""
    # clamp the sample rate so the flag threshold stays >= 2 sampled
    # hits (review r6: cap // (2*sample) floors to 0 for cap < 2*sample,
    # which would flag every singleton with one sampled occurrence and
    # blow up the "flagged set is bounded-small" broadcast invariant);
    # small caps therefore fall back toward exact detection
    sample = max(1, min(int(sample), int(cap) // 4))
    if sample > 1:
        cand = rows.where(
            F.pmod(F.xxhash64(F.col("id"), F.col("pos")), F.lit(sample))
            == 0
        )
        threshold = int(cap) // (2 * sample)  # >= 2 by the clamp
    else:
        cand = rows
        threshold = int(cap)
    heavy = (
        cand.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > threshold)
        .select(key)
    )
    head = heavy.head(HEAVY_LIST_INLINE_MAX + 1)
    if not head:
        return None
    if len(head) <= HEAVY_LIST_INLINE_MAX:
        return [r[key] for r in head]
    return heavy


def _split_heavy(rows: DataFrame, key: str, cap: int, sample: int):
    """(light, heavy) split of ``rows`` by the key's (sampled)
    occurrence count — heavy ≈ count > cap. Both regimes keep the
    heavy side cheap: an inlined isin literal, or a broadcast
    semi/anti join whose build side is the bounded-small flagged-key
    frame."""
    keys = _heavy_keys(rows, key, cap, sample)
    if keys is None:
        return rows, None
    if isinstance(keys, list):
        return (
            rows.filter(~F.col(key).isin(keys)),
            rows.filter(F.col(key).isin(keys)),
        )
    return (
        rows.join(F.broadcast(keys), key, "left_anti"),
        rows.join(F.broadcast(keys), key, "left_semi"),
    )


def _exact_hits_small(rows: DataFrame) -> DataFrame:
    """Exact >= 2 check for the (small) flagged route WITHOUT a window:
    map-side-combined gram counts — distinct flagged grams are few by
    construction — broadcast back as a semi join. Collision artifacts
    and sampling false-positives occurring once are dropped here, which
    is what makes heavy DETECTION routing-only."""
    gcounts = (
        rows.groupBy("g")
        .agg(F.count(F.lit(1)).alias("_gn"))
        .filter(F.col("_gn") >= 2)
        .select("g")
    )
    return rows.join(F.broadcast(gcounts), "g", "left_semi").select(
        "id", "pos"
    )


def _window_hits(rows: DataFrame, key: str) -> DataFrame:
    """Rows of keys occurring >= 2 times, via a per-key window count
    (one shuffle). Only ever fed key classes bounded by the cap."""
    return (
        rows.withColumn(
            "_n", F.count(F.lit(1)).over(Window.partitionBy(key))
        )
        .where(F.col("_n") >= 2)
        .drop("_n")
    )


def repeated_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = DEFAULT_MIN_LEN,
    prefilter_hash: bool = True,
    max_gram_freq: int | None = DEFAULT_MAX_GRAM_FREQ,
    chunk_chars: int = DEFAULT_CHUNK_CHARS,
    heavy_detect_sample: int = DEFAULT_HEAVY_SAMPLE,
) -> DataFrame:
    """Maximal duplicated character spans, as
    (id, span_start, span_end, span_len) with [span_start, span_end)
    0-based character offsets into the document text. See module
    docstring for semantics and the scale shape.

    ``max_gram_freq`` routes boilerplate grams around the per-key
    windows (output provably identical; bounds window buffering to the
    cap). ``heavy_detect_sample`` makes the detection pass count only
    1-in-N positions (output identical for any value — detection is
    routing-only, both routes re-check exactness; 1 = count every
    position). ``chunk_chars`` bounds per-row generated arrays (output
    independent of it; tune only if L approaches the chunk size)."""
    L = int(min_len)
    if L < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    if max_gram_freq is not None and int(max_gram_freq) < 1:
        raise ValueError(
            f"max_gram_freq must be >= 1 or None, got {max_gram_freq}"
        )
    if int(heavy_detect_sample) < 1:
        raise ValueError(
            f"heavy_detect_sample must be >= 1, got {heavy_detect_sample}"
        )
    sample = int(heavy_detect_sample)
    if int(chunk_chars) < 1:
        raise ValueError(f"chunk_chars must be >= 1, got {chunk_chars}")
    grams = _windows(df, id_col, text_col, L, chunk=int(chunk_chars))

    heavy_rows = None
    if prefilter_hash:
        hashed = grams.withColumn("_h", F.xxhash64("g"))
        if max_gram_freq is not None:
            # heavy HASH classes: count > cap >= 1 means count >= 2, so
            # they are candidates by definition — skip the hash window
            # (they would straggle it); the exact phase below still
            # separates true repeats from hash collisions.
            light, heavy_rows = _split_heavy(
                hashed, "_h", int(max_gram_freq), sample
            )
        else:
            light = hashed
        # phase 1: shuffle 8-byte fingerprints, keep candidate windows
        cand = _window_hits(light, "_h").drop("_h")
    else:
        cand = grams

    if max_gram_freq is not None and prefilter_hash:
        # unflagged hash classes are (whp) under the cap, so grams
        # inside them are too — the exact-phase window needs no second
        # split; a detection miss only raises one window partition,
        # never changes output.
        hits = _window_hits(cand, "g").select("id", "pos")
        if heavy_rows is not None:
            # exact check for the flagged-hash rows WITHOUT a window
            # (_exact_hits_small): collision artifacts and sampling
            # false-positives occurring once are dropped there.
            hits = hits.unionByName(_exact_hits_small(heavy_rows))
    elif max_gram_freq is not None:
        # no hash prefilter: split on the gram itself; flagged grams
        # route around the window through the same exact >= 2 check
        # (which is what makes sampled detection routing-only here too)
        light_cand, heavy_cand = _split_heavy(
            cand, "g", int(max_gram_freq), sample
        )
        hits = _window_hits(light_cand, "g").select("id", "pos")
        if heavy_cand is not None:
            hits = hits.unionByName(_exact_hits_small(heavy_cand))
    else:
        # exact phase: count over the REAL gram (collision-proof)
        hits = _window_hits(cand, "g").select("id", "pos")

    # interval merge, not consecutive-position islands: hit intervals
    # [pos, pos+L) overlap-or-touch exactly when the position gap is
    # <= L, so a new span starts on a gap > L — output spans are
    # maximal AND disjoint (the invariant strip_repeated_spans relies
    # on; consecutive-position grouping broke it for near-offset hits)
    run = Window.partitionBy("id").orderBy("pos")
    runf = run.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    new_span = (
        F.lag("pos").over(run).isNull()
        | (F.col("pos") - F.lag("pos").over(run) > F.lit(L))
    )
    return (
        hits.withColumn("grp", F.sum(new_span.cast("long")).over(runf))
        .groupBy("id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(L)).alias("span_end"),
        )
        .select(
            "id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_len"),
        )
    )


def repeated_gram_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = DEFAULT_MIN_LEN,
    max_gram_freq: int = DEFAULT_MAX_GRAM_FREQ,
    chunk_chars: int = DEFAULT_CHUNK_CHARS,
) -> DataFrame:
    """Lineage row for the boilerplate cap (the ``stop_shingle_stats``
    sibling, operators/dedup.py): (n_grams_distinct, n_heavy_grams,
    n_heavy_positions, max_freq) — how many gram classes the cap routes
    around the window and how skewed the gram frequency distribution
    is. One map-side-combined aggregate over the window table."""
    grams = _windows(df, id_col, text_col, int(min_len), int(chunk_chars))
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    cap = int(max_gram_freq)
    return freq.agg(
        F.count(F.lit(1)).alias("n_grams_distinct"),
        F.sum(F.when(F.col("n") > cap, 1).otherwise(0)).alias(
            "n_heavy_grams"
        ),
        F.sum(F.when(F.col("n") > cap, F.col("n")).otherwise(0)).alias(
            "n_heavy_positions"
        ),
        F.max("n").alias("max_freq"),
    )


def strip_repeated_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply-side: cut every duplicated span out of the text (the
    drop-duplicated-regions policy; documents without spans pass through
    unchanged). Returns the input columns with ``text_col`` replaced by
    the kept text plus ``removed_chars``.

    Spans per document are collected into one sorted array (spans are
    maximal, hence disjoint) and the kept text is rebuilt with a single
    JVM-side ``aggregate`` over the gaps — no UDF, no per-row Python.
    Per-task memory is bounded by the largest single document, exactly
    like conversation assembly (plans/pipeline.py)."""
    sp = (
        spans.groupBy(F.col("id").alias(id_col))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("span_start", "span_end"))
            ).alias("_spans")
        )
    )
    joined = df.join(sp, on=id_col, how="left")
    kept = F.expr(
        f"""CASE WHEN _spans IS NULL THEN {text_col} ELSE
        aggregate(
          _spans,
          struct(0 AS cur, '' AS acc),
          (s, x) -> struct(
            x.span_end AS cur,
            concat(s.acc,
                   substring({text_col}, s.cur + 1, x.span_start - s.cur))
              AS acc),
          s -> concat(s.acc, substring({text_col}, s.cur + 1,
                                       length({text_col}) - s.cur)))
        END"""
    )
    out_cols = [
        kept.alias(text_col) if c == text_col else F.col(c)
        for c in df.columns
    ]
    return joined.select(
        *out_cols,
        (F.length(text_col) - F.length(kept)).alias("removed_chars"),
    )
