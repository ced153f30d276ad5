"""Continuous-ingest dedup ticks against a PERSISTED corpus index.

The per-batch production shape of incremental dedup at 10^12-turn
scale: the corpus band index (and its stop list, and the exact-dup
fingerprints) are built ONCE and persisted as Iceberg tables; every
ingest tick probes the persisted index — O(batch × bands) — and
appends only what it accepts. The corpus is NEVER rescanned and the
index NEVER rebuilt per tick (the failure mode the operator exists to
avoid; VERDICT r3 #3).

Layout (two Iceberg tables):

- ``corpus_loc``: accepted documents ``(id string, text string,
  fp string)`` — ``fp`` = md5(text) persisted at write time, so the
  exact-dup probe is a column-pruned scan of one 32-char column, never
  a full-text rescan.
- ``index_loc``: ``(id string, band_id int, band_val string)``. Band
  rows carry ``band_id >= 0``; the corpus STOP-SHINGLE list is stored
  in the SAME table as rows with ``band_id = -1`` (``band_val`` = the
  shingle, ``id`` null) so index + stop commit and replay together —
  probes MUST use the index's own stop list (a per-batch cap would
  band asymmetrically; ADVICE r3 medium).

Exactly-once contract: each tick carries a caller-supplied
``batch_id``; the last applied id is a PROPERTY of the corpus table,
committed atomically with the accepted rows. Commit order is index
append → corpus append (with marker): a crash between them replays
the tick, re-appending index rows — harmless duplicates, because
probes only use DISTINCT (band_id, band_val) and the replay probe
anti-joins the batch's own ids out of the index first (so the crashed
attempt's rows cannot make the batch flag itself).

Intra-batch near-dups: a tick exact-dedups WITHIN the batch
(keep-first by id) but does not LSH-cluster inside the batch — two
mutually-near (non-identical) novel documents in the SAME tick are
both accepted, exactly like native ingest pipelines that bound
intra-batch work; run near-dup clustering on the corpus periodically
if that matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from htrtf_spark.operators.dedup import (
    DEFAULT_BAND_WIDTH,
    DEFAULT_MAX_DOC_FREQ,
    DEFAULT_MINHASHES,
    DEFAULT_NGRAM,
    band_index,
    corpus_stop_list,
    incremental_dedup_flags,
)

BATCH_ID_PROP = "htrtf.dedup.last-batch-id"
STOP_BAND_ID = -1


def _norm_docs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(text_col).alias("text"),
        F.md5(F.col(text_col)).alias("fp"),
    )


def _index_rows(
    docs: DataFrame, stop: DataFrame | None,
    n: int, k: int, band_width: int,
) -> DataFrame:
    bands = band_index(
        docs, "id", "text", n, k, band_width,
        max_doc_freq=None, stop_list=stop,
    ).select("id", "band_id", "band_val")
    if stop is None:
        return bands
    stop_rows = stop.select(
        F.lit(None).cast("string").alias("id"),
        F.lit(STOP_BAND_ID).alias("band_id"),
        F.col("ng").alias("band_val"),
    )
    return bands.unionByName(stop_rows)


def dedup_ingest_bootstrap(
    spark: SparkSession,
    docs_df: DataFrame,
    corpus_loc: str,
    index_loc: str,
    id_col: str = "id",
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    k: int = DEFAULT_MINHASHES,
    band_width: int = DEFAULT_BAND_WIDTH,
    max_doc_freq: int | None = DEFAULT_MAX_DOC_FREQ,
    batch_id: str = "bootstrap",
) -> dict:
    """Create the corpus + index tables from an initial document set
    (exact-deduped keep-first within the set). Crash-resumable: the
    index is created first and is a deterministic function of the
    batch, so a rerun that finds the index but not the corpus skips
    straight to the corpus create."""
    from htrtf_spark.sources.iceberg import table_exists, write_iceberg_table

    if table_exists(corpus_loc):
        raise FileExistsError(f"corpus already exists at {corpus_loc}")
    # cache: the deduped-docs pipeline (fp shuffle + semi-join over the
    # whole seed corpus) feeds the stop list, the index write AND the
    # corpus write — uncached it would re-execute per consumer
    docs = _dedup_within(_norm_docs(docs_df, id_col, text_col)).cache()
    stop = (
        None if max_doc_freq is None
        else corpus_stop_list(docs, "id", "text", n, max_doc_freq)
    )
    if not table_exists(index_loc):
        write_iceberg_table(
            _index_rows(docs, stop, n, k, band_width), index_loc
        )
    write_iceberg_table(
        docs, corpus_loc, properties={BATCH_ID_PROP: batch_id}
    )
    docs.unpersist()
    # count from the committed snapshot's summary — free metadata
    from htrtf_spark.sources.iceberg import current_metadata

    meta = current_metadata(corpus_loc)
    cur = meta["current-snapshot-id"]
    n_docs = next(
        int(sn.get("summary", {}).get("added-records", 0))
        for sn in meta["snapshots"]
        if sn["snapshot-id"] == cur
    )
    return {"batch_id": batch_id, "accepted": n_docs, "noop": False}


def _dedup_within(docs: DataFrame) -> DataFrame:
    """Exact keep-first (min id) within one batch — one fp shuffle.
    Column order pinned (joins move key columns first; Iceberg appends
    are order-checked)."""
    w_min = docs.groupBy("fp").agg(F.min("id").alias("id"))
    return docs.join(w_min, ["fp", "id"], "left_semi").select("id", "text", "fp")


def dedup_ingest_tick(
    spark: SparkSession,
    new_df: DataFrame,
    corpus_loc: str,
    index_loc: str,
    batch_id: str,
    id_col: str = "id",
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    k: int = DEFAULT_MINHASHES,
    band_width: int = DEFAULT_BAND_WIDTH,
) -> dict:
    """One ingest tick: probe the persisted index, append accepted
    (novel) docs to the corpus and their band rows to the index.
    Replay-safe per ``batch_id`` (see module docstring). Returns
    {"batch_id", "accepted", "flagged_exact", "flagged_lsh", "noop"}."""
    from htrtf_spark.sources.iceberg import (
        append_iceberg_table,
        current_metadata,
        read_iceberg_table,
    )

    props = current_metadata(corpus_loc).get("properties", {})
    if props.get(BATCH_ID_PROP) == batch_id:
        return {"batch_id": batch_id, "accepted": 0,
                "flagged_exact": 0, "flagged_lsh": 0, "noop": True}

    docs = _dedup_within(_norm_docs(new_df, id_col, text_col)).cache()
    idx_all = read_iceberg_table(spark, index_loc)
    stop = (
        idx_all.filter(F.col("band_id") == STOP_BAND_ID)
        .select(F.col("band_val").alias("ng"))
    )
    # anti-join the batch's own ids out of the band rows: a replayed
    # tick whose index append committed must not flag the batch
    # against itself
    bands = (
        idx_all.filter(F.col("band_id") >= 0)
        .join(docs.select("id"), "id", "left_anti")
    )
    fps = read_iceberg_table(spark, corpus_loc).select("fp")
    flags = incremental_dedup_flags(
        docs, id_col="id", text_col="text",
        n=n, k=k, band_width=band_width,
        corpus_index=bands, corpus_stop=stop, corpus_fps=fps,
    ).cache()
    accepted = docs.join(
        flags.filter(F.col("novel") == 1).select("id"), "id", "left_semi"
    ).select("id", "text", "fp")
    counts = {
        r["k"]: r["v"]
        for r in flags.selectExpr(
            "'exact' AS k", "CAST(SUM(exact_dup) AS LONG) AS v"
        ).unionByName(
            flags.selectExpr("'lsh' AS k", "CAST(SUM(lsh_hit) AS LONG) AS v")
        ).unionByName(
            flags.selectExpr("'novel' AS k", "CAST(SUM(novel) AS LONG) AS v")
        ).collect()
    }
    # index first (replay-tolerant), then corpus + marker (atomic).
    # Accepted docs band under the INDEX'S OWN stop list (symmetric
    # cap); the stop rows themselves are bootstrap-written and are not
    # re-appended per tick.
    new_bands = band_index(
        accepted, "id", "text", n, k, band_width,
        max_doc_freq=None, stop_list=stop,
    ).select("id", "band_id", "band_val")
    append_iceberg_table(new_bands, index_loc)
    append_iceberg_table(
        accepted, corpus_loc, properties={BATCH_ID_PROP: batch_id}
    )
    docs.unpersist()
    flags.unpersist()
    return {
        "batch_id": batch_id,
        "accepted": int(counts.get("novel") or 0),
        "flagged_exact": int(counts.get("exact") or 0),
        "flagged_lsh": int(counts.get("lsh") or 0),
        "noop": False,
    }


def maintain_index(spark: SparkSession, index_loc: str) -> dict:
    """Periodic index maintenance: rewrite the band-index table with
    DISTINCT rows in one replace snapshot. Crash-replayed ticks append
    duplicate band rows (harmless for probes — they distinct — but
    they accumulate storage and probe input); many small per-tick
    appends also fragment the table. One overwrite dedupes and
    compacts both. Stop rows (band_id = -1) are preserved.

    NOT concurrency-safe with a running tick: the overwrite replaces
    the table with the rows read at call time, so an index append
    landing mid-maintenance would be dropped. Run it from the tick
    scheduler's own loop (between ticks), like any table maintenance."""
    from htrtf_spark.sources.iceberg import (
        overwrite_iceberg_table,
        read_iceberg_table,
    )

    idx = read_iceberg_table(spark, index_loc)
    before = idx.count()
    distinct = idx.distinct()
    overwrite_iceberg_table(
        distinct.select("id", "band_id", "band_val"), index_loc
    )
    after = read_iceberg_table(spark, index_loc).count()
    return {"rows_before": before, "rows_after": after,
            "duplicates_removed": before - after}
