"""Exactly-once incremental extraction ticks: Iceberg transcripts in →
extracted turns appended to an Iceberg output table.

The continuous-ingestion shape at 10^12-turn scale: upstream keeps
appending conversation batches; each tick processes ONLY the data files
appended since the last processed source snapshot
(``read_iceberg_increment`` — sequence-window file pruning, no
full-table rescan) and appends the extracted rows downstream. The
last-processed SOURCE snapshot id is stored as a PROPERTY OF THE
OUTPUT TABLE, committed in the same atomic metadata commit as the
appended data (the streaming sink's exactly-once trick): a crash
between extract and commit replays the tick idempotently, and a crash
after the commit is a recorded no-op.

Contract: append-only ingest. Rows DELETED from already-processed
source snapshots are not propagated (no CDC before/after images);
deletes visible at the processed snapshot do apply to the new window.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import SparkSession

SOURCE_SNAPSHOT_PROP = "htrtf.source.last-snapshot-id"
TICK_METRICS_PROP = "htrtf.tick.last-metrics"


def tick_metrics(dest_loc: str) -> dict | None:
    """The last tick's persisted throughput metrics (rows, wall_sec,
    rows_per_sec, processed_snapshot), or None if no tick has recorded
    them yet. Written via a follow-up property commit AFTER the data
    commit — the exactly-once MARKER is atomic with the data; metrics
    are observability and may lag one tick after a crash (documented
    tradeoff, same as native engines' metrics reporters)."""
    from htrtf_spark.sources.iceberg import current_metadata

    props = current_metadata(dest_loc).get("properties", {})
    raw = props.get(TICK_METRICS_PROP)
    return json.loads(raw) if raw else None


def _record_metrics(dest_loc: str, processed: int, rows: int, wall: float) -> None:
    from htrtf_spark.sources.iceberg import set_table_properties

    set_table_properties(
        dest_loc,
        {
            TICK_METRICS_PROP: json.dumps(
                {
                    "processed_snapshot": processed,
                    "rows": rows,
                    "wall_sec": round(wall, 3),
                    "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
                }
            )
        },
    )


def extract_increment_once(
    spark: SparkSession,
    source_loc: str,
    dest_loc: str,
    auto_rebaseline: bool = False,
    rebaseline_on_delete: bool = False,
) -> dict:
    """Run one tick. Returns {"processed_snapshot", "rows", "noop"}
    (plus ``"rebaselined": <reason>`` when the escape hatch fired).

    Raises ``sources.iceberg.ExpiredSnapshotError`` (a KeyError
    subclass) when the persisted source marker has been expired by
    ``expire_snapshots`` — or rolled back off the live branch — on the
    source table: the incremental window cannot be reconstructed and
    retrying can never succeed. With ``auto_rebaseline=True`` the tick
    recovers instead: one atomic OVERWRITE commit rebuilds the
    destination from a full extraction of the source's current
    snapshot, marker updated in the same commit (the delete-retraction
    escape hatch — streaming/rebaseline.py is the stream-side twin).

    ``rebaseline_on_delete=True`` extends the hatch to silent
    retractions: if the unconsumed window contains a retracting
    snapshot (delete / upsert-overwrite / INSERT OVERWRITE,
    ``replace-kind: overwrite``), the tick rebuilds rather than
    append-propagating — strict consistency for consumers that must
    not retain upstream-deleted rows. Compaction / rewrite-manifests
    replace snapshots never trigger it."""
    from htrtf_spark.plans.pipeline import extract_turns
    from htrtf_spark.sources.iceberg import (
        ExpiredSnapshotError,
        _ancestors,
        _find_snapshot,
        append_iceberg_table,
        current_metadata,
        overwrite_iceberg_table,
        read_iceberg_increment,
        read_iceberg_table,
        table_exists,
        write_iceberg_table,
    )

    def _rebaseline(cur: int, reason: str) -> dict:
        t0r = time.monotonic()
        out = extract_turns(
            read_iceberg_table(spark, source_loc, snapshot_id=cur)
        )
        overwrite_iceberg_table(
            out, dest_loc, properties={SOURCE_SNAPSHOT_PROP: str(cur)}
        )
        rows = _committed_added_records(dest_loc)
        _record_metrics(dest_loc, cur, rows, time.monotonic() - t0r)
        return {
            "processed_snapshot": cur,
            "rows": rows,
            "noop": False,
            "rebaselined": reason,
        }

    src_meta = current_metadata(source_loc)
    cur = src_meta["current-snapshot-id"]
    t0 = time.monotonic()

    if not table_exists(dest_loc):
        # first tick: full load of the pinned current snapshot; the
        # processed-snapshot marker rides the CREATE commit itself
        out = extract_turns(
            read_iceberg_table(spark, source_loc, snapshot_id=cur)
        )
        write_iceberg_table(
            out, dest_loc, properties={SOURCE_SNAPSHOT_PROP: str(cur)}
        )
        rows = _committed_added_records(dest_loc)
        _record_metrics(dest_loc, cur, rows, time.monotonic() - t0)
        return {"processed_snapshot": cur, "rows": rows, "noop": False}

    props = current_metadata(dest_loc).get("properties", {})
    if SOURCE_SNAPSHOT_PROP not in props:
        raise ValueError(
            f"{dest_loc} exists but has no {SOURCE_SNAPSHOT_PROP} "
            "property — it was not created by this pipeline"
        )
    last = int(props[SOURCE_SNAPSHOT_PROP])
    if last == cur:
        return {"processed_snapshot": cur, "rows": 0, "noop": True}

    if rebaseline_on_delete:
        # strict-consistency mode: a retracting snapshot in the window
        # means append-propagation would retain rows upstream deleted
        try:
            last_seq = int(_find_snapshot(src_meta, last)["sequence-number"])
        except KeyError:
            last_seq = None  # expired marker: the read below raises
        if last_seq is not None:
            cur_seq = int(_find_snapshot(src_meta, cur)["sequence-number"])
            for sn in _ancestors(src_meta, cur):
                s_seq = int(sn["sequence-number"])
                if not (last_seq < s_seq <= cur_seq):
                    continue
                summ = sn.get("summary", {})
                op = summ.get("operation")
                if op in ("delete", "overwrite") or (
                    op == "replace"
                    and summ.get("replace-kind") == "overwrite"
                ):
                    return _rebaseline(
                        cur,
                        f"retracting snapshot (operation={op}, "
                        f"sequence {s_seq}) in window and "
                        "rebaseline_on_delete is set",
                    )

    # read the window pinned to `cur`: a source append racing this tick
    # is NOT silently marked processed — it is the next tick's window
    try:
        inc = read_iceberg_increment(
            spark, source_loc, from_snapshot_id=last, to_snapshot_id=cur
        )
    except ExpiredSnapshotError as exc:
        if not auto_rebaseline:
            raise
        return _rebaseline(cur, str(exc))
    out = extract_turns(inc)
    append_iceberg_table(
        out, dest_loc, properties={SOURCE_SNAPSHOT_PROP: str(cur)}
    )
    # report rows from the committed snapshot's summary — out.count()
    # here would re-run the whole incremental read + extraction a
    # second time per tick (pure cost; the commit already counted)
    rows = _committed_added_records(dest_loc)
    _record_metrics(dest_loc, cur, rows, time.monotonic() - t0)
    return {"processed_snapshot": cur, "rows": rows, "noop": False}


def _committed_added_records(dest_loc: str) -> int:
    """added-records of the destination's current (just-committed)
    snapshot — free metadata, no recompute of the lazy extraction."""
    from htrtf_spark.sources.iceberg import current_metadata

    meta = current_metadata(dest_loc)
    cur = meta["current-snapshot-id"]
    for s in meta["snapshots"]:
        if s["snapshot-id"] == cur:
            return int(s.get("summary", {}).get("added-records", 0))
    return 0
