"""Delete-retraction escape hatch (streaming/rebaseline.py + the
incremental tick's auto_rebaseline): upstream rollback / expired
markers / retracting snapshots recover via an atomic full rebuild of
the destination, after which incremental consumption resumes with no
duplicate and no gap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from htrtf_spark.plans.incremental import (
    SOURCE_SNAPSHOT_PROP,
    extract_increment_once,
)
from htrtf_spark.sources import iceberg as I
from htrtf_spark.streaming.rebaseline import (
    _latest_stream_offset,
    rebaseline_stream_extraction,
    stream_needs_rebaseline,
)

SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
          "tool string, ts string")


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).withColumn(
        "ts", F.to_timestamp("ts")
    )


def _batch(tag, t0):
    return [
        (f"{tag}-a", 0, "user", f"{tag}  hello", None, t0),
        (f"{tag}-a", 1, "assistant", f"{tag} reply", None, t0),
        (f"{tag}-b", 0, "user", f"{tag}  other", "tool_x", t0),
    ]


# ------------------------------------------------------ incremental tick
def test_incremental_auto_rebaseline_after_expire(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    I.write_iceberg_table(_mk(spark, _batch("b1", "2024-01-01 00:00:00")), src)
    extract_increment_once(spark, src, dst)
    I.append_iceberg_table(
        _mk(spark, _batch("b2", "2024-01-01 00:01:00")), src
    )
    I.expire_snapshots(src, keep_last=1)  # drops the marker snapshot

    # without the hatch: descriptive error, tick can never succeed
    with pytest.raises(I.ExpiredSnapshotError):
        extract_increment_once(spark, src, dst)

    r = extract_increment_once(spark, src, dst, auto_rebaseline=True)
    assert "rebaselined" in r and not r["noop"]
    got = I.read_iceberg_table(spark, dst)
    assert got.count() == 6  # full rebuild of the current snapshot
    # marker moved: the next tick is a clean no-op, and a fresh append
    # flows incrementally again
    assert extract_increment_once(spark, src, dst)["noop"]
    I.append_iceberg_table(
        _mk(spark, _batch("b3", "2024-01-01 00:02:00")), src
    )
    r3 = extract_increment_once(spark, src, dst)
    assert "rebaselined" not in r3 and r3["rows"] == 3
    assert I.read_iceberg_table(spark, dst).count() == 9


def test_incremental_auto_rebaseline_after_rollback(spark, tmp_path):
    """Rollback past the marker retracts already-emitted rows; the
    hatch rebuilds the destination to exactly the rolled-back state
    (the OVERWRITE drops the retracted extraction output)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    s1 = I.write_iceberg_table(
        _mk(spark, _batch("b1", "2024-01-01 00:00:00")), src
    )
    extract_increment_once(spark, src, dst)
    I.append_iceberg_table(
        _mk(spark, _batch("b2", "2024-01-01 00:01:00")), src
    )
    extract_increment_once(spark, src, dst)
    assert I.read_iceberg_table(spark, dst).count() == 6

    I.rollback_to_snapshot(src, s1)
    with pytest.raises(I.ExpiredSnapshotError):
        extract_increment_once(spark, src, dst)
    r = extract_increment_once(spark, src, dst, auto_rebaseline=True)
    assert "rebaselined" in r
    got = I.read_iceberg_table(spark, dst)
    assert got.count() == 3
    assert got.filter("conv_id like 'b2-%'").count() == 0  # retracted
    # appends on the rolled-back branch flow incrementally again
    I.append_iceberg_table(
        _mk(spark, _batch("b3", "2024-01-01 00:02:00")), src
    )
    r3 = extract_increment_once(spark, src, dst)
    assert "rebaselined" not in r3 and r3["rows"] == 3
    assert I.read_iceberg_table(spark, dst).count() == 6


def test_incremental_rebaseline_on_delete_strict_mode(spark, tmp_path):
    """rebaseline_on_delete: an upstream DELETE in the window triggers
    a full rebuild (destination drops the deleted rows) while
    compaction — also in the window — never does."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    I.write_iceberg_table(_mk(spark, _batch("b1", "2024-01-01 00:00:00")), src)
    extract_increment_once(spark, src, dst)

    I.delete_iceberg_rows(
        spark.createDataFrame([("b1-a",)], "conv_id string"), src, ["conv_id"]
    )
    r = extract_increment_once(
        spark, src, dst, rebaseline_on_delete=True
    )
    assert "rebaselined" in r
    got = I.read_iceberg_table(spark, dst)
    assert got.count() == 1  # b1-a's two turns dropped downstream too
    assert got.filter("conv_id = 'b1-a'").count() == 0

    # compaction is a non-retracting replace: strict mode stays
    # incremental (no rebaseline, no spurious rebuild)
    I.compact_iceberg_table(spark, src)
    r2 = extract_increment_once(
        spark, src, dst, rebaseline_on_delete=True
    )
    assert "rebaselined" not in r2
    assert I.read_iceberg_table(spark, dst).count() == 1


def test_incremental_delete_not_propagated_without_flag(spark, tmp_path):
    """Default contract unchanged: append-only propagation retains
    upstream-deleted rows (the documented tradeoff the flag opts out
    of)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    I.write_iceberg_table(_mk(spark, _batch("b1", "2024-01-01 00:00:00")), src)
    extract_increment_once(spark, src, dst)
    I.delete_iceberg_rows(
        spark.createDataFrame([("b1-a",)], "conv_id string"), src, ["conv_id"]
    )
    r = extract_increment_once(spark, src, dst)
    assert "rebaselined" not in r
    assert I.read_iceberg_table(spark, dst).count() == 3  # retained


# -------------------------------------------------------- streaming path
def _drain(spark, src, dest, ckpt, starting_sequence=None):
    from jobs.run_streaming_extraction import build_query

    q = build_query(
        spark, src, dest, ckpt, available_now=True,
        starting_sequence=starting_sequence,
    )
    q.awaitTermination(120)


def test_stream_rebaseline_after_rollback(spark, tmp_path):
    """End-to-end streaming escape hatch: rollback upstream → detect →
    atomic rebuild + retired checkpoint → resume with startingSequence:
    no duplicate, no gap, destination byte-equal to the batch path."""
    from htrtf_spark.plans.pipeline import extract_turns

    src = str(tmp_path / "src")
    dest = str(tmp_path / "dest")
    ckpt = str(tmp_path / "ckpt")

    s1 = I.write_iceberg_table(
        _mk(spark, _batch("b1", "2024-01-01 00:00:00")), src
    )
    _drain(spark, src, dest, ckpt)
    I.append_iceberg_table(
        _mk(spark, _batch("b2", "2024-01-01 00:01:00")), src
    )
    _drain(spark, src, dest, ckpt)
    assert I.read_iceberg_table(spark, dest).count() == 6
    assert stream_needs_rebaseline(src, ckpt) is None

    I.rollback_to_snapshot(src, s1)
    reason = stream_needs_rebaseline(src, ckpt)
    assert reason is not None and "roll" in reason

    info = rebaseline_stream_extraction(spark, src, dest, ckpt)
    assert info["rows"] == 3 and info["retired_checkpoint"] is not None
    import os

    assert not os.path.exists(ckpt)  # retired, fresh query starts clean
    assert os.path.exists(info["retired_checkpoint"])
    got = I.read_iceberg_table(spark, dest)
    assert got.count() == 3
    assert got.filter("conv_id like 'b2-%'").count() == 0  # retracted

    # resume: new appends drain incrementally from the pinned sequence
    I.append_iceberg_table(
        _mk(spark, _batch("b3", "2024-01-01 00:02:00")), src
    )
    _drain(
        spark, src, dest, ckpt,
        starting_sequence=info["starting_sequence"],
    )
    got = I.read_iceberg_table(spark, dest)
    assert got.count() == 6  # b1 once (from rebuild) + b3 once, no b2
    assert got.filter("conv_id like 'b1-%'").count() == 3
    assert got.filter("conv_id like 'b3-%'").count() == 3

    # byte-parity with the batch extraction of the live source
    want = extract_turns(I.read_iceberg_table(spark, src), num_partitions=None)
    g = {(r["conv_id"], r["turn_idx"]): r["extracted_text"]
         for r in got.collect()}
    w = {(r["conv_id"], r["turn_idx"]): r["extracted_text"]
         for r in want.collect()}
    assert g == w

    # steady state again: nothing to rebaseline, re-drain is a no-op
    assert stream_needs_rebaseline(src, ckpt) is None
    _drain(spark, src, dest, ckpt)
    assert I.read_iceberg_table(spark, dest).count() == 6


def test_stream_needs_rebaseline_cases(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    I.write_iceberg_table(_mk(spark, _batch("b1", "2024-01-01 00:00:00")), src)
    # no checkpoint yet: fresh stream bootstraps, nothing to retract
    assert stream_needs_rebaseline(src, ckpt) is None

    dest = str(tmp_path / "dest")
    _drain(spark, src, dest, ckpt)
    assert _latest_stream_offset(ckpt) == {"seq": 1}
    assert stream_needs_rebaseline(src, ckpt) is None

    # compaction: replace-kind=compact is not a retraction, with or
    # without strict mode
    I.append_iceberg_table(
        _mk(spark, _batch("b2", "2024-01-01 00:01:00")), src
    )
    I.compact_iceberg_table(spark, src)
    assert stream_needs_rebaseline(src, ckpt) is None
    assert stream_needs_rebaseline(src, ckpt, on_upstream_delete=True) is None

    # a delete in the unconsumed window: only strict mode reports it
    I.delete_iceberg_rows(
        spark.createDataFrame([("b1-a",)], "conv_id string"), src, ["conv_id"]
    )
    assert stream_needs_rebaseline(src, ckpt) is None
    strict = stream_needs_rebaseline(src, ckpt, on_upstream_delete=True)
    assert strict is not None and "retracting" in strict

    # expired history below the consumed offset: still incremental-safe
    I.expire_snapshots(src, keep_last=1)
    assert stream_needs_rebaseline(src, ckpt) is None


def test_starting_sequence_skips_bootstrap(spark, tmp_path):
    """A fresh query with startingSequence never re-emits the already
    materialized state — only commits after the pinned sequence."""
    src = str(tmp_path / "src")
    dest = str(tmp_path / "dest")
    ckpt = str(tmp_path / "ckpt")
    I.write_iceberg_table(_mk(spark, _batch("b1", "2024-01-01 00:00:00")), src)
    I.append_iceberg_table(
        _mk(spark, _batch("b2", "2024-01-01 00:01:00")), src
    )
    _drain(spark, src, dest, ckpt, starting_sequence=1)
    got = I.read_iceberg_table(spark, dest)
    assert got.count() == 3
    assert got.filter("conv_id like 'b2-%'").count() == 3
