"""Exactly-once incremental extraction ticks (plans/incremental.py):
first tick = full load, repeat tick = no-op, appended source batches
are processed once each, and source deletes of already-processed rows
are not propagated (append-only ingest contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from htrtf_spark.plans.incremental import (
    SOURCE_SNAPSHOT_PROP,
    extract_increment_once,
)
from htrtf_spark.sources import iceberg as I


@pytest.fixture()
def src_table(spark, tmp_path):
    rows = [
        ("conv-a", 0, "user", "hello   world", None, "2024-01-01 00:00:00"),
        ("conv-a", 1, "assistant", "hi there", None, "2024-01-01 00:00:01"),
        ("conv-b", 0, "user", "second  conv", "tool_x", "2024-01-01 00:01:00"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    loc = str(tmp_path / "src")
    I.write_iceberg_table(df, loc)
    return loc, df


def test_incremental_ticks_exactly_once(spark, tmp_path, src_table):
    src, df = src_table
    dst = str(tmp_path / "dst")

    r1 = extract_increment_once(spark, src, dst)
    assert not r1["noop"] and r1["rows"] == 3
    out1 = I.read_iceberg_table(spark, dst)
    assert out1.count() == 3
    assert sorted(
        r["extracted_text"] for r in out1.collect()
    ) == ["hello world", "hi there", "second conv"]

    # idempotent: nothing new upstream → no-op, no rows appended
    r2 = extract_increment_once(spark, src, dst)
    assert r2["noop"]
    assert I.read_iceberg_table(spark, dst).count() == 3

    # append a batch upstream → exactly that batch flows through
    batch2 = df.withColumn("conv_id", F.concat(F.lit("b2-"), "conv_id"))
    I.append_iceberg_table(batch2, src)
    r3 = extract_increment_once(spark, src, dst)
    assert not r3["noop"] and r3["rows"] == 3
    out3 = I.read_iceberg_table(spark, dst)
    assert out3.count() == 6
    assert out3.filter("conv_id like 'b2-%'").count() == 3

    # marker recorded atomically with the data
    props = I.current_metadata(dst)["properties"]
    assert int(props[SOURCE_SNAPSHOT_PROP]) == r3["processed_snapshot"]

    # deletes of already-processed source rows do NOT propagate
    keys = spark.createDataFrame([("conv-a",)], "conv_id string")
    I.delete_iceberg_rows(keys, src, ["conv_id"])
    r4 = extract_increment_once(spark, src, dst)
    assert not r4["noop"] and r4["rows"] == 0  # delete snapshot, no new files
    assert I.read_iceberg_table(spark, dst).count() == 6


def test_incremental_refuses_foreign_dest(spark, tmp_path, src_table):
    src, df = src_table
    dst = str(tmp_path / "foreign")
    I.write_iceberg_table(
        df.select("conv_id", "turn_idx", "role", "text"), dst
    )
    with pytest.raises(ValueError, match="not created by this pipeline"):
        extract_increment_once(spark, src, dst)
