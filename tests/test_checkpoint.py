"""Checkpoint/resume: kill after k buckets, restart, output identical to an
uninterrupted run; lineage manifest complete and conserving."""

from __future__ import annotations

import pandas as pd
import pytest

from htrtf_spark import synth
from htrtf_spark.plans import checkpoint as ckpt
from htrtf_spark.plans.pipeline import extract_turns
from htrtf_spark.schema import TRANSCRIPTS_SCHEMA

N_BUCKETS = 6


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return (
        pdf.sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
        .reindex(sorted(pdf.columns), axis=1)
    )


def test_kill_and_resume_identical(spark, tmp_path):
    src_pdf = synth.synth_pandas(n_convs=25, seed=11)
    df = spark.createDataFrame(src_pdf, schema=TRANSCRIPTS_SCHEMA)

    oneshot = _sorted(extract_turns(df).toPandas())

    out_dir = str(tmp_path / "ck")
    with pytest.raises(ckpt.KilledForTest):
        ckpt.run_extraction_checkpointed(
            spark, df, out_dir, n_buckets=N_BUCKETS, fail_after_buckets=2
        )
    assert len(ckpt.completed_buckets(out_dir)) == 2

    ran = ckpt.run_extraction_checkpointed(spark, df, out_dir, n_buckets=N_BUCKETS)
    assert len(ran) == N_BUCKETS - 2
    assert ckpt.completed_buckets(out_dir) == set(range(N_BUCKETS))

    resumed = _sorted(ckpt.read_output(spark, out_dir).drop("bucket").toPandas())
    pd.testing.assert_frame_equal(oneshot, resumed)

    # second resume is a no-op (idempotent)
    assert ckpt.run_extraction_checkpointed(spark, df, out_dir, n_buckets=N_BUCKETS) == []


def test_checkpoint_retention(spark, tmp_path):
    """max_to_keep analog: only the newest k run dirs survive pruning."""
    import os
    import time

    src = spark.createDataFrame(
        synth.synth_pandas(n_convs=4, seed=1), schema=TRANSCRIPTS_SCHEMA
    )
    root = str(tmp_path / "runs")
    for i in range(4):
        ckpt.run_extraction_checkpointed(spark, src, f"{root}/run{i}", n_buckets=2)
        time.sleep(0.05)
    removed = ckpt.prune_checkpoints(root, keep_last=2)
    assert sorted(os.path.basename(p) for p in removed) == ["run0", "run1"]
    assert sorted(os.listdir(root)) == ["run2", "run3"]


def test_manifest_lineage_conservation(spark, tmp_path):
    src_pdf = synth.synth_pandas(n_convs=15, seed=13)
    df = spark.createDataFrame(src_pdf, schema=TRANSCRIPTS_SCHEMA)
    out_dir = str(tmp_path / "ck2")
    ckpt.run_extraction_checkpointed(spark, df, out_dir, n_buckets=N_BUCKETS)
    man = ckpt.read_manifest(spark, out_dir).toPandas()
    assert len(man) == N_BUCKETS
    assert int(man["rows_in"].sum()) == len(src_pdf)
    assert int(man["rows_out"].sum() + man["rows_rejected"].sum()) == len(src_pdf)
    assert (man["wall_ms"] >= 0).all()
    assert (man["turns_per_sec"] >= 0).all()


def test_resume_refuses_bucket_count_change(spark, tmp_path):
    """Resuming a partial manifest with a different n_buckets would mix
    two incompatible partitionings — must be refused, not corrupted."""
    df = spark.createDataFrame(
        synth.synth_pandas(n_convs=10, seed=3), schema=TRANSCRIPTS_SCHEMA
    )
    out_dir = str(tmp_path / "ck3")
    with pytest.raises(ckpt.KilledForTest):
        ckpt.run_extraction_checkpointed(
            spark, df, out_dir, n_buckets=4, fail_after_buckets=1
        )
    with pytest.raises(ValueError, match="n_buckets"):
        ckpt.run_extraction_checkpointed(spark, df, out_dir, n_buckets=8)
    # original count still resumes fine
    ckpt.run_extraction_checkpointed(spark, df, out_dir, n_buckets=4)
    assert ckpt.completed_buckets(out_dir) == set(range(4))


def test_job_cli_day_range_over_iceberg(spark, tmp_path):
    """Drive the spark-submit entrypoint end to end: extraction from a
    days(ts)-partitioned Iceberg table with --day-range prunes to the
    requested days and the checkpointed output holds exactly those
    turns."""
    import os
    import subprocess
    import sys

    from pyspark.sql import functions as F

    from htrtf_spark.sources import iceberg as I

    rows = []
    for d in (1, 2, 3):
        for t in range(4):
            rows.append(
                (f"conv-{d}", t, "user", f"day {d} turn {t}", None,
                 f"2024-01-{d:02d} 0{t}:00:00")
            )
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    loc = str(tmp_path / "daytbl")
    I.write_iceberg_table(df, loc, partition_by=["days(ts)"])

    out = str(tmp_path / "out")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    res = subprocess.run(
        [
            sys.executable, "/root/repo/jobs/run_extraction.py",
            "--iceberg-table", loc,
            "--day-range", "2024-01-01:2024-01-02",
            "--output", out, "--buckets", "2",
        ],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]

    got = ckpt.read_output(spark, out)
    assert got.count() == 8  # days 1-2 only, 4 turns each
    assert sorted(r["conv_id"] for r in got.select("conv_id").distinct().collect()) == [
        "conv-1", "conv-2"
    ]
