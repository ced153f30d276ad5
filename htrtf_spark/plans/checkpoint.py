"""Checkpoint/resume with per-partition lineage (north-rule requirement).

Reference analog: per-epoch model checkpoints + latest_checkpoint resume
(/root/reference/Modules/tasks.py:97,41,141; Saver at
Projects/IAM_lines/Structure_006/Structure_006.py:163) and the
append-mode log flushed at stage boundaries (Modules/utils.py:3-27).

Design: work is split into ``n_buckets`` deterministic buckets by
``pmod(xxhash64(conv_id), n_buckets)`` — a conversation never straddles
buckets, so each bucket's output is independent and idempotent. Each
bucket commit is:

  1. overwrite-write the bucket's extracted rows to  <out>/data/bucket=<b>/
  2. atomically publish a manifest row (write temp file + os.replace) to
     <out>/_manifest/bucket-<b>.parquet  carrying lineage + throughput

Resume = list manifest, skip completed buckets, recompute the rest. A
bucket killed mid-write has no manifest row → its partial data dir is
simply overwritten on the next run. Restart therefore produces
byte-identical output to an uninterrupted run (tested).

At cluster scale the same pattern holds: the manifest is tiny (one row
per bucket), data writes go through the committer, and bucket count is
chosen so one bucket ≈ one executor-wave of work.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from htrtf_spark.plans.pipeline import extract_turns

MANIFEST_DIR = "_manifest"
DATA_DIR = "data"


class KilledForTest(RuntimeError):
    """Raised by the fail-injection hook in tests."""


def _manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"bucket-{bucket:05d}.parquet")


def completed_buckets(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.startswith("bucket-") and name.endswith(".parquet"):
            done.add(int(name[len("bucket-") : -len(".parquet")]))
    return done


def _publish_manifest_row(out_dir: str, row: dict) -> None:
    """Atomic publish: temp file + os.replace (write-temp-rename, so a
    crash can never leave a half manifest — SURVEY.md §7.4 risk 5)."""
    path = _manifest_path(out_dir, row["bucket"])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    table = pa.Table.from_pylist([row])
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, MANIFEST_DIR, "*.parquet"))


def run_extraction_checkpointed(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    n_buckets: int = 16,
    num_partitions: int | None = None,
    fail_after_buckets: int | None = None,
) -> list[int]:
    """Run (or resume) the extraction job bucket-by-bucket.

    Returns the list of buckets computed in THIS invocation. Skips buckets
    already in the manifest (resume = anti-join pending work, SURVEY.md
    S10). ``fail_after_buckets`` injects a crash for the resume test.
    """
    bucket_col = F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    src = transcripts.withColumn("_bucket", bucket_col)
    done = completed_buckets(out_dir)
    ran: list[int] = []
    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.monotonic()
        part = src.filter(F.col("_bucket") == b).drop("_bucket")
        extracted = extract_turns(part, num_partitions=num_partitions)
        data_path = os.path.join(out_dir, DATA_DIR, f"bucket={b}")
        extracted.write.mode("overwrite").parquet(data_path)
        # Count from what was actually committed (validates the write too).
        written = spark.read.parquet(data_path)
        agg = written.agg(
            F.count("*").alias("rows_out"),
            F.sum(F.col("reject_reason").isNotNull().cast("long")).alias("rej"),
        ).collect()[0]
        wall_ms = int((time.monotonic() - t0) * 1000)
        _publish_manifest_row(
            out_dir,
            {
                "bucket": b,
                "rows_in": agg["rows_out"],  # 1:1 in/out incl. rejects
                "rows_out": agg["rows_out"] - (agg["rej"] or 0),
                "rows_rejected": int(agg["rej"] or 0),
                "wall_ms": wall_ms,
                "turns_per_sec": float(agg["rows_out"]) / max(wall_ms / 1000.0, 1e-9),
                "finished_at": datetime.now(timezone.utc).isoformat(),
            },
        )
        ran.append(b)
        if fail_after_buckets is not None and len(ran) >= fail_after_buckets:
            raise KilledForTest(f"injected failure after {len(ran)} buckets")
    return ran


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, DATA_DIR))


def prune_checkpoints(root_dir: str, keep_last: int = 5) -> list[str]:
    """Retention policy over job-run checkpoint directories (the
    max_to_keep=5 analog, /root/reference/Projects/IAM_lines/
    Structure_006/Structure_006.py:163): keeps the ``keep_last`` most
    recently finished run dirs under ``root_dir`` (by the newest manifest
    mtime inside each), removes the rest. Returns removed dirs."""
    import shutil

    runs = []
    for name in sorted(os.listdir(root_dir)):
        mdir = os.path.join(root_dir, name, MANIFEST_DIR)
        if os.path.isdir(mdir):
            mtimes = [
                os.path.getmtime(os.path.join(mdir, f))
                for f in os.listdir(mdir)
                if f.endswith(".parquet")
            ]
            if mtimes:
                runs.append((max(mtimes), os.path.join(root_dir, name)))
    runs.sort(reverse=True)
    removed = []
    for _mt, path in runs[keep_last:]:
        shutil.rmtree(path)
        removed.append(path)
    return removed
