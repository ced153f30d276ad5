"""Checkpoint/resume with per-partition lineage (north-rule requirement).

Reference analog: per-epoch model checkpoints + latest_checkpoint resume
(/root/reference/Modules/tasks.py:97,41,141; Saver at
Projects/IAM_lines/Structure_006/Structure_006.py:163) and the
append-mode log flushed at stage boundaries (Modules/utils.py:3-27).

Design: work splits into ``n_buckets`` deterministic buckets by
``pmod(xxhash64(conv_id), n_buckets)`` — a conversation never straddles
buckets, so each bucket's output is independent and idempotent. A run is:

  1. ONE extraction pass over the pending buckets only, written
     ``partitionBy(_bucket)`` into ``<out>/_staging/`` (the input is
     scanned once per resume attempt, never once per bucket — at 100 TB
     a per-bucket rescan would read n_buckets x corpus);
  2. per pending bucket, an atomic COMMIT: FileSystem.rename of the
     staged directory to ``<out>/data/bucket=<b>/`` followed by the
     manifest row publish (write-temp-rename, so a crash can never leave
     a half manifest — SURVEY.md §7.4 risk 5).

Resume = list manifest, recompute only missing buckets. A kill during
staging commits nothing (the staging dir is discarded on restart); a
kill during the commit loop keeps every published bucket. Restart
therefore produces byte-identical output to an uninterrupted run
(tested). Every manifest row records ``n_buckets`` and a run with a
different bucket count against a partial manifest is REFUSED — the two
partitionings are incompatible and mixing them would silently duplicate
and drop conversations.

All filesystem metadata operations go through the Hadoop FileSystem API
of ``out_dir``'s scheme (local, HDFS, s3a, ...), so the same job works
under ``spark-submit --master <cluster>`` with a remote --output; only
``prune_checkpoints`` is a local-filesystem utility.
"""

from __future__ import annotations

import os
import tempfile
import time
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from htrtf_spark.plans.pipeline import extract_turns

MANIFEST_DIR = "_manifest"
DATA_DIR = "data"
STAGING_DIR = "_staging"

_MANIFEST_SCHEMA = (
    "bucket int, n_buckets int, rows_in long, rows_out long, "
    "rows_rejected long, wall_ms long, turns_per_sec double, "
    "finished_at string"
)


class KilledForTest(RuntimeError):
    """Raised by the fail-injection hook in tests."""


# ---------------------------------------------------------------- FS layer
def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def _exists(spark: SparkSession, path: str) -> bool:
    fs, jp, _ = _fs(spark, path)
    return bool(fs.exists(jp))


def _delete(spark: SparkSession, path: str) -> None:
    fs, jp, _ = _fs(spark, path)
    if fs.exists(jp):
        fs.delete(jp, True)


def _mkdirs(spark: SparkSession, path: str) -> None:
    fs, jp, _ = _fs(spark, path)
    fs.mkdirs(jp)


def _rename(spark: SparkSession, src: str, dst: str) -> None:
    fs, jsrc, jvm = _fs(spark, src)
    if not fs.rename(jsrc, jvm.org.apache.hadoop.fs.Path(dst)):
        raise IOError(f"rename failed: {src} -> {dst}")


def _list_names(spark: SparkSession, path: str) -> list[str]:
    fs, jp, _ = _fs(spark, path)
    if not fs.exists(jp):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jp)]


def _active_spark(spark: SparkSession | None) -> SparkSession | None:
    return spark or SparkSession.getActiveSession()


# ---------------------------------------------------------------- manifest
def _manifest_name(bucket: int) -> str:
    return f"bucket-{bucket:05d}.parquet"


def completed_buckets(out_dir: str, spark: SparkSession | None = None) -> set[int]:
    spark = _active_spark(spark)
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if spark is not None:
        names = _list_names(spark, mdir)
    else:  # no session: local-filesystem fallback
        names = os.listdir(mdir) if os.path.isdir(mdir) else []
    return {
        int(n[len("bucket-") : -len(".parquet")])
        for n in names
        if n.startswith("bucket-") and n.endswith(".parquet")
    }


def _publish_manifest_row(spark: SparkSession, out_dir: str, row: dict) -> None:
    """Atomic publish through the out_dir's FileSystem: local temp parquet
    → copyFromLocalFile to a dot-tmp name → rename to final."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    _mkdirs(spark, mdir)
    final = os.path.join(mdir, _manifest_name(row["bucket"]))
    tmp_remote = os.path.join(mdir, "." + _manifest_name(row["bucket"]) + ".tmp")
    with tempfile.NamedTemporaryFile(suffix=".parquet", delete=False) as f:
        local = f.name
    try:
        pq.write_table(pa.Table.from_pylist([row]), local)
        fs, jtmp, jvm = _fs(spark, tmp_remote)
        fs.copyFromLocalFile(
            True, True, jvm.org.apache.hadoop.fs.Path("file:" + local), jtmp
        )
        _delete(spark, final)
        _rename(spark, tmp_remote, final)
    finally:
        if os.path.exists(local):
            os.unlink(local)


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not _exists(spark, mdir):
        return spark.createDataFrame([], _MANIFEST_SCHEMA)
    return spark.read.parquet(os.path.join(mdir, "*.parquet"))


# ---------------------------------------------------------------- the job
def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")


def run_extraction_checkpointed(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    n_buckets: int = 16,
    num_partitions: int | None = None,
    fail_after_buckets: int | None = None,
) -> list[int]:
    """Run (or resume) the extraction job.

    Returns the list of buckets committed in THIS invocation. Skips
    buckets already in the manifest (resume = anti-join pending work,
    SURVEY.md S10); refuses to resume a manifest written with a
    different ``n_buckets``. ``fail_after_buckets`` injects a crash in
    the commit loop for the resume test.
    """
    done = completed_buckets(out_dir, spark)
    if done:
        seen = {
            r["n_buckets"]
            for r in read_manifest(spark, out_dir)
            .select("n_buckets")
            .distinct()
            .collect()
        }
        if seen and seen != {n_buckets}:
            raise ValueError(
                f"manifest at {out_dir} was written with n_buckets={sorted(seen)}; "
                f"resuming with n_buckets={n_buckets} would mix two incompatible "
                "bucket partitionings (duplicate + missing rows). Use the "
                "original bucket count or a fresh output dir."
            )
    pending = [b for b in range(n_buckets) if b not in done]
    if not pending:
        return []

    staging = os.path.join(out_dir, STAGING_DIR)
    _delete(spark, staging)  # discard any half-staged previous attempt

    src = transcripts.withColumn("_bucket", _bucket_col(n_buckets))
    if len(pending) < n_buckets:
        src = src.filter(F.col("_bucket").isin(pending))
    t0 = time.monotonic()
    extracted = extract_turns(src.drop("_bucket"), num_partitions=num_partitions)
    # the bucket id is a pure function of conv_id — recomputable on the
    # extracted rows, so extraction itself stays a narrow 4-column stage.
    # One hash shuffle on the (smaller) extracted rows aligns tasks with
    # buckets before the partitioned write: without it, partitionBy emits
    # input_tasks x n_buckets files (4k even at bench scale, unbounded at
    # cluster scale).
    staged = extracted.withColumn("_bucket", _bucket_col(n_buckets)).repartition(
        n_buckets, F.col("_bucket")
    )
    staged.write.partitionBy("_bucket").mode("overwrite").parquet(staging)
    pass_wall_ms = max(int((time.monotonic() - t0) * 1000), 1)

    # lineage counts from what was actually committed to staging
    # (validates the write); one cheap pass over the extracted rows
    stats = {
        int(r["_bucket"]): (int(r["n"]), int(r["rej"] or 0))
        for r in spark.read.parquet(staging)
        .groupBy("_bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("reject_reason").isNotNull().cast("long")).alias("rej"),
        )
        .collect()
    }
    total_rows = sum(n for n, _ in stats.values()) or 1

    _mkdirs(spark, os.path.join(out_dir, DATA_DIR))
    ran: list[int] = []
    for b in pending:
        sdir = os.path.join(staging, f"_bucket={b}")
        ddir = os.path.join(out_dir, DATA_DIR, f"bucket={b}")
        if _exists(spark, sdir):
            _delete(spark, ddir)  # partial dir from a crashed commit
            _rename(spark, sdir, ddir)
        n, rej = stats.get(b, (0, 0))
        # wall is attributed to buckets proportionally to their rows (the
        # pass is shared); turns_per_sec is therefore the pass aggregate
        share_ms = max(int(pass_wall_ms * n / total_rows), 1)
        _publish_manifest_row(
            spark,
            out_dir,
            {
                "bucket": b,
                "n_buckets": n_buckets,
                "rows_in": n,  # 1:1 in/out incl. rejects
                "rows_out": n - rej,
                "rows_rejected": rej,
                "wall_ms": share_ms,
                "turns_per_sec": float(n) / (share_ms / 1000.0),
                "finished_at": datetime.now(timezone.utc).isoformat(),
            },
        )
        ran.append(b)
        if fail_after_buckets is not None and len(ran) >= fail_after_buckets:
            raise KilledForTest(f"injected failure after {len(ran)} buckets")
    _delete(spark, staging)
    return ran


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, DATA_DIR))


def prune_checkpoints(root_dir: str, keep_last: int = 5) -> list[str]:
    """Retention policy over job-run checkpoint directories (the
    max_to_keep=5 analog, /root/reference/Projects/IAM_lines/
    Structure_006/Structure_006.py:163): keeps the ``keep_last`` most
    recently finished run dirs under ``root_dir`` (by the newest manifest
    mtime inside each), removes the rest. Returns removed dirs.
    Local-filesystem utility."""
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
