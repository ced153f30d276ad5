"""Transcripts table sources.

Production shape is an Iceberg table (BASELINE.json ``input_hint``); the
sandbox image has no Iceberg jars, so the Iceberg reader is gated and the
parquet reader carries the same schema contract. Also provides the
deterministic mapping of the driver's ``events`` testdata into a
transcripts-shaped table, so the flagship pipeline can run on the
driver-provided parquet (TESTDATA.md) without synthesizing inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from htrtf_spark.schema import TRANSCRIPTS_SCHEMA


def read_transcripts_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Schema-pinned parquet read (no inference drift)."""
    return spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(path)


def read_transcripts_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Schema-pinned JSON-lines read (the common transcript interchange
    format). The explicit schema keeps ts parsing and column types
    identical to the parquet path — no inference drift."""
    return spark.read.schema(TRANSCRIPTS_SCHEMA).json(path)


def read_transcripts_orc(spark: SparkSession, path: str) -> DataFrame:
    """Schema-pinned ORC read (Spark's built-in columnar alternative;
    same pushdown/pruning properties as parquet)."""
    return spark.read.schema(TRANSCRIPTS_SCHEMA).orc(path)


def read_transcripts_csv(spark: SparkSession, path: str) -> DataFrame:
    """Schema-pinned CSV read. Quoting/escaping/whitespace handling
    pinned explicitly: transcript text contains newlines, quotes and
    whitespace-only turns, so ``multiLine``, RFC-4180 double-quote
    escaping and no-trim are all required — silent defaults corrupt turn
    boundaries or fold whitespace-only text to NULL, exactly the drift
    the byte-parity test catches. Writers must symmetrically set
    ignoreLeading/TrailingWhiteSpace=false (the WRITE default trims!)."""
    return (
        spark.read.schema(TRANSCRIPTS_SCHEMA)
        .option("header", True)
        .option("multiLine", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
        .csv(path)
    )


def read_transcripts_iceberg(
    spark: SparkSession,
    table: str,
    snapshot_id: int | None = None,
    partition_filter: dict | None = None,
    ref: str | None = None,
) -> DataFrame:
    """Iceberg transcripts read.

    ``table`` is either a catalog table name (``catalog.db.tbl`` — needs
    iceberg-spark-runtime on the classpath, the cluster path) or a
    filesystem path to a HadoopCatalog-layout Iceberg table, which is
    read through the pure-Python metadata layer
    (htrtf_spark.sources.iceberg): version-hint → metadata JSON →
    manifest list → manifests → snapshot-isolated schema-pinned parquet
    scan. ``snapshot_id`` time-travels; ``ref`` reads a named tag or
    branch (the write-audit-publish AUDIT read: run the extraction over
    the candidate branch before publishing). Both are path-variant
    only; use ``VERSION AS OF`` SQL with the native catalog."""
    from htrtf_spark.sources.iceberg import read_iceberg_table, table_exists

    if table_exists(table):
        return read_iceberg_table(
            spark, table, snapshot_id=snapshot_id,
            partition_filter=partition_filter, ref=ref,
        )
    try:
        return spark.read.table(table)
    except Exception as exc:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "Iceberg table read failed — pass a HadoopCatalog table path "
            "(metadata/version-hint.text) for the built-in reader, or "
            "ensure iceberg-spark-runtime is on the classpath and "
            "spark.sql.catalog.<name> is configured for catalog names. "
            f"Underlying error: {exc}"
        ) from exc


def events_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically reshape the driver's ``events`` table into the
    transcripts schema: one conversation per user, turns ordered by event
    time (ties broken by event_id — total order), text derived from the
    event payload. Pure DataFrame ops — fully Catalyst-optimized."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool"))
    role = F.element_at(roles, (F.pmod(F.col("event_id"), F.lit(4)) + 1).cast("int"))
    return ev.select(
        F.concat(F.lit("conv-"), F.lpad(F.col("user_id").cast("string"), 8, "0")).alias(
            "conv_id"
        ),
        (F.row_number().over(w) - F.lit(1)).cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat_ws(
            " ",
            F.col("event_type"),
            F.lit("value"),
            F.col("value").cast("string"),
            F.col("props"),
        ).alias("text"),
        F.when(role == "tool", F.concat(F.lit("tool_"), F.col("event_type")))
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
        F.col("ts"),
    )


# Avro transcript interchange (spec avro.apache.org/docs/current/spec):
# ts is a long of MICROSECONDS since epoch (timestamp-micros logical
# type) — the standard Avro timestamp encoding.
_TRANSCRIPTS_AVRO_SCHEMA = {
    "type": "record",
    "name": "turn",
    "fields": [
        {"name": "conv_id", "type": "string"},
        {"name": "turn_idx", "type": "int"},
        {"name": "role", "type": "string"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "tool", "type": ["null", "string"]},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
    ],
}


def write_transcripts_avro(df: DataFrame, out_dir: str, partitions: int = 8) -> None:
    """Distributed Avro write via the repo's own codec (sources/avro_io —
    the same implementation the Iceberg manifests use): each task
    serializes its partition to one object-container file. Timestamps
    encode as exact integer micros.

    Task-retry idempotence: the output name is deterministic per
    partition index (``part-{pid:05d}.avro``) and the file is staged to
    a temp name then atomically ``os.replace``d — a retried or
    speculatively-executed task overwrites its own partition instead of
    leaving a second randomly-named copy that the reader would
    double-count."""
    import datetime as _dt
    import os as _os
    import uuid as _uuid

    from htrtf_spark.sources.avro_io import avro_write

    _os.makedirs(out_dir, exist_ok=True)
    schema = _TRANSCRIPTS_AVRO_SCHEMA
    epoch = _dt.datetime(1970, 1, 1)

    def _write_part(pid, rows):
        recs = []
        for r in rows:
            ts = r["ts"]
            recs.append(
                {
                    "conv_id": r["conv_id"],
                    "turn_idx": r["turn_idx"],
                    "role": r["role"],
                    "text": r["text"],
                    "tool": r["tool"],
                    "ts": (ts - epoch) // _dt.timedelta(microseconds=1),
                }
            )
        if recs:
            final = _os.path.join(out_dir, f"part-{pid:05d}.avro")
            tmp = _os.path.join(
                out_dir, f".part-{pid:05d}.avro.tmp-{_uuid.uuid4().hex}"
            )
            avro_write(tmp, schema, recs)
            _os.replace(tmp, final)  # atomic: concurrent retry can't tear
        return iter(())

    df.select("conv_id", "turn_idx", "role", "text", "tool", "ts").repartition(
        partitions
    ).rdd.mapPartitionsWithIndex(_write_part).count()


def read_transcripts_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro read: the file LIST parallelizes across
    executors and each task decodes its files with the pure-python
    codec (shipped via --py-files like every operator), yielding
    schema-pinned rows — no driver-side data, no external Avro
    dependency. Byte-parity with the parquet path is pytest-enforced
    like the ORC/CSV/JSONL sources."""
    import datetime as _dt
    import glob as _glob
    import os as _os

    files = sorted(_glob.glob(_os.path.join(path, "*.avro")))
    if not files:
        return spark.createDataFrame([], TRANSCRIPTS_SCHEMA)
    epoch = _dt.datetime(1970, 1, 1)

    def _read_file(paths):
        from htrtf_spark.sources.avro_io import avro_read

        for p in paths:
            _, _, recs = avro_read(p)
            for r in recs:
                yield (
                    r["conv_id"],
                    r["turn_idx"],
                    r["role"],
                    r["text"],
                    r["tool"],
                    epoch + _dt.timedelta(microseconds=r["ts"]),
                )

    rdd = spark.sparkContext.parallelize(files, len(files)).mapPartitions(
        _read_file
    )
    return spark.createDataFrame(rdd, TRANSCRIPTS_SCHEMA)
