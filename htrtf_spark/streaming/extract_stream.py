"""Structured Streaming extraction: the same Arrow-batched stage bound to
an unbounded transcripts feed, plus watermarked event-time rollups.

The reference is batch-only (SURVEY.md §2.12); this is the "if the
transcript feed were unbounded" path the survey sketches: tumbling
windows ≈ F.window(ts, ...), the extraction stage itself is stateless so
it runs unchanged under readStream (mapInPandas is supported on
streaming DataFrames).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from htrtf_spark.operators.extraction import extract_pandas
from htrtf_spark.schema import TRANSCRIPTS_SCHEMA

from htrtf_spark.operators.extraction import EXTRACTED_DDL

EXTRACTED_TS_DDL = EXTRACTED_DDL + ", ts timestamp"  # derived: batch/stream drift-proof


def _extract_keep_ts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Extraction stage that carries the event-time column through (needed
    by downstream watermarks; row order within the batch is preserved so
    positional reattachment is exact)."""
    for pdf in batches:
        out = extract_pandas(pdf)
        out["ts"] = pdf["ts"].values
        yield out


def read_transcript_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream with the pinned transcripts schema (one file =
    one micro-batch unit; swap for Kafka in production)."""
    return spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(input_dir)


def stream_extract(stream_df: DataFrame) -> DataFrame:
    """Unbounded extraction: identical semantics to the batch stage."""
    cols = stream_df.select("conv_id", "turn_idx", "role", "text", "ts")
    return cols.mapInPandas(_extract_keep_ts, schema=EXTRACTED_TS_DDL)


def stream_metrics(
    extracted: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked tumbling-window acceptance metrics (late data beyond
    the watermark is dropped by the engine, state is bounded)."""
    return (
        extracted.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "mode")
        .agg(
            F.count("*").alias("turns"),
            F.sum(F.col("reject_reason").isNotNull().cast("long")).alias("rejected"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "mode",
            "turns",
            "rejected",
        )
    )


def run_stream_to_memory(
    spark: SparkSession, input_dir: str, query_name: str = "extract_stream"
):
    """Drive a bounded smoke run synchronously (memory sink +
    processAllAvailable); returns the StreamingQuery (stopped)."""
    ex = stream_extract(read_transcript_stream(spark, input_dir))
    q = (
        ex.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
