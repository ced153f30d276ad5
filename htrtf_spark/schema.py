"""Explicit schemas (the reference's schema is fixed and implicit —
parallel lists + well-known HDF5 dataset names, SURVEY.md §1.3; here it is
fixed and explicit, with a hard precondition check like
check_valid_and_test_sets, /root/reference/Modules/utils.py:208-262)."""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("mode", T.StringType(), False),
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField("n_chars", T.IntegerType(), True),
        T.StructField("reject_reason", T.StringType(), True),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("rows_rejected", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("finished_at", T.TimestampType(), False),
    ]
)


def check_input_schema(df) -> None:
    """Hard precondition, like the reference's check_valid_and_test_sets
    (utils.py:208-262): abort before any compute on schema drift."""
    def _norm(dt: str) -> str:
        # parquet-sourced timestamps may surface as timestamp_ntz; the
        # session runs in UTC so both carry identical wall-clock values.
        return "timestamp" if dt == "timestamp_ntz" else dt

    have = {f.name: _norm(f.dataType.simpleString()) for f in df.schema.fields}
    for f in TRANSCRIPTS_SCHEMA.fields:
        if f.name not in have:
            raise ValueError(f"transcripts input missing column {f.name!r}")
        if have[f.name] != _norm(f.dataType.simpleString()):
            raise ValueError(
                f"transcripts column {f.name!r} has type "
                f"{have[f.name]}, expected {f.dataType.simpleString()}"
            )
