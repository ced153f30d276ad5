"""The flagship extraction plan: transcripts in → extracted turns out.

Spark lifecycle (SURVEY.md §3.3): scan → salted repartition (one shuffle,
the only one) → Arrow-batched mapInPandas extraction (narrow, pipelined)
→ optional stable sort for presentation. Catalyst handles column pruning:
we select only the 4 columns the stage needs, so the parquet scan reads
exactly those (check with .explain: ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from htrtf_spark.operators.extraction import EXTRACTED_DDL, extract_map_in_pandas
from htrtf_spark.schema import check_input_schema


def extract_turns(
    df: DataFrame,
    num_partitions: int | None = None,
    salt_factor: int = 8,
    check_schema: bool = True,
) -> DataFrame:
    """Run main-content extraction over a transcripts DataFrame.

    Returns EXTRACTED_SCHEMA rows, one per input turn (rows_in == rows_out
    + rejected-with-reason; nothing is silently dropped — the audit-counter
    invariant, /root/reference/Projects/IAM_lines/create_IAM_lines_dataset.py:57-65).
    """
    if check_schema:
        check_input_schema(df)
    cols = df.select("conv_id", "turn_idx", "role", "text")
    if num_partitions:
        from htrtf_spark.plans.ordering import salted_repartition

        cols = salted_repartition(cols, num_partitions, salt_factor)
    return cols.mapInPandas(extract_map_in_pandas, schema=EXTRACTED_DDL)


def extraction_metrics(extracted: DataFrame) -> DataFrame:
    """Aggregate acceptance metrics (the CER/WER-report analog,
    /root/reference/Modules/tasks.py:183-194 — here exact-match is
    asserted upstream, so metrics are audit counts + sizes)."""
    return extracted.groupBy("mode").agg(
        F.count("*").alias("turns"),
        F.sum((F.col("reject_reason").isNotNull()).cast("long")).alias("rejected"),
        F.sum(F.coalesce(F.col("n_chars"), F.lit(0)).cast("long")).alias("total_chars"),
    )
