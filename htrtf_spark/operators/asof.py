"""As-of join — Spark has no native one (pyspark guide: compose or
applyInPandas). This is the composition form: tag both sides, union with
an aligned schema, one window pass carrying the right side's latest
values forward, filter back to left rows. One shuffle, no cross product,
skew handled by AQE like any hash shuffle.

Semantics: for each left row, attach the most recent right row with
right.ts strictly earlier than left.ts, per key (null if none).
Deterministic: within equal (ts), rows order by (_side, tiebreak), and
equal-ts right rows are excluded by an explicit strictness mask.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str],
    left_tiebreak: str,
    right_tiebreak: str,
) -> DataFrame:
    """Returns all left columns + ``<col>_asof`` per right value column."""
    lcols = left.columns
    asof_types = {c: right.schema[c].dataType for c in right_value_cols}

    r2 = right.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.col(right_tiebreak).cast("long").alias("_tb"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}_asof") for c in right_value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    l2 = left.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.col(left_tiebreak).cast("long").alias("_tb"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(asof_types[c]).alias(f"{c}_asof") for c in right_value_cols],
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    unioned = r2.unionByName(l2)

    # Equal-ts right rows sort AFTER left rows (side DESC: left=1 first),
    # so a left row's preceding frame contains exactly the right rows with
    # strictly smaller ts — strictness by construction, no mask needed.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").desc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # carry ONE struct of all right value columns: the struct is non-null
    # exactly for right rows (even when its fields are null), so last()
    # attaches the most recent right ROW as a unit. Per-column lasts would
    # skip nulls independently and could stitch together a row that never
    # existed (and return a stale value where the latest right value is
    # genuinely NULL).
    rv = F.when(
        F.col("_side") == 0,
        F.struct(*[F.col(f"{c}_asof").alias(c) for c in right_value_cols]),
    )
    carried = unioned.withColumn("_rv", rv).withColumn(
        "_rv_asof", F.last("_rv", ignorenulls=True).over(w)
    )

    out = carried.filter(F.col("_side") == 1)
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col("_rv_asof").getField(c).alias(f"{c}_asof") for c in right_value_cols],
    )
