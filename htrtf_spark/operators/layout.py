"""Layout-aware line segmentation over positioned text blocks.

The PDF/page-layout stage of main-content extraction (north-star
"layout-aware line segmentation"; the reference's page→line analog is
the IAM line-record layout parsed in
/root/reference/Projects/IAM_lines/create_IAM_lines_dataset.py:24-43,
where each text line carries its (x, y, w, h) box): given OCR/PDF text
BLOCKS ``(doc, block_id, x, y, w, h, text)``, recover reading order —
column detection, line grouping, left-to-right order within a line —
and assemble line/document text.

Deterministic, engine-portable rule (every step restated in the q92
DuckDB oracle):

- column: a block belongs to the right column iff its x-center ≥
  ``page_width/2`` (two-column layout; single-column pages simply have
  one populated column),
- line: blocks in a column group by ``floor(y_center / line_height)``
  — the fixed-grid form of y-overlap clustering; ``line_idx`` is the
  DENSE RANK of that bin (gaps collapse),
- order: within a line, left-to-right by (x, block_id); reading order
  is column-major (whole left column, then right), top-to-bottom.

Everything is groupBy/Window/concat — pure Catalyst, no UDF: the
shuffles are keyed by doc (and doc is the natural partition key at
10^12 scale, exactly like conv_id for transcripts), so segmentation of
N docs is embarrassingly parallel and whale documents only ever
co-locate their OWN blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PAGE_WIDTH = 1000
LINE_HEIGHT = 20


def reading_order(
    df: DataFrame,
    doc_col: str = "doc_id",
    page_width: int = PAGE_WIDTH,
    line_height: int = LINE_HEIGHT,
) -> DataFrame:
    """Annotate blocks with (col_idx, line_idx, order_idx): column by
    x-center, line by dense-ranked y-center bin within the column,
    global per-doc reading position column-major then (line, x,
    block_id)."""
    xc = F.col("x") + F.col("w") / 2
    yc = F.col("y") + F.col("h") / 2
    d = df.withColumn(
        "col_idx", (xc >= F.lit(page_width / 2)).cast("int")
    ).withColumn("_ybin", F.floor(yc / F.lit(line_height)).cast("long"))
    line_w = (
        Window.partitionBy(doc_col, "col_idx").orderBy("_ybin")
    )
    d = d.withColumn("line_idx", (F.dense_rank().over(line_w) - 1))
    order_w = Window.partitionBy(doc_col).orderBy(
        "col_idx", "line_idx", "x", "block_id"
    )
    return d.withColumn("order_idx", F.row_number().over(order_w) - 1).drop(
        "_ybin"
    )


def assemble_lines(
    df: DataFrame,
    doc_col: str = "doc_id",
    page_width: int = PAGE_WIDTH,
    line_height: int = LINE_HEIGHT,
) -> DataFrame:
    """(doc, col_idx, line_idx, line_text, n_blocks): blocks of a line
    joined left-to-right with single spaces."""
    ordered = reading_order(df, doc_col, page_width, line_height)
    return (
        ordered.groupBy(doc_col, "col_idx", "line_idx")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("x", "block_id", F.col("text").alias("t"))
                        )
                    ),
                    lambda s: s["t"],
                ),
            ).alias("line_text"),
            F.count("*").alias("n_blocks"),
        )
    )


def assemble_documents(
    df: DataFrame,
    doc_col: str = "doc_id",
    page_width: int = PAGE_WIDTH,
    line_height: int = LINE_HEIGHT,
) -> DataFrame:
    """(doc, doc_text, n_lines, n_cols): full reading-order document
    text — lines joined with newlines, column-major."""
    lines = assemble_lines(df, doc_col, page_width, line_height)
    return (
        lines.groupBy(doc_col)
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "col_idx", "line_idx",
                                F.col("line_text").alias("t"),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
            ).alias("doc_text"),
            F.count("*").alias("n_lines"),
            F.countDistinct("col_idx").alias("n_cols"),
        )
    )
