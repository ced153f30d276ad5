"""SQL-registered extraction functions are byte-identical to the
pipeline stage (single implementation source) and NULL-safe."""

from __future__ import annotations

from htrtf_spark import oracle, synth
from htrtf_spark.functions import register_sql_functions
from htrtf_spark.schema import TRANSCRIPTS_SCHEMA


def test_sql_extract_matches_oracle(spark, tmp_path):
    register_sql_functions(spark)
    register_sql_functions(spark)  # idempotent
    pdf = synth.synth_pandas(n_convs=25, seed=17)
    spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA).createOrReplaceTempView(
        "t_sqlfn"
    )
    got = (
        spark.sql(
            "SELECT conv_id, turn_idx, htrtf_extract_text(text) AS x FROM t_sqlfn"
        )
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    gold = (
        oracle.extract_frame(pdf)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert (
        got["x"].fillna("<N>").values == gold["extracted_text"].fillna("<N>").values
    ).all()


def test_sql_clean_and_ctc(spark):
    register_sql_functions(spark)
    rows = spark.sql(
        "SELECT htrtf_clean_text('  héllo\\tworld™  ') AS c, "
        "htrtf_ctc_collapse('hh_ee__ll_llo|||ww') AS k, "
        "htrtf_ctc_collapse(NULL) AS n"
    ).collect()[0]
    assert rows["c"] == "hllo world"
    assert rows["k"] == "hello w"
    assert rows["n"] is None
