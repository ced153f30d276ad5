"""Streaming extraction: unbounded stage produces byte-identical rows to
the batch stage on the same data; watermarked window metrics conserve
counts."""

from __future__ import annotations

import pandas as pd

from htrtf_spark import oracle, synth
from htrtf_spark.schema import TRANSCRIPTS_SCHEMA
from htrtf_spark.streaming import extract_stream as xs


def _write_input(spark, tmp_path, n_convs=15, seed=21):
    pdf = synth.synth_pandas(n_convs=n_convs, seed=seed)
    path = str(tmp_path / "stream_in")
    spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA).repartition(4).write.parquet(
        path
    )
    return pdf, path


def test_stream_extract_matches_oracle(spark, tmp_path):
    pdf, path = _write_input(spark, tmp_path)
    xs.run_stream_to_memory(spark, path, query_name="t_stream")
    got = (
        spark.sql("SELECT * FROM t_stream")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    gold = (
        oracle.extract_frame(pdf)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(gold)
    for col in ["mode", "extracted_text", "reject_reason"]:
        assert (
            got[col].fillna("<N>").values == gold[col].fillna("<N>").values
        ).all(), col


def test_stream_windowed_metrics(spark, tmp_path):
    pdf, path = _write_input(spark, tmp_path, n_convs=10, seed=33)
    ex = xs.stream_extract(xs.read_transcript_stream(spark, path))
    m = xs.stream_metrics(ex, window="10 minutes", watermark="1 hour")
    q = (
        m.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_metrics")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    res = spark.sql("SELECT * FROM t_metrics").toPandas()
    assert int(res["turns"].sum()) == len(pdf)  # every turn lands in a window
    gold = oracle.extract_frame(pdf)
    assert int(res["rejected"].sum()) == int(gold["reject_reason"].notna().sum())
    assert (res["win_end"] > res["win_start"]).all()
