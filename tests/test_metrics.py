"""CER/WER/exact-match evaluation operators (A5-A8, J4, T9 parity)."""

from __future__ import annotations

from htrtf_spark.operators import metrics as M


def test_word_lev():
    assert M._word_lev([], []) == 0
    assert M._word_lev(["a"], []) == 1
    assert M._word_lev("the cat sat".split(), "the cat sat".split()) == 0
    assert M._word_lev("the cat sat".split(), "the dog sat".split()) == 1
    assert M._word_lev("a b".split(), "b a".split()) == 2


def test_per_turn_distances_and_summary(spark):
    got = spark.createDataFrame(
        [
            ("c1", 0, "hello world"),
            ("c1", 1, "spark row"),
            ("c2", 0, "exact match"),
            ("c2", 1, None),
        ],
        "conv_id string, turn_idx int, extracted_text string",
    )
    gold = spark.createDataFrame(
        [
            ("c1", 0, "hello world"),
            ("c1", 1, "spark rows"),
            ("c2", 0, "exact match"),
            ("c2", 1, ""),
        ],
        "conv_id string, turn_idx int, golden_text string",
    )
    d = M.per_turn_distances(got, gold)
    rows = {(r["conv_id"], r["turn_idx"]): r for r in d.collect()}
    assert rows[("c1", 0)]["exact"] == 1 and rows[("c1", 0)]["char_dist"] == 0
    assert rows[("c1", 1)]["exact"] == 0 and rows[("c1", 1)]["char_dist"] == 1
    assert rows[("c1", 1)]["word_dist"] == 1
    assert rows[("c2", 1)]["exact"] == 1  # null coalesced to '' == ''

    s = M.evaluation_summary(d).collect()[0]
    assert s["n_turns"] == 4 and s["n_exact"] == 3
    assert s["exact_bp"] == 7500
    assert s["total_char_dist"] == 1
    assert s["total_word_dist"] == 1


def test_perfect_extraction_gives_zero_cer_wer(spark):
    """The north-rule equivalence: byte-exact ⇔ CER=WER=0."""
    from htrtf_spark import synth
    from htrtf_spark.plans.pipeline import extract_turns
    from htrtf_spark.schema import TRANSCRIPTS_SCHEMA
    from htrtf_spark import oracle

    pdf = synth.synth_pandas(n_convs=12, seed=17)
    df = spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)
    got = extract_turns(df)
    gold_pdf = oracle.extract_frame(pdf)[["conv_id", "turn_idx", "extracted_text"]]
    gold = spark.createDataFrame(
        gold_pdf.rename(columns={"extracted_text": "golden_text"})
    )
    s = M.evaluation_summary(M.per_turn_distances(got, gold)).collect()[0]
    assert s["n_turns"] == len(pdf)
    assert s["n_exact"] == len(pdf)
    assert s["cer_abs_bp"] == 0 and s["wer_bp"] == 0 and s["exact_bp"] == 10000
