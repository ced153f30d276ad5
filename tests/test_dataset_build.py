"""Entry-point-1 parity: ground-truth scan → charset → clean/encode →
filters → split semi-joins → parquet+CSV sinks, with the audit-counter
conservation invariant."""

from __future__ import annotations

import pytest

from htrtf_spark.plans import dataset_build as DB

GT = """\
# IAM-style ground truth fixture
# id status gray n x y w h transcription
a01-000u-00 ok 154 19 408 746 1000 80 A|MOVE|to|stop
a01-000u-01 ok 156 19 395 932 2000 100 and|he|said
a01-000u-02 err 157 20 401 110 900 60 damaged|line
a01-000u-03 ok 158 20 410 200 9999 50 too|wide|after|rescale
a01-000u-04 ok 150 18 400 300 800 200 too|tall
a01-000x-00 ok 151 18 402 310 700 70 other|form
b02-011-00 ok 152 18 403 320 600 64 second|writer
b02-011-01 bad 153 18 404 330 500 64 broken|status
a01-000u-05 ok 150 18 400 300 800 64 ééé
"""
# note the last row: transcription entirely outside the charset of ok
# rows? no — charset is built FROM ok rows, so 'é' IS in the charset.


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dsbuild")
    gt_path = str(d / "lines.txt")
    with open(gt_path, "w") as f:
        f.write(GT)
    sets = spark.createDataFrame(
        [
            ("train", "a01-000u"),
            ("train", "b02-011"),
            ("test", "a01-000x"),
        ],
        "set_name string, member_key string",
    )
    out_dir = str(d / "out")
    counts = DB.build_dataset(spark, gt_path, sets, out_dir)
    return spark, out_dir, counts


def test_comment_and_field_scan(spark, tmp_path):
    gt_path = str(tmp_path / "g.txt")
    with open(gt_path, "w") as f:
        f.write(GT)
    rec = DB.scan_ground_truth(spark, gt_path)
    rows = {r["rec_id"]: r for r in rec.collect()}
    assert len(rows) == 9  # comments dropped
    assert rows["a01-000u-00"]["w"] == 1000 and rows["a01-000u-00"]["h"] == 80
    assert rows["a01-000u-00"]["transcription"] == "A|MOVE|to|stop"


def test_charset_from_ok_rows_only(spark, tmp_path):
    gt_path = str(tmp_path / "g.txt")
    with open(gt_path, "w") as f:
        f.write(GT)
    rec = DB.scan_ground_truth(spark, gt_path)
    charset = DB.build_charset(rec)
    assert "|" in charset
    assert "é" in charset  # from the ok row
    assert "g" not in charset  # only in 'damaged' (err row) — excluded
    assert charset == sorted(charset)


def test_filters_and_audit_conservation(spark, tmp_path):
    gt_path = str(tmp_path / "g.txt")
    with open(gt_path, "w") as f:
        f.write(GT)
    rec = DB.scan_ground_truth(spark, gt_path)
    charset = DB.build_charset(rec)
    enc = DB.clean_and_encode(rec, charset)
    audit = {r["reason"]: r["count"] for r in DB.reject_audit(enc).collect()}
    assert audit["bad_status"] == 1     # 'bad' status row
    assert audit["too_tall"] == 1       # h=200
    assert audit["too_wide"] == 1       # 9999 wide at h=50 → scaled > 4096
    assert sum(audit.values()) == 9     # conservation: in == kept + rejected
    kept = DB.apply_size_filters(enc)
    assert kept.count() == audit["kept"]


def test_encode_roundtrip(spark, tmp_path):
    gt_path = str(tmp_path / "g.txt")
    with open(gt_path, "w") as f:
        f.write(GT)
    rec = DB.scan_ground_truth(spark, gt_path)
    charset = DB.build_charset(rec)
    enc = DB.clean_and_encode(rec, charset).filter("rec_id = 'a01-000u-00'").collect()[0]
    decoded = "".join(charset[i] for i in enc["sequence"])
    assert decoded == enc["clean_text"] == "A|MOVE|to|stop"
    assert enc["trans_length"] == len(enc["clean_text"])


def test_washington_scan(spark, tmp_path):
    p = str(tmp_path / "w.txt")
    with open(p, "w") as f:
        f.write(
            "# washington fixture\n"
            "270-01-01 h-e-l-l-o-|-w-o-r-l-d-s_pt\n"
            "270-01-02 a-|-b-s_cm-|-c\n"
        )
    rec = {r["rec_id"]: r for r in DB.scan_ground_truth_washington(spark, p).collect()}
    assert rec["270-01-01"]["transcription"] == "hello world."
    assert rec["270-01-02"]["transcription"] == "a b, c"
    assert rec["270-01-01"]["status"] == "ok"


def test_splits_and_sinks(built):
    spark, out_dir, counts = built
    # train: a01-000u-{00,01,02(err, kept),05} + b02-011-00 minus filtered
    assert counts["train"] == 5
    assert counts["test"] == 1
    train = spark.read.parquet(f"{out_dir}/train.parquet")
    assert {r["rec_id"] for r in train.select("rec_id").collect()} == {
        "a01-000u-00", "a01-000u-01", "a01-000u-02", "a01-000u-05", "b02-011-00",
    }
    csv = spark.read.option("header", True).csv(f"{out_dir}/train.csv")
    assert csv.count() == 5
    assert set(csv.columns) == {"imgName", "transcription", "sequence", "size", "trans_length"}
    charset_rows = spark.read.text(f"{out_dir}/charset.txt").count()
    assert charset_rows > 10


def test_split_compatibility_gate(built):
    """U3 full parity (check_valid_and_test_sets, utils.py:208-262):
    splits built together agree on height + charset digest; a split
    re-encoded under a DIFFERENT charset (label-id shift) aborts."""
    import pyspark.sql.functions as F

    spark, out_dir, counts = built
    splits = {
        name: spark.read.parquet(f"{out_dir}/{name}.parquet")
        for name in counts
    }
    assert DB.check_split_compatibility(splits) == DB.MAX_HEIGHT

    # drift: shift every label id by 1 in one split (same chars, new
    # dictionary order — exactly the bug the reference gate catches)
    bad = dict(splits)
    victim = sorted(bad)[0]
    bad[victim] = bad[victim].withColumn(
        "sequence", F.transform("sequence", lambda x: x + 1)
    )
    with pytest.raises(ValueError, match="labels"):
        DB.check_split_compatibility(bad)

    # drift: height mismatch aborts before any label comparison
    bad2 = dict(splits)
    bad2[victim] = splits[victim].withColumn(
        "h_scaled", F.lit(DB.MAX_HEIGHT + 1)
    )
    with pytest.raises(ValueError, match="height"):
        DB.check_split_compatibility(bad2)
