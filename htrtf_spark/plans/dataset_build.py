"""Dataset creation pipeline — the Spark restatement of the reference's
entry point 1 (create_IAM_lines_dataset.py main, SURVEY.md §3.1):

  txt scan ─► comment filter ─► field split ─► status filter ─►
  charset agg ─► clean+encode ─► size filters/rescale ─►
  per-set semi-join ─► parquet + CSV sinks

Reference citations (all /root/reference/Projects/IAM_lines/
create_IAM_lines_dataset.py):
- S1 ground-truth scan + '#' comment skip  :26-66, :43-44
- P2 status in ('ok','err')                :45
- A1 distinct-char charset build (ok only) :68-103
- P3/J2 charset-membership clean + encode  :48-52
- P4 empty-after-clean drop                :53-61
- P5/P8/P6 height cap, rescale, width cap  :144-213 (maxHeight=128,
  w' = ceil(w*128/h), maxWidth=4096, :335-336)
- J1 set-membership semi-join on prefix key:215-235
- S8/S9 H5+CSV sinks                       :249-316

Everything is DataFrame ops; the only Python stage is the per-char
clean+encode (vectorized pandas, mirroring the reference's per-char
loop as one Arrow pass).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_HEIGHT = 128
MAX_WIDTH = 4096

RECORDS_DDL = (
    "rec_id string, status string, w int, h int, transcription string"
)
ENCODED_DDL = (
    "rec_id string, status string, w int, h int, transcription string, "
    "clean_text string, sequence array<int>, trans_length int"
)


def scan_ground_truth(spark: SparkSession, path: str) -> DataFrame:
    """S1: line scan, drop '#' comments, whitespace field split.
    IAM field layout: id status graylevel n x y w h transcription."""
    lines = spark.read.text(path)
    nocomment = lines.filter(~F.col("value").startswith("#"))
    # trim first: str.split() in the reference ignores leading whitespace,
    # while F.split on a leading-space line yields an empty first field
    # and silently shifts every column
    f = F.split(F.trim(F.col("value")), r"\s+")
    return nocomment.select(
        F.element_at(f, 1).alias("rec_id"),
        F.element_at(f, 2).alias("status"),
        F.element_at(f, 7).cast("int").alias("w"),
        F.element_at(f, 8).cast("int").alias("h"),
        F.element_at(f, 9).alias("transcription"),
    ).filter(F.col("rec_id").isNotNull() & (F.col("rec_id") != ""))


# Washington/Parzival special tokens in '-'-joined transcriptions
# (create_Washington_lines_dataset.py:26-67 field conventions: '-' joins
# per-char tokens, '|' is the word separator, multi-char 's_*' tokens
# denote punctuation).
WASH_SPECIALS = {"s_pt": ".", "s_cm": ",", "s_sq": ";", "s_mi": "-", "s_qo": ":"}


def scan_ground_truth_washington(spark: SparkSession, path: str) -> DataFrame:
    """S2: Washington/Parzival-layout scan — 2 whitespace fields:
    rec_id and a '-'-joined token transcription. Decodes tokens to the
    plain transcription JVM-side (transform over the split array)."""
    lines = spark.read.text(path)
    nocomment = lines.filter(~F.col("value").startswith("#"))
    f = F.split(F.trim(F.col("value")), r"\s+")
    toks = F.split(F.element_at(f, 2), "-")
    mapped = F.transform(
        toks,
        lambda t: F.when(t == "|", " ").otherwise(
            F.coalesce(
                *[F.when(t == k, F.lit(v)) for k, v in WASH_SPECIALS.items()],
                t,
            )
        ),
    )
    return nocomment.select(
        F.element_at(f, 1).alias("rec_id"),
        F.lit("ok").alias("status"),
        F.lit(-1).cast("int").alias("w"),   # sizes come from a per-record
        F.lit(-1).cast("int").alias("h"),   # image probe in the reference
        F.array_join(mapped, "").alias("transcription"),
    ).filter(F.col("rec_id").isNotNull() & (F.col("rec_id") != ""))


def build_charset(records: DataFrame) -> list[str]:
    """A1: global distinct-char set over ok rows' transcriptions, sorted
    for determinism; '|' separator char force-included
    (create_IAM_lines_dataset.py:93-98)."""
    rows = (
        records.filter(F.col("status") == "ok")
        .select(F.explode(F.split("transcription", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .distinct()
        .collect()
    )
    chars = {r["ch"] for r in rows} | {"|"}
    return sorted(chars)


def clean_and_encode(records: DataFrame, charset: list[str]) -> DataFrame:
    """P3 + J2: per-char charset-membership projection producing
    (clean_text, label-id sequence); broadcast dict into one Arrow pass."""
    spark = records.sparkSession
    bc = spark.sparkContext.broadcast({c: i for i, c in enumerate(charset)})

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c2i = bc.value
        for pdf in batches:
            cleans, seqs, lens = [], [], []
            for tr in pdf["transcription"]:
                tr = tr if isinstance(tr, str) else ""
                kept = [c for c in tr if c in c2i]
                clean = "".join(kept)
                cleans.append(clean)
                seqs.append([c2i[c] for c in kept])
                lens.append(len(clean))
            out = pdf.copy()
            out["clean_text"] = cleans
            out["sequence"] = seqs
            out["trans_length"] = pd.array(lens, dtype="int32")
            yield out

    return records.mapInPandas(stage, schema=ENCODED_DDL)


def apply_size_filters(encoded: DataFrame) -> DataFrame:
    """P2 + P4 + P5 + P8 + P6, in the reference's order."""
    return (
        encoded.filter(F.col("status").isin("ok", "err"))
        .filter(F.length("clean_text") > 0)
        # malformed sizes (unparseable -> NULL, or h=0 whose rescale
        # divides by zero) are EXPLICIT rejects, not silent NULL-filter
        # drops — keeps the audit invariant exact
        .filter(F.col("h").isNotNull() & F.col("w").isNotNull() & (F.col("h") != 0))
        .filter(F.col("h") <= MAX_HEIGHT)
        .withColumn("w_scaled", F.ceil(F.col("w") * MAX_HEIGHT / F.col("h")).cast("int"))
        .withColumn("h_scaled", F.lit(MAX_HEIGHT))
        .filter(F.col("w_scaled") <= MAX_WIDTH)
    )


def reject_audit(encoded: DataFrame) -> DataFrame:
    """A9: per-reason reject counters (the n_ok/n_err audit invariant:
    rows_in == rows_out + Σ rejected)."""
    reason = (
        F.when(~F.col("status").isin("ok", "err"), "bad_status")
        .when(F.length("clean_text") == 0, "empty_after_clean")
        .when(
            F.col("h").isNull() | F.col("w").isNull() | (F.col("h") == 0),
            "bad_size",
        )
        .when(F.col("h") > MAX_HEIGHT, "too_tall")
        .when(F.ceil(F.col("w") * MAX_HEIGHT / F.col("h")) > MAX_WIDTH, "too_wide")
        .otherwise("kept")
    )
    return encoded.groupBy(reason.alias("reason")).count()


def split_by_sets(
    filtered: DataFrame, sets: DataFrame, prefix_parts: int = 2
) -> dict[str, DataFrame]:
    """J1: per-split broadcast semi-join on the derived prefix key
    ('-'.join(rec_id.split('-')[:2]), create_IAM_lines_dataset.py:225).
    ``sets`` has columns (set_name, member_key)."""
    key = F.concat_ws(
        "-", *[F.split_part(F.col("rec_id"), F.lit("-"), F.lit(i + 1)) for i in range(prefix_parts)]
    )
    keyed = filtered.withColumn("_key", key)
    out = {}
    for row in sets.select("set_name").distinct().collect():
        name = row["set_name"]
        members = sets.filter(F.col("set_name") == name).select(
            F.col("member_key").alias("_key")
        )
        out[name] = keyed.join(F.broadcast(members), "_key", "left_semi").drop("_key")
    return out


def write_split(df: DataFrame, out_dir: str, name: str) -> None:
    """S8 + S9: parquet (the H5 analog — ragged sequences are native
    ArrayType, no flatten+offsets needed) and the CSV sidecar with the
    reference's column set (create_dataset_h5_and_csv_file, :291-316)."""
    df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
    (
        df.select(
            F.col("rec_id").alias("imgName"),
            F.col("clean_text").alias("transcription"),
            F.array_join(F.col("sequence").cast("array<string>"), " ").alias("sequence"),
            F.concat_ws("x", "w_scaled", "h_scaled").alias("size"),
            F.col("trans_length"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .csv(f"{out_dir}/{name}.csv")
    )


def split_charset_pairs(df: DataFrame, name: str) -> DataFrame:
    """Distinct (char → label-id) pairs a split's rows actually encode,
    tagged with the split name. Distributed: one partial-aggregated
    distinct of ≤|charset| pairs per split — no full-data collect."""
    return (
        df.select(
            F.explode(
                F.arrays_zip(
                    F.split(F.col("clean_text"), "").alias("ch"),
                    F.col("sequence").alias("id"),
                )
            ).alias("p")
        )
        .select(F.col("p.ch").alias("ch"), F.col("p.id").alias("id"))
        .filter(F.col("ch") != "")
        .distinct()
        .withColumn("split", F.lit(name))
    )


def check_split_compatibility(splits: dict[str, DataFrame]) -> int | None:
    """U3 full parity: the reference's check_valid_and_test_sets
    (/root/reference/Modules/utils.py:208-262) aborts before training if
    the valid/test sets' image height or label dictionary differ from the
    train set's. Same hard precondition here, data-derived: every split
    must use the SAME height, and the union of (char → label-id) pairs
    across splits must stay a bijection — a split encoded under a
    shifted/reordered charset maps some char to a second id (or some id
    to a second char) and aborts. (A coverage-only difference — a split
    simply not containing a rare char — is legal, as it is in the
    reference, whose dictionaries come from the shared build.) Returns
    the agreed height; raises ValueError on drift."""
    names = list(splits)
    if not names:
        raise ValueError("no splits to check")

    heights: dict[str, object] = {}
    for name in names:
        df = splits[name]
        if "h_scaled" not in df.columns:
            heights[name] = None
            continue
        hs = [r["h_scaled"] for r in df.select("h_scaled").distinct().collect()]
        if len(hs) > 1:
            raise ValueError(
                f"image height in {name!r} set is mixed: {sorted(hs)}"
            )
        heights[name] = hs[0] if hs else None
    ref_name = "train" if "train" in splits else names[0]
    for name in names:
        if heights[name] != heights[ref_name]:
            raise ValueError(
                f"image height in {name!r} set ({heights[name]}px) differs "
                f"from {ref_name!r} set ({heights[ref_name]}px)"
            )

    allp = None
    for name in names:
        p = split_charset_pairs(splits[name], name)
        allp = p if allp is None else allp.unionByName(p)
    char_conf = (
        allp.groupBy("ch")
        .agg(
            F.countDistinct("id").alias("n"),
            F.collect_set("split").alias("splits"),
        )
        .filter(F.col("n") > 1)
        .select(F.col("ch").alias("key"), "splits")
    )
    id_conf = (
        allp.groupBy("id")
        .agg(
            F.countDistinct("ch").alias("n"),
            F.collect_set("split").alias("splits"),
        )
        .filter(F.col("n") > 1)
        .select(F.concat(F.lit("id "), F.col("id")).alias("key"), "splits")
    )
    conflicts = char_conf.unionByName(id_conf).limit(5).collect()
    if conflicts:
        detail = "; ".join(
            f"{r['key']!r} in {sorted(r['splits'])}" for r in conflicts
        )
        raise ValueError(
            f"labels differ across splits (charset drift): {detail}"
        )
    return heights[ref_name]


def build_dataset(
    spark: SparkSession, gt_path: str, sets: DataFrame, out_dir: str
) -> dict[str, int]:
    """End-to-end entry point 1. Returns per-split row counts."""
    records = scan_ground_truth(spark, gt_path)
    charset = build_charset(records)
    encoded = clean_and_encode(records, charset)
    filtered = apply_size_filters(encoded)
    splits = split_by_sets(filtered, sets)
    counts, written = {}, {}
    for name, df in splits.items():
        write_split(df, out_dir, name)
        written[name] = spark.read.parquet(f"{out_dir}/{name}.parquet")
        counts[name] = written[name].count()
    # the reference re-checks compatibility when the sets are LOADED
    # (utils.py:208-262); same here, on the read-back frames
    check_split_compatibility(written)
    # charset sidecar (charlist.txt analog)
    spark.createDataFrame([(c,) for c in charset], "ch string").coalesce(
        1
    ).write.mode("overwrite").text(f"{out_dir}/charset.txt")
    return counts
