"""Production entrypoint 2: dataset creation (the Spark form of the
reference's create_*_lines_dataset.py main, entry point 1 in SURVEY §3.1:
scan → charset agg → clean+encode → size filters → per-set semi-joins →
parquet + CSV sinks + charset sidecar).

    spark-submit --master <cluster> --py-files htrtf_spark.zip \
        jobs/build_dataset.py --ground-truth <lines.txt> \
        --set train=<trainset.txt> --set valid=<validset.txt> \
        --output <dir> [--layout iam|washington] [--prefix-parts 2]

Each --set file lists record-id prefixes one per line (the reference's
Sets/*.txt, e.g. /root/reference/Projects/IAM_lines/Sets/trainset.txt).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ground-truth", required=True, help="lines.txt-style file")
    p.add_argument(
        "--set", dest="sets", action="append", required=True, metavar="NAME=PATH",
        help="split name and member-list txt (repeatable)",
    )
    p.add_argument("--output", required=True)
    p.add_argument("--layout", choices=["iam", "washington"], default="iam")
    p.add_argument("--prefix-parts", type=int, default=2,
                   help="record-id prefix length for set membership "
                        "(IAM: 2, create_IAM_lines_dataset.py:225)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from htrtf_spark.plans import dataset_build as db

    sets = None
    for spec in args.sets:
        name, _, path = spec.partition("=")
        if not path:
            p.error(f"--set must be NAME=PATH, got {spec!r}")
        part = spark.read.text(path).select(
            F.lit(name).alias("set_name"),
            F.trim(F.col("value")).alias("member_key"),
        ).filter(F.col("member_key") != "")
        sets = part if sets is None else sets.union(part)

    if args.layout == "washington":
        records = db.scan_ground_truth_washington(spark, args.ground_truth)
    else:
        records = db.scan_ground_truth(spark, args.ground_truth)
    charset = db.build_charset(records)
    encoded = db.clean_and_encode(records, charset)
    filtered = db.apply_size_filters(encoded)
    audit = {r["reason"]: r["count"] for r in db.reject_audit(encoded).collect()}
    splits = db.split_by_sets(filtered, sets, prefix_parts=args.prefix_parts)
    counts = {}
    for name, df in splits.items():
        db.write_split(df, args.output, name)
        counts[name] = spark.read.parquet(f"{args.output}/{name}.parquet").count()
    spark.createDataFrame([(c,) for c in charset], "ch string").coalesce(1).write.mode(
        "overwrite"
    ).text(f"{args.output}/charset.txt")

    print(json.dumps({
        "output": args.output,
        "charset_size": len(charset),
        "splits": counts,
        "reject_audit": audit,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
