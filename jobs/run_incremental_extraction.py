"""spark-submit job: one exactly-once incremental extraction tick from
an Iceberg transcripts table into an Iceberg extracted-turns table
(schedule it per ingest cadence; each run processes only what upstream
appended since the last run — see htrtf_spark/plans/incremental.py).

    spark-submit --py-files htrtf_spark.zip \
        jobs/run_incremental_extraction.py \
        --source /warehouse/transcripts --dest /warehouse/extracted
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True, help="Iceberg transcripts table path")
    p.add_argument("--dest", required=True, help="Iceberg output table path")
    p.add_argument("--auto-rebaseline", action="store_true",
                   help="recover from an expired/rolled-back source "
                        "marker by atomically rebuilding the destination "
                        "from the source's current snapshot")
    p.add_argument("--rebaseline-on-delete", action="store_true",
                   help="also rebuild when the window contains retracting "
                        "snapshots (delete/upsert/INSERT OVERWRITE) — "
                        "strict consistency instead of append-only")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from htrtf_spark.plans.incremental import extract_increment_once

    res = extract_increment_once(
        spark, args.source, args.dest,
        auto_rebaseline=args.auto_rebaseline,
        rebaseline_on_delete=args.rebaseline_on_delete,
    )
    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
