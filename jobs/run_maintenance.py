"""spark-submit job: one maintenance pass over an Iceberg table —
compaction (delete merge / small files), manifest rewrite, snapshot
expiration, orphan reap — under explicit thresholds. Schedule on the
same cadence as ingest (e.g. hourly compact+rewrite, daily
expire+orphans).

    spark-submit --py-files htrtf_spark.zip jobs/run_maintenance.py \
        --table /warehouse/transcripts \
        --compact-min-delete-files 1 \
        --rewrite-min-manifests 8 \
        --expire-keep-last 24 --orphan-grace-sec 259200
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--table", required=True, help="Iceberg table path")
    p.add_argument("--compact-min-delete-files", type=int, default=1,
                   help="compact when >= N live delete files (<=0 disables)")
    p.add_argument("--compact-max-avg-file-bytes", type=int, default=None,
                   help="also compact when mean live data-file size < N")
    p.add_argument("--rewrite-min-manifests", type=int, default=8,
                   help="rewrite manifests when the list holds > N")
    p.add_argument("--expire-keep-last", type=int, default=None,
                   help="expire all but the newest N ancestors (beware "
                        "incremental/streaming consumer lag — expired "
                        "markers force a re-baseline)")
    p.add_argument("--orphan-grace-sec", type=float, default=None,
                   help="reap unreferenced files older than this")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    owned = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from htrtf_spark.sources.iceberg import maintain_iceberg_table

    report = maintain_iceberg_table(
        spark,
        args.table,
        compact_min_delete_files=(
            args.compact_min_delete_files
            if args.compact_min_delete_files > 0
            else None
        ),
        compact_max_avg_file_bytes=args.compact_max_avg_file_bytes,
        rewrite_min_manifests=args.rewrite_min_manifests,
        expire_keep_last=args.expire_keep_last,
        orphan_grace_seconds=args.orphan_grace_sec,
    )
    print(json.dumps(report))
    if owned:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
