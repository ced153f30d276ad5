"""spark-submit job: persisted-index incremental dedup ingest.

Bootstrap once, then schedule ticks per ingest cadence; each tick
probes the PERSISTED corpus band index (O(batch x bands) — the corpus
is never rescanned, the index never rebuilt) and appends accepted
(novel) documents + their band rows. Exactly-once per --batch-id; see
htrtf_spark/plans/dedup_ingest.py for the crash-replay contract.

    # bootstrap from an initial corpus table (parquet dir of id/text)
    spark-submit --py-files htrtf_spark.zip jobs/run_dedup_ingest.py \
        --bootstrap --input /data/seed_docs \
        --corpus /warehouse/corpus --index /warehouse/dedup_index

    # per-batch tick
    spark-submit --py-files htrtf_spark.zip jobs/run_dedup_ingest.py \
        --input /data/batch_2024_06_01 --batch-id 2024-06-01 \
        --corpus /warehouse/corpus --index /warehouse/dedup_index
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="parquet dir of candidate docs")
    p.add_argument("--corpus", required=True, help="Iceberg corpus table path")
    p.add_argument("--index", required=True, help="Iceberg band-index table path")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--bootstrap", action="store_true",
                   help="create the corpus + index from --input")
    p.add_argument("--batch-id", default=None,
                   help="tick idempotency key (required unless --bootstrap)")
    p.add_argument("--max-doc-freq", type=int, default=None,
                   help="bootstrap stop-shingle cap (default: operator default)")
    args = p.parse_args(argv)
    if not args.bootstrap and not args.batch_id:
        p.error("--batch-id is required for ticks")

    from pyspark.sql import SparkSession

    owned = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from htrtf_spark.operators.dedup import DEFAULT_MAX_DOC_FREQ
    from htrtf_spark.plans.dedup_ingest import (
        dedup_ingest_bootstrap,
        dedup_ingest_tick,
    )

    docs = spark.read.parquet(args.input)
    if args.bootstrap:
        res = dedup_ingest_bootstrap(
            spark, docs, args.corpus, args.index,
            id_col=args.id_col, text_col=args.text_col,
            max_doc_freq=(
                DEFAULT_MAX_DOC_FREQ
                if args.max_doc_freq is None
                else (args.max_doc_freq or None)
            ),
        )
    else:
        res = dedup_ingest_tick(
            spark, docs, args.corpus, args.index, batch_id=args.batch_id,
            id_col=args.id_col, text_col=args.text_col,
        )
    print(json.dumps(res))
    if owned:  # don't tear down a session the caller (e.g. pytest) owns
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
