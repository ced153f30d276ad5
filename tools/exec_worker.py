"""One simulated executor: a pinned local[8] JVM extracting its slice of
the input files. Prints one JSON line {turns, wall_sec, turns_per_sec}.

    spark-submit --master local[8] --py-files htrtf_spark.zip \
        tools/exec_worker.py <comma-separated-parquet-files>
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    files = sys.argv[1].split(",")
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from htrtf_spark.plans.pipeline import extract_turns
    from htrtf_spark.schema import TRANSCRIPTS_SCHEMA

    df = spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(*files)

    # identical warmup on every executor: the full job once, untimed
    extract_turns(df, check_schema=False).write.mode("overwrite").format("noop").save()
    turns = df.count()

    t0 = time.monotonic()
    extract_turns(df, check_schema=False).write.mode("overwrite").format("noop").save()
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {"turns": turns, "wall_sec": round(wall, 3),
             "turns_per_sec": round(turns / wall, 1)}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
