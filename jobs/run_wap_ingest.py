"""Write-audit-publish transcript ingest: candidate data lands on an
AUDIT BRANCH, the real extraction + hygiene gates run against what was
actually committed, and only a passing batch is published to main — one
atomic pointer move (sources/iceberg.py fast_forward). Main readers
(batch, incremental ticks, the streaming source) never observe an
unaudited row.

    spark-submit --py-files htrtf_spark.zip jobs/run_wap_ingest.py \
        --table /warehouse/transcripts --input candidates.parquet \
        --max-reject-bp 500

Failure shape: an audit failure leaves main untouched and the branch in
place (named in the result) for inspection; ``--drop-on-fail`` deletes
the branch instead, releasing its snapshots to the next
expire_snapshots.
"""

from __future__ import annotations

import argparse
import json
import sys
import uuid


def wap_ingest(
    spark,
    table_loc: str,
    candidates,
    max_reject_bp: int = 10000,
    min_rows: int = 1,
    branch: str | None = None,
    drop_on_fail: bool = False,
) -> dict:
    """Library form. Returns {"published", "branch", "rows", "rejected",
    "reject_bp", "snapshot"} — ``published`` False means the audit
    failed and main is untouched.

    Audit gates (run over the BRANCH read — the bytes that would be
    published, not the in-memory frame):
    - row conservation: the branch increment holds exactly the
      candidate row count (the extraction stage itself asserts
      rows_in == rows_out + rejected-with-reason);
    - rejection budget: extraction reject fraction <= ``max_reject_bp``
      (floor basis points);
    - non-triviality: at least ``min_rows`` candidate rows."""
    from pyspark.sql import functions as F

    from htrtf_spark.plans.pipeline import extract_turns
    from htrtf_spark.sources.iceberg import (
        _find_snapshot,
        append_iceberg_table,
        create_branch,
        current_metadata,
        drop_ref,
        fast_forward,
        read_iceberg_increment,
        resolve_ref,
    )

    if not (0 <= int(max_reject_bp) <= 10000):
        raise ValueError("max_reject_bp must be 0..10000")
    # conservation gate baseline: count the CANDIDATE frame once,
    # BEFORE the append (ADVICE r6: recounting after the write lets a
    # non-deterministic or concurrently-changed source make the gate
    # compare the increment against different bytes than were counted).
    # Deliberately NOT derived from the snapshot's added-records
    # summary: that would make the gate self-referential — a lossy
    # append would declare exactly what it wrote and always pass.
    n_cand = candidates.count()
    name = branch or f"wap-{uuid.uuid4().hex[:12]}"
    fork = create_branch(table_loc, name)
    try:
        snap = append_iceberg_table(candidates, table_loc, branch=name)

        # audit the COMMITTED bytes: exactly the branch increment since
        # the fork — never the in-memory frame (what you validate must
        # be what you publish)
        committed = read_iceberg_increment(
            spark, table_loc, from_snapshot_id=fork, to_snapshot_id=snap
        )
        extracted = extract_turns(committed, check_schema=False).cache()
        rows = extracted.count()
        rejected = extracted.filter(
            F.col("reject_reason").isNotNull()
        ).count()
        extracted.unpersist()
        reject_bp = (rejected * 10000) // rows if rows else 10000
        # cross-check: the manifest-declared count of the committed
        # increment must also agree — catches a manifest/summary
        # inconsistency the read-back alone could mask
        n_committed = int(
            _find_snapshot(current_metadata(table_loc), snap)["summary"][
                "added-records"
            ]
        )
    except BaseException:
        # an append/audit crash must not leak the auto-created branch
        # (it would pin its snapshot chain against expire_snapshots
        # forever, ADVICE r6); audit FAILURE (ok=False below) is not a
        # crash — that branch is kept deliberately for inspection
        try:
            drop_ref(table_loc, name)
        except Exception:
            pass
        raise

    ok = (
        rows == n_cand
        and rows == n_committed
        and rows >= int(min_rows)
        and reject_bp <= int(max_reject_bp)
    )
    result = {
        "published": bool(ok),
        "branch": name,
        "rows": rows,
        "candidate_rows": n_cand,
        "committed_rows": n_committed,
        "rejected": rejected,
        "reject_bp": reject_bp,
        "snapshot": snap,
    }
    if ok:
        fast_forward(table_loc, name)
        drop_ref(table_loc, name)  # published: the pointer is main now
        result["main"] = resolve_ref(table_loc, "main")
    elif drop_on_fail:
        drop_ref(table_loc, name)
        result["branch_dropped"] = True
    return result


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--table", required=True, help="Iceberg transcripts table")
    p.add_argument("--input", required=True, help="candidate parquet path")
    p.add_argument("--max-reject-bp", type=int, default=10000,
                   help="audit gate: max extraction-reject fraction in "
                        "floor basis points (default: no budget)")
    p.add_argument("--min-rows", type=int, default=1)
    p.add_argument("--branch", default=None,
                   help="audit branch name (default: wap-<uuid>)")
    p.add_argument("--drop-on-fail", action="store_true",
                   help="delete the audit branch when the audit fails "
                        "(default: keep it for inspection)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from htrtf_spark.sources.transcripts import read_transcripts_parquet

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    result = wap_ingest(
        spark,
        args.table,
        read_transcripts_parquet(spark, args.input),
        max_reject_bp=args.max_reject_bp,
        min_rows=args.min_rows,
        branch=args.branch,
        drop_on_fail=args.drop_on_fail,
    )
    print(json.dumps(result))
    spark.stop()
    return 0 if result["published"] else 4


if __name__ == "__main__":
    sys.exit(main())
