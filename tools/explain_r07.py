"""Capture .explain("formatted") for headline queries into plans/r07/.

Usage: python tools/explain_r07.py before|after [query ...]
Writes plans/r07/<query>_<tag>.txt for each headline query (or the
subset given). Read-only w.r.t. query results — builds the plans, never
executes them.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q06_revenue_per_nation",
    "q11_running_totals",
    "q12_sessionize",
    "q25_trigram_jaccard_pairs",
    "q27_minhash_neardup_verified",
    "q29_near_pairs",
    "q31_extract_documents",
    "q32_extract_events",
    "q62_conversation_documents",
    "q96_repeated_substring_spans",
    "q97_substring_dedup_apply",
    "q99_pii_redaction",
    "q100_temperature_mixture",
    "q101_training_corpus_stripped",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from htrtf_spark.queries import spark_queries
    from htrtf_spark.session import get_spark

    spark = get_spark(app_name=f"explain_{tag}")
    qs = spark_queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r07",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
