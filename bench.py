"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus extraction
throughput on a deterministic synthetic transcripts corpus.

Prints ONE JSON line:
  {"metric": ..., "value": <total headline seconds>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "extraction": {...}, "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_TURN_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "60000"))

# Headline subset: one per operator family, the ones that stress shuffle /
# join / window / Python-stage paths.
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
    # round-6 additions: the substring-dedup shuffle (heaviest new
    # operator), the PII regex chain + Luhn fold (codegen-bound narrow
    # stage), the two-scan mixture sampler, and the composed
    # extract→strip→quality→dedup pipeline (first-measurement baselines)
    "q96_repeated_substring_spans",
    "q97_substring_dedup_apply",
    "q99_pii_redaction",
    "q100_temperature_mixture",
    "q101_training_corpus_stripped",
]


def _materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    from htrtf_spark.queries import spark_queries
    from htrtf_spark.session import get_spark
    from htrtf_spark.plans.pipeline import extract_turns
    from htrtf_spark.schema import TRANSCRIPTS_SCHEMA
    from htrtf_spark.synth import synth_spark

    spark = get_spark(app_name="bench")
    qs = spark_queries()

    # Warm up executors + Python workers (untimed).
    _materialize(qs["q31_extract_documents"](spark, sf_dir))

    # best-of-2 per query: this VM has ±25-30% transient throughput noise;
    # a single rep makes round-over-round comparisons mostly measure the
    # box, not the code
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _rep in range(2):
            t0 = time.monotonic()
            _materialize(qs[name](spark, sf_dir))
            best = min(best, time.monotonic() - t0)
        timings[name] = round(best, 3)

    # Extraction throughput on cached deterministic synthetic transcripts.
    # Cache key includes a hash of the generator source so editing synth.py
    # can never silently benchmark a stale corpus.
    import hashlib

    from htrtf_spark import charset as _cs_mod
    from htrtf_spark import synth as _synth_mod

    h = hashlib.md5(open(_synth_mod.__file__, "rb").read())
    h.update(open(_cs_mod.__file__, "rb").read())
    tag = h.hexdigest()[:8]
    cache = f"/tmp/htrtf_spark_bench/transcripts_c{BENCH_TURN_CONVS}_s42_{tag}.parquet"
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        synth_spark(spark, n_convs=BENCH_TURN_CONVS, seed=42, partitions=64).write.mode(
            "overwrite"
        ).parquet(cache)
    tdf = spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(cache)
    _materialize(extract_turns(tdf, check_schema=False))  # warm
    turns = tdf.count()
    ext_wall = float("inf")
    for _rep in range(2):
        t0 = time.monotonic()
        _materialize(extract_turns(tdf, check_schema=False))
        ext_wall = min(ext_wall, time.monotonic() - t0)
    timings["extract_synth"] = round(ext_wall, 3)

    # North-rule input path: the SAME extraction read from an Iceberg
    # table (manifest-listed snapshot scan) instead of raw parquet —
    # measures the metadata layer's read overhead. Cached table, keyed
    # like the corpus; reported alongside (not in) the headline sum.
    from htrtf_spark.sources.iceberg import table_exists, write_iceberg_table
    from htrtf_spark.sources.transcripts import read_transcripts_iceberg

    ice_loc = (
        f"/tmp/htrtf_spark_bench/iceberg_c{BENCH_TURN_CONVS}_s42_{tag}"
    )
    if not table_exists(ice_loc):
        write_iceberg_table(tdf, ice_loc)
    idf = read_transcripts_iceberg(spark, ice_loc)
    _materialize(extract_turns(idf, check_schema=False))  # warm
    ice_wall = float("inf")
    for _rep in range(2):
        t0 = time.monotonic()
        _materialize(extract_turns(idf, check_schema=False))
        ice_wall = min(ice_wall, time.monotonic() - t0)
    timings["extract_iceberg"] = round(ice_wall, 3)

    # N→4N scaling evidence (protocol + confound analysis: BENCH/BASELINE.md).
    # Two valid instruments: cores 2→8 within one pinned JVM (neither side
    # saturates the box) and 1→4 concurrent pinned executor JVMs. The 8→32
    # pair is reported but measures the single box's DRAM ceiling, not the
    # engine (local[8] already approaches ~1.2M turns/s bandwidth limit).
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    scaling = {}
    p = os.path.join(bench_dir, "scaling.json")
    if os.path.exists(p):
        with open(p) as f:
            d = json.load(f)
        # no legacy-key fallback: an old-format file's
        # scaling_efficiency_n_to_4n was the 8->32 ceiling pair and must
        # never be reported as the engine pair
        scaling["cores_2_to_8"] = d.get("scaling_efficiency_2_to_8")
        scaling["cores_8_to_32_box_ceiling"] = d.get("scaling_efficiency_8_to_32")
    p = os.path.join(bench_dir, "scaling_executors.json")
    if os.path.exists(p):
        with open(p) as f:
            d = json.load(f)
        scaling["executors_1_to_4_controlled"] = d.get("scaling_efficiency_n_to_4n")
    if scaling:
        gate_vals = [
            v
            for k, v in scaling.items()
            if v is not None and k in ("cores_2_to_8", "executors_1_to_4_controlled")
        ]
        # honest summary: the MIN of the valid instruments (the weakest
        # evidence), not the max — each instrument must clear the gate
        # on its own. Both raw values stay reported above.
        scaling["efficiency_n_to_4n"] = min(gate_vals) if gate_vals else None
        scaling["gate"] = 0.8
        scaling["pass"] = bool(gate_vals) and min(gate_vals) >= 0.8
        scaling["protocol"] = "BENCH/BASELINE.md"
    scaling = scaling or None

    result = {
        "metric": "headline_suite_wall",
        # the headline value sums ONLY the HEADLINE queries — extract_synth
        # is reported separately (its corpus size is env-configurable and
        # must not move the tracked suite metric)
        "value": round(sum(timings[n] for n in HEADLINE), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "extraction": {
            "turns": turns,
            "wall_sec": round(ext_wall, 3),
            "turns_per_sec": round(turns / ext_wall, 1),
        },
        "scaling": scaling,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
