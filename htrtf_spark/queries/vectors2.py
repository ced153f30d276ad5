"""ANN queries (LSH-bucketed and IVF) over the ``embeddings`` table —
rows-only for the driver (the bucketing depends on float sign bits which
no SQL restatement can reproduce bit-exactly across engines); their
correctness oracle is the exact brute-force top-k (q28) via the recall
tests in tests/test_operators.py."""

from __future__ import annotations

from htrtf_spark.operators import multimodal, simsearch
from htrtf_spark.queries.util import t

_K = 10


def _query_vec(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    row = e.filter("vec_id = 0").collect()[0]
    return [float(x) for x in row["embedding"]]


def q40_lsh_ann_topk(spark, sf_dir):
    q = _query_vec(spark, sf_dir)
    return simsearch.lsh_topk(
        t(spark, sf_dir, "embeddings"), "vec_id", "embedding", q, k=_K, bits=6
    )


def q41_ivf_ann_topk(spark, sf_dir):
    q = _query_vec(spark, sf_dir)
    return simsearch.ivf_topk(
        t(spark, sf_dir, "embeddings"), "vec_id", "embedding", q,
        k=_K, n_cells=16, nprobe=6,
    )


def q42_multimodal_features(spark, sf_dir):
    media = multimodal.synth_media(spark, n=300, seed=42)
    return multimodal.extract_features(media, fake=True).drop("feat")


QUERIES = {
    "q40_lsh_ann_topk": (q40_lsh_ann_topk, None),
    "q41_ivf_ann_topk": (q41_ivf_ann_topk, None),
    "q42_multimodal_features": (q42_multimodal_features, None),
}
