"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched mapInPandas.

The Spark-side machinery (schema, partition-friendly batch shape, UDF
signatures, size accounting) is real and tested; the codec step is
STUBBED — this container has no image/audio libraries, so ``decode_image``
raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder (seeded from the payload hash) produces stable
feature vectors so the downstream plumbing is exercisable end-to-end.

Reference analog: per-record PIL image load + normalize/pad
(/root/reference/Modules/utils.py:154-186) — there, too, the decode is a
per-record black box between columnar stages.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURES_DDL = (
    "media_id long, kind string, n_bytes int, feat array<float>, "
    "feat_norm_bp long, decode_ok boolean"
)

FEATURE_DIM = 16


def synth_media(spark, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary media table for tests/benches."""
    rs = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rs.bytes(64 + int(rs.randint(0, 192)))
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                int(rs.randint(16, 4096)) if kind == "image" else None,
                int(rs.randint(16, 4096)) if kind == "image" else None,
                int(rs.randint(100, 600000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real decode requires an image codec not present in this
    container. ``fake=True`` gives a deterministic stand-in (seeded from
    the payload digest) with the same dtype/shape contract a real decoder
    would satisfy."""
    if not fake:
        raise NotImplementedError(
            "image codec not available in this environment; pass fake=True "
            "for the deterministic stand-in decoder"
        )
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:4], "big")
    rs = np.random.RandomState(seed)
    return rs.rand(FEATURE_DIM).astype(np.float32)


def featurize_map_in_pandas(fake: bool = True):
    """Build the mapInPandas stage: binary payload → fixed-dim feature
    vector + lineage columns. Arrow moves the binary column zero-copy;
    the per-batch loop is numpy-only."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, norms, oks, sizes = [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                sizes.append(len(raw))
                try:
                    f = decode_image(raw, fake=fake)
                    feats.append([float(x) for x in f])
                    norms.append(int(round(float(np.linalg.norm(f)) * 10000)))
                    oks.append(True)
                except NotImplementedError:
                    # configuration error (codec absent), not a data error —
                    # fail the stage loudly instead of emitting a "successful"
                    # run with decode_ok=False on every row
                    raise
                except (ValueError, OSError):
                    # a real decoder's per-payload data failure
                    feats.append(None)
                    norms.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": pd.array(sizes, dtype="int32"),
                    "feat": feats,
                    "feat_norm_bp": pd.array(norms, dtype="Int64"),
                    "decode_ok": oks,
                }
            )

    return stage


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    return media.mapInPandas(featurize_map_in_pandas(fake=fake), schema=FEATURES_DDL)


def media_size_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata rollup over the opaque columns (no decode)."""
    return (
        media.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max("width").alias("max_w"),
            F.max("height").alias("max_h"),
            F.max("duration_ms").alias("max_duration_ms"),
        )
        .orderBy("kind")
    )
