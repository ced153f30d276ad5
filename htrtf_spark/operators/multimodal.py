"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched mapInPandas.

The IMAGE path is REAL end to end: payloads are PNG bytes decoded by the
stdlib codec (htrtf_spark.operators.png_io), normalized with the
reference's ``(255-img)/255`` arithmetic
(/root/reference/Modules/utils.py:184-186), and featurized as grid block
means — no image library needed. Audio/video decode remains stubbed
(``fake=True`` gives a deterministic payload-seeded stand-in with the
same shape contract), since no audio codec is implementable in-scope.

Reference analog: per-record PIL image load + normalize/pad
(/root/reference/Modules/utils.py:154-186).
"""

from __future__ import annotations

import hashlib
import zlib
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


def synth_image_array(media_id: int) -> np.ndarray:
    """Deterministic greyscale test image, closed-form per pixel so an
    external oracle can recompute every derived statistic:
    ``P(r,c) = (3*id + 7*r + 13*c) % 256`` with id-dependent dimensions."""
    h = 16 + (media_id * 7) % 17
    w = 16 + (media_id * 11) % 23
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    return ((3 * media_id + 7 * r + 13 * c) % 256).astype(np.uint8)


def synth_media(spark, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests/benches: image payloads are
    REAL PNG bytes (closed-form pixels, encodable by any PNG writer);
    audio/video payloads are opaque seeded bytes."""
    from htrtf_spark.operators.png_io import encode_png

    rs = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            img = synth_image_array(i)
            payload = encode_png(img)
            h, w = img.shape
            rows.append((i, kind, bytearray(payload), int(w), int(h), None))
        else:
            payload = rs.bytes(64 + int(rs.randint(0, 192)))
            # duration is CLOSED-FORM (not an RNG draw) so frame/window
            # grids derived from it are externally recomputable
            rows.append(
                (i, kind, bytearray(payload), None, None,
                 100 + (i * 937) % 599900)
            )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode + normalize an image payload.

    Real path (default): stdlib PNG decode → reference normalization
    ``(255-img)/255`` (utils.py:184-186) → float32 [H, W]. Raises
    ValueError on non-PNG/unsupported payloads (a data error the stage
    maps to ``decode_ok=False``).

    ``fake=True`` keeps the deterministic stand-in used for kinds with no
    codec (audio/video): a payload-digest-seeded FEATURE_DIM vector.
    """
    from htrtf_spark.operators.png_io import decode_png, normalize

    if fake:
        digest = hashlib.sha256(payload or b"").digest()
        seed = int.from_bytes(digest[:4], "big")
        rs = np.random.RandomState(seed)
        return rs.rand(FEATURE_DIM).astype(np.float32)
    return normalize(decode_png(payload))


def image_features(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """grid×grid block means of a normalized [H, W] image → FEATURE_DIM
    vector (the resize/feature-extract step; blocks cover the image by
    index partition so any H, W ≥ grid works)."""
    h, w = img.shape
    rows = np.linspace(0, h, grid + 1, dtype=np.int64)
    cols = np.linspace(0, w, grid + 1, dtype=np.int64)
    out = np.empty(grid * grid, dtype=np.float32)
    for i in range(grid):
        for j in range(grid):
            out[i * grid + j] = img[
                rows[i] : rows[i + 1], cols[j] : cols[j + 1]
            ].mean()
    return out


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
                    if not fake:
                        f = image_features(f)
                    feats.append([float(x) for x in f])
                    norms.append(int(round(float(np.linalg.norm(f)) * 10000)))
                    oks.append(True)
                except (ValueError, OSError, zlib.error):
                    # a per-payload data failure (bad/unsupported bytes)
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


IMAGE_STATS_DDL = (
    "media_id long, width int, height int, n_px long, sum_inv long, "
    "mean_inv_bp long"
)


def image_stats_map_in_pandas(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Real-decode image statistics in EXACT INTEGER domain so an external
    engine can recompute them bit-for-bit: per image, ``sum_inv`` is the
    integer sum of (255 - pixel) — the unnormalized reference ink mass
    (utils.py:184-186 before the /255) — and ``mean_inv_bp`` is
    (10000 * sum_inv) // (255 * n_px): pure integer floor division, no
    float rounding-mode hazard between engines.
    Rows that fail to decode are dropped (the featurize stage carries the
    decode_ok lineage)."""
    for pdf in batches:
        out = {k: [] for k in
               ("media_id", "width", "height", "n_px", "sum_inv", "mean_inv_bp")}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            raw = bytes(payload) if payload is not None else b""
            try:
                from htrtf_spark.operators.png_io import decode_png, to_gray

                img = to_gray(decode_png(raw))
            except (ValueError, OSError, zlib.error):
                continue
            h, w = img.shape
            s = int((255 - img).sum())
            n_px = h * w
            out["media_id"].append(int(mid))
            out["width"].append(w)
            out["height"].append(h)
            out["n_px"].append(n_px)
            out["sum_inv"].append(s)
            out["mean_inv_bp"].append((10000 * s) // (255 * n_px))
        yield pd.DataFrame(out)


def extract_image_stats(media: DataFrame) -> DataFrame:
    """(media_id, width, height, n_px, sum_inv, mean_inv_bp) for every
    decodable image payload — the oracle surface for the REAL decode."""
    return media.filter(F.col("kind") == "image").mapInPandas(
        image_stats_map_in_pandas, schema=IMAGE_STATS_DDL
    )


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


# ------------------------------------------------------- frame sampling

FRAMES_DDL = (
    "media_id long, frame_idx int, frame_ts_ms long, feat_digest long"
)

_FPS_DEN = 1000  # frame stride expressed in integer ms — no float clock


def sample_frames_map_in_pandas(stride_ms: int = 200, max_frames: int = 64):
    """Video frame sampling as Arrow-stage plumbing (the task's
    "frame-sample" op): one output row per sampled frame at timestamps
    0, stride, 2·stride, … < duration (capped at ``max_frames`` —
    uniform head sampling; a real decoder would seek those timestamps).
    The decode itself is the documented stub (no video codec in this
    container): ``feat_digest`` is a deterministic 48-bit digest of
    (payload bytes, frame ts) standing in for the decoded frame's
    feature hash, so downstream joins/dedup over frames are exercisable
    end to end. Exact integer arithmetic throughout — the frame grid is
    externally recomputable from duration_ms alone."""
    import hashlib

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "frame_idx", "frame_ts_ms", "feat_digest")}
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                # a nullable int column with NULLs arrives as float64
                # NaN through Arrow — pd.isna covers both None and NaN
                if pd.isna(dur) or int(dur) <= 0:
                    continue
                n = min(-(-int(dur) // stride_ms), max_frames)
                raw = bytes(payload) if payload is not None else b""
                base = hashlib.sha256(raw).digest()
                for i in range(n):
                    ts = i * stride_ms
                    d = hashlib.sha256(base + ts.to_bytes(8, "big")).digest()
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(ts)
                    out["feat_digest"].append(
                        int.from_bytes(d[:6], "big")
                    )
            yield pd.DataFrame(out)

    return stage


def sample_frames(media: DataFrame, stride_ms: int = 200,
                  max_frames: int = 64) -> DataFrame:
    """Frame grid over the video rows; narrow (no shuffle)."""
    return media.filter(F.col("kind") == "video").mapInPandas(
        sample_frames_map_in_pandas(stride_ms, max_frames), schema=FRAMES_DDL
    )


# ------------------------------------------------------- audio framing

AUDIO_FRAMES_DDL = (
    "media_id long, n_frames int, first_center_ms long, last_center_ms long"
)


def audio_framing_map_in_pandas(win_ms: int = 25, hop_ms: int = 10):
    """Audio analysis framing (the task's audio feature-extract
    plumbing): the standard win/hop grid — n_frames =
    1 + floor((duration − win) / hop) for duration ≥ win, else 0 —
    with integer frame centers. The PCM decode is the documented stub;
    the grid arithmetic (what the Spark stage owns) is exact and
    externally recomputable from duration_ms."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "n_frames", "first_center_ms", "last_center_ms")}
            for mid, dur in zip(pdf["media_id"], pdf["duration_ms"]):
                if pd.isna(dur) or int(dur) < win_ms:
                    continue
                n = 1 + (int(dur) - win_ms) // hop_ms
                out["media_id"].append(int(mid))
                out["n_frames"].append(n)
                out["first_center_ms"].append(win_ms // 2)
                out["last_center_ms"].append((n - 1) * hop_ms + win_ms // 2)
            yield pd.DataFrame(out)

    return stage


def audio_framing(media: DataFrame, win_ms: int = 25,
                  hop_ms: int = 10) -> DataFrame:
    return media.filter(F.col("kind") == "audio").mapInPandas(
        audio_framing_map_in_pandas(win_ms, hop_ms), schema=AUDIO_FRAMES_DDL
    )
