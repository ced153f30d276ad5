"""Gate queries for the augmentation family (SURVEY §2.10 D1–D8) and the
event-time stateful eviction path.

q69 runs the REAL warp+morph machinery with pinned parameters so every
output integer is recomputable from the closed-form synth pixels by
DuckDB (translate = index shift, dilate = clamped 3×3 neighborhood max).
q70 runs the fully randomized D7 pipeline (seeded per-row RNG) and gates
the deterministic projection of its output (dims, pack frame, input ink
mass) — the random ink/payload columns are pytest-verified instead.
q68 drives a real two-batch Structured Streaming run where the WATERMARK
(not wall clock) evicts the first batch's conversations; the closed-row
totals are restated in SQL over the same events.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from htrtf_spark.operators import augment, multimodal
from htrtf_spark.queries.util import clean_sql

_N_MEDIA = 300

# --------------------------------------------------------------------- q69
# Deterministic-parameter augmentation: invert → translate(+3,+2) nearest
# → full-3×3 dilate (clamped-edge max), exact integer sums.


def q69_augment_deterministic(spark, sf_dir):
    media = multimodal.synth_media(spark, n=_N_MEDIA, seed=42)
    return augment.deterministic_augment(media, ty=2, tx=3)


_Q69_SQL = f"""
WITH dims AS (
  SELECT i AS media_id,
         16 + (i * 7) % 17 AS h,
         16 + (i * 11) % 23 AS w
  FROM range(0, {_N_MEDIA}, 3) t(i)
),
cells AS (
  SELECT d.media_id, d.h, d.w, r.r, c.c
  FROM dims d
  JOIN generate_series(0, 40) r(r) ON r.r < d.h
  JOIN generate_series(0, 40) c(c) ON c.c < d.w
),
-- shifted inverted image: S(r,c) = 255 - P(r-2, c-3) inside, else 0
shifted_sum AS (
  SELECT media_id,
         SUM(CASE WHEN r >= 2 AND c >= 3
             THEN 255 - ((3*media_id + 7*(r-2) + 13*(c-3)) % 256)
             ELSE 0 END) AS ink_shifted
  FROM cells GROUP BY media_id
),
neigh AS (
  SELECT media_id, h, w, r, c,
         LEAST(GREATEST(r + dr.dr, 0), h - 1) AS rr,
         LEAST(GREATEST(c + dc.dc, 0), w - 1) AS cc
  FROM cells, (VALUES (-1),(0),(1)) dr(dr), (VALUES (-1),(0),(1)) dc(dc)
),
dil AS (
  SELECT media_id, r, c,
         MAX(CASE WHEN rr >= 2 AND cc >= 3
             THEN 255 - ((3*media_id + 7*(rr-2) + 13*(cc-3)) % 256)
             ELSE 0 END) AS mx
  FROM neigh GROUP BY media_id, r, c
),
dil_sum AS (
  SELECT media_id, SUM(mx) AS ink_dilated FROM dil GROUP BY media_id
)
SELECT d.media_id,
       CAST(d.h AS INTEGER) AS height,
       CAST(d.w AS INTEGER) AS width,
       CAST(s.ink_shifted AS BIGINT) AS ink_shifted,
       CAST(x.ink_dilated AS BIGINT) AS ink_dilated
FROM dims d
JOIN shifted_sum s USING (media_id)
JOIN dil_sum x USING (media_id)
"""

# --------------------------------------------------------------------- q70
# Randomized D1–D8 (the production shape): full distort pipeline runs in
# Spark with per-row seeded draws; the gate hashes its deterministic
# projection. ink_in is the pre-augmentation inverted-pixel sum — the
# same closed form as q42's sum_inv — so a hash match proves the real
# decode fed the randomized pipeline.

_PACK_H, _PACK_W = 64, 64


def q70_augment_randomized(spark, sf_dir):
    media = multimodal.synth_media(spark, n=_N_MEDIA, seed=42)
    return augment.augment_images(
        media, seed=7, prob=0.5, pack_h=_PACK_H, pack_w=_PACK_W
    ).select("media_id", "height", "width", "pack_h", "pack_w", "ink_in")


_Q70_SQL = f"""
WITH dims AS (
  SELECT i AS media_id,
         16 + (i * 11) % 23 AS w,
         16 + (i * 7) % 17 AS h
  FROM range(0, {_N_MEDIA}, 3) t(i)
)
SELECT media_id,
       CAST(h AS INTEGER) AS height,
       CAST(w AS INTEGER) AS width,
       CAST({_PACK_H} AS INTEGER) AS pack_h,
       CAST({_PACK_W} AS INTEGER) AS pack_w,
       CAST(list_sum([255 - ((3*media_id + 7*(i // w) + 13*(i % w)) % 256)
                      for i in generate_series(0, w*h - 1)]) AS BIGINT)
           AS ink_in
FROM dims
"""

# --------------------------------------------------------------------- q68
# Event-time eviction through the gate: two file-batches of real driver
# events reshaped as transcripts; batch 1 (even user_ids, ts=base) goes
# idle, batch 2 (odd user_ids, ts=base+3h) advances the watermark past
# base+gap, so every batch-1 conversation emits its closed=true session
# record. The oracle recomputes each closed conversation's totals with
# the q32 extraction SQL. Gate-scale streaming proof; the production
# path is identical but unbounded.

_EVICT_MOD = 8  # keep the stream small: user_id % _EVICT_MOD ∈ {0, 1}


def _evict_input(spark, sf_dir):
    from htrtf_spark.sources.transcripts import events_as_transcripts

    tr = events_as_transcripts(spark, sf_dir)
    uid = F.split_part(F.col("conv_id"), F.lit("-"), F.lit(2)).cast("long")
    base = F.to_timestamp(F.lit("2026-01-01 12:00:00"))
    return (
        tr.filter(uid % _EVICT_MOD < 2)
        .withColumn(
            "ts",
            F.when(uid % _EVICT_MOD == 0, base).otherwise(
                base + F.expr("INTERVAL 3 HOURS")
            ),
        )
        .withColumn("_batch", (uid % _EVICT_MOD).cast("int"))
    )


def q68_event_time_eviction(spark, sf_dir):
    from htrtf_spark.streaming import extract_stream as xs
    from htrtf_spark.streaming import stateful

    inp = _evict_input(spark, sf_dir).cache()
    in_dir = tempfile.mkdtemp(prefix="htrtf_evict_gate_")
    sink = "q68_evict_sink"

    inp.filter(F.col("_batch") == 0).drop("_batch").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    ex = xs.stream_extract(xs.read_transcript_stream(spark, in_dir))
    q = (
        stateful.stream_conversation_state_event_time(
            ex, gap="30 minutes", watermark="10 minutes"
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(sink)
        .start()
    )
    try:
        q.processAllAvailable()
        inp.filter(F.col("_batch") == 1).drop("_batch").coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        q.processAllAvailable()
    finally:
        q.stop()
        inp.unpersist()
    return (
        spark.table(sink)
        .filter("closed")
        .select("conv_id", "n_turns", "n_rejected", "total_chars")
    )


_Q68_SQL = f"""
WITH tr AS (
  SELECT 'conv-' || lpad(CAST(user_id AS VARCHAR), 8, '0') AS conv_id,
         user_id,
         concat_ws(' ', event_type, 'value', CAST(value AS VARCHAR), props) AS text
  FROM events
  WHERE user_id % {_EVICT_MOD} = 0
)
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(CASE WHEN {clean_sql("text")} = '' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_rejected,
       CAST(SUM(length({clean_sql("text")})) AS BIGINT) AS total_chars
FROM tr
GROUP BY conv_id, user_id
"""


# --------------------------------------------------------------------- q71
# S7 + T1/T2 through the gate: external params written to a parquet
# table, loaded + broadcast, and the conv featurizer run over real PNG
# payloads. Two independently-SQL-checkable facets ride the hash: the
# ceil-dim/seq_len tracking of the pooled stack (T2, layers.py:282-289)
# and ``box_sum`` — the SAME conv2d code with an all-ones 3x3 kernel on
# the raw inverted integers, equal to Σ V(r,c)·cover(r)·cover(c) where
# cover is 2 at the border, 3 inside (zero 'SAME' padding). The float
# feature vector itself is pytest-verified (cross-engine float hazard).


def q71_conv_featurize(spark, sf_dir):
    from htrtf_spark.operators import convnet

    media = multimodal.synth_media(spark, n=_N_MEDIA, seed=42)
    pdir = os.path.join(tempfile.mkdtemp(prefix="htrtf_params_gate_"), "params")
    convnet.write_params(spark, convnet.synth_params(seed=5), pdir)
    return convnet.featurize_conv(media, pdir).drop("feat")


_Q71_SQL = f"""
WITH dims AS (
  SELECT i AS media_id,
         16 + (i * 7) % 17 AS h,
         16 + (i * 11) % 23 AS w
  FROM range(0, {_N_MEDIA}, 3) t(i)
)
SELECT media_id,
       CAST(h AS INTEGER) AS height,
       CAST(w AS INTEGER) AS width,
       CAST(CEIL(h / 8.0) AS INTEGER) AS out_h,
       CAST(CEIL(w / 8.0) AS INTEGER) AS out_w,
       CAST(CEIL(w / 8.0) AS INTEGER) AS seq_len_out,
       CAST(list_sum(
         [(255 - ((3*media_id + 7*(i // w) + 13*(i % w)) % 256))
          * (3 - CAST(i // w = 0 AS INT) - CAST(i // w = h - 1 AS INT))
          * (3 - CAST(i % w = 0 AS INT) - CAST(i % w = w - 1 AS INT))
          for i in generate_series(0, w*h - 1)]) AS BIGINT) AS box_sum
FROM dims
"""


# --------------------------------------------------------------------- q72
# The reference's ENTIRE eval path (conv stack → height-collapse → 5×
# BiLSTM → dense logits → CTC greedy collapse → text) as one broadcast-
# weight Arrow stage over real PNGs (T1–T5+T7/T8). The LSTM floats are
# not SQL-recomputable, so the gate hashes the closed-form projection
# (dims + frame count); the decoded strings and a logit checksum are
# verified against a local recompute in tests/test_rnn.py.

_NET_CLASSES = 28  # 27-char toy charset + blank


def q72_net_decode(spark, sf_dir):
    from htrtf_spark.operators import convnet, rnn

    charset = list("abcdefghijklmnopqrstuvwxyz ")
    params = rnn.synth_net_params(
        seed=5, num_hidden=8, num_classes=_NET_CLASSES, image_height=40
    )
    pdir = os.path.join(tempfile.mkdtemp(prefix="htrtf_netp_gate_"), "params")
    convnet.write_params(spark, params, pdir)
    media = multimodal.synth_media(spark, n=_N_MEDIA, seed=42)
    return rnn.net_decode(media, pdir, charset, image_height=40).select(
        "media_id", "height", "width", "t_frames", "n_classes"
    )


_Q72_SQL = f"""
WITH dims AS (
  SELECT i AS media_id,
         16 + (i * 7) % 17 AS h,
         16 + (i * 11) % 23 AS w
  FROM range(0, {_N_MEDIA}, 3) t(i)
)
SELECT media_id,
       CAST(h AS INTEGER) AS height,
       CAST(w AS INTEGER) AS width,
       CAST(CEIL(w / 8.0) AS INTEGER) AS t_frames,
       CAST({_NET_CLASSES} AS INTEGER) AS n_classes
FROM dims
"""


# --------------------------------------------------------------------- q73
# T10-T16 through the gate: 4-direction MDLSTM wavefront sweep (width-
# chunked, T12) with broadcast weights over real PNGs. The recurrence
# floats are not SQL-recomputable; the gate hashes the closed-form dims
# projection while the numerics are pytest-verified against an
# independent raster-order recursion (tests/test_mdlstm.py).

_MD_UNITS = 6


def q73_mdlstm_features(spark, sf_dir):
    from htrtf_spark.operators import mdlstm

    media = multimodal.synth_media(spark, n=_N_MEDIA, seed=42)
    return mdlstm.mdlstm_features(media, units=_MD_UNITS, seed=11, chunk=16).select(
        "media_id", "height", "width", "units"
    )


_Q73_SQL = f"""
WITH dims AS (
  SELECT i AS media_id,
         16 + (i * 7) % 17 AS h,
         16 + (i * 11) % 23 AS w
  FROM range(0, {_N_MEDIA}, 3) t(i)
)
SELECT media_id,
       CAST(h AS INTEGER) AS height,
       CAST(w AS INTEGER) AS width,
       CAST({_MD_UNITS} AS INTEGER) AS units
FROM dims
"""


QUERIES = {
    "q68_event_time_eviction": (q68_event_time_eviction, _Q68_SQL),
    "q69_augment_deterministic": (q69_augment_deterministic, _Q69_SQL),
    "q70_augment_randomized": (q70_augment_randomized, _Q70_SQL),
    "q71_conv_featurize": (q71_conv_featurize, _Q71_SQL),
    "q72_net_decode": (q72_net_decode, _Q72_SQL),
    "q73_mdlstm_features": (q73_mdlstm_features, _Q73_SQL),
}


# --------------------------------------------------------------------- q75
# Video frame sampling (the task's "frame-sample" op): uniform stride
# grid over closed-form durations, capped; the gate hashes the whole
# frame table (media_id, frame_idx, frame_ts_ms). The per-frame feature
# digest is payload-derived (decode stubbed — no video codec here) and
# pytest-verified for determinism instead.

_STRIDE_MS, _MAX_FRAMES = 200, 64


def q75_video_frame_sample(spark, sf_dir):
    media = multimodal.synth_media(spark, n=_N_MEDIA, seed=42)
    return multimodal.sample_frames(
        media, stride_ms=_STRIDE_MS, max_frames=_MAX_FRAMES
    ).select("media_id", "frame_idx", "frame_ts_ms")


_Q75_SQL = f"""
WITH vids AS (
  SELECT i AS media_id, 100 + (i * 937) % 599900 AS dur
  FROM range(2, {_N_MEDIA}, 3) t(i)
),
grid AS (
  SELECT media_id,
         LEAST(CAST(CEIL(dur / {_STRIDE_MS}.0) AS INT), {_MAX_FRAMES}) AS n
  FROM vids
)
SELECT media_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(f * {_STRIDE_MS} AS BIGINT) AS frame_ts_ms
FROM grid, LATERAL (SELECT unnest(range(0, n)) AS f)
"""

# --------------------------------------------------------------------- q76
# Audio analysis framing: the standard 25ms-window / 10ms-hop grid —
# n = 1 + (dur - win) // hop, integer centers — exact on both engines.

_WIN_MS, _HOP_MS = 25, 10


def q76_audio_framing(spark, sf_dir):
    media = multimodal.synth_media(spark, n=_N_MEDIA, seed=42)
    return multimodal.audio_framing(media, win_ms=_WIN_MS, hop_ms=_HOP_MS)


_Q76_SQL = f"""
WITH auds AS (
  SELECT i AS media_id, 100 + (i * 937) % 599900 AS dur
  FROM range(1, {_N_MEDIA}, 3) t(i)
)
SELECT media_id,
       CAST(1 + (dur - {_WIN_MS}) // {_HOP_MS} AS INTEGER) AS n_frames,
       CAST({_WIN_MS} // 2 AS BIGINT) AS first_center_ms,
       CAST(((dur - {_WIN_MS}) // {_HOP_MS}) * {_HOP_MS} + {_WIN_MS} // 2
            AS BIGINT) AS last_center_ms
FROM auds
WHERE dur >= {_WIN_MS}
"""

QUERIES["q75_video_frame_sample"] = (q75_video_frame_sample, _Q75_SQL)
QUERIES["q76_audio_framing"] = (q76_audio_framing, _Q76_SQL)
