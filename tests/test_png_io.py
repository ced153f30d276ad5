"""Stdlib PNG codec: roundtrip, every scanline filter, RGB, error paths,
and the real-decode Spark stage against a pure-numpy recompute.

Reference analog for the normalize arithmetic:
/root/reference/Modules/utils.py:184-186 ((255-img)/255).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from htrtf_spark.operators import multimodal
from htrtf_spark.operators.png_io import (
    _chunk,
    _SIG,
    decode_png,
    encode_png,
    normalize,
)


def _rand_img(h, w, seed, channels=1):
    rs = np.random.RandomState(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    return rs.randint(0, 256, size=shape, dtype=np.uint8).astype(np.uint8)


def _build_png(img: np.ndarray, filters) -> bytes:
    """Forward-filter `img` per the PNG spec with the given per-row filter
    types and assemble a PNG — an independent encoder so decode is tested
    against the spec, not against encode_png."""
    if img.ndim == 2:
        channels, ctype = 1, 0
        flat = img[:, :, None]
    else:
        channels, ctype = img.shape[2], 2
        flat = img
    h, w = img.shape[:2]
    bpp = channels
    stride = w * channels
    rows = flat.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for r in range(h):
        ft = filters[r % len(filters)]
        cur = rows[r]
        if ft == 0:
            enc = cur.copy()
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = (cur - left) & 0xFF
        elif ft == 2:  # Up
            enc = (cur - prev) & 0xFF
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = (cur - pred) & 0xFF
        out.append(ft)
        out.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out)))
        + _chunk(b"IEND", b"")
    )


def test_roundtrip_grey():
    for seed, (h, w) in enumerate([(1, 1), (3, 7), (16, 16), (40, 23)]):
        img = _rand_img(h, w, seed)
        assert np.array_equal(decode_png(encode_png(img)), img)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_each_filter_grey(ft):
    img = _rand_img(11, 13, 100 + ft)
    assert np.array_equal(decode_png(_build_png(img, [ft])), img)


def test_mixed_filters_rgb():
    img = _rand_img(9, 6, 7, channels=3)
    got = decode_png(_build_png(img, [0, 1, 2, 3, 4]))
    assert got.shape == (9, 6, 3)
    assert np.array_equal(got, img)


def test_multi_idat():
    img = _rand_img(8, 8, 3)
    # split the compressed stream across two IDAT chunks
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(8))
    comp = zlib.compress(raw)
    mid = len(comp) // 2
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0)
    png = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", comp[:mid])
        + _chunk(b"IDAT", comp[mid:])
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), img)


def test_error_paths():
    img = _rand_img(4, 4, 1)
    good = encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good)
    # corrupt one IDAT byte → CRC mismatch
    bad = bytearray(good)
    idat_at = good.index(b"IDAT") + 4
    bad[idat_at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:-8])
    # 16-bit depth unsupported
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    png16 = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="depth"):
        decode_png(png16)


def test_normalize_matches_reference_arithmetic():
    img = _rand_img(5, 9, 2)
    got = normalize(img)
    expect = ((255 - img.astype(np.float64)) / 255.0).astype(np.float32)
    assert got.dtype == np.float32
    assert np.array_equal(got, expect)
    # ink (0) → 1.0, paper (255) → 0.0
    assert normalize(np.zeros((2, 2), np.uint8)).max() == 1.0
    assert normalize(np.full((2, 2), 255, np.uint8)).min() == 0.0


def test_image_features_grid_means():
    img = normalize(_rand_img(17, 19, 5))
    f = multimodal.image_features(img, grid=4)
    assert f.shape == (16,)
    # block [0,0] covers rows [0, 17//4*? ) via linspace partition
    rows = np.linspace(0, 17, 5, dtype=np.int64)
    cols = np.linspace(0, 19, 5, dtype=np.int64)
    assert f[0] == pytest.approx(img[rows[0]:rows[1], cols[0]:cols[1]].mean())
    assert f[15] == pytest.approx(img[rows[3]:rows[4], cols[3]:cols[4]].mean())


def test_synth_media_images_are_real_pngs(spark):
    media = multimodal.synth_media(spark, n=30, seed=42)
    rows = media.filter("kind = 'image'").collect()
    assert rows
    for r in rows:
        img = decode_png(bytes(r["payload"]))
        expect = multimodal.synth_image_array(r["media_id"])
        assert np.array_equal(img, expect)
        assert (r["height"], r["width"]) == img.shape


def test_extract_image_stats_vs_numpy(spark):
    media = multimodal.synth_media(spark, n=60, seed=42)
    got = {
        r["media_id"]: r
        for r in multimodal.extract_image_stats(media).collect()
    }
    img_ids = [r["media_id"] for r in media.filter("kind='image'").collect()]
    assert sorted(got) == sorted(img_ids)
    for mid in img_ids:
        img = multimodal.synth_image_array(mid).astype(np.int64)
        h, w = img.shape
        s = int((255 - img).sum())
        r = got[mid]
        assert (r["width"], r["height"], r["n_px"]) == (w, h, h * w)
        assert r["sum_inv"] == s
        assert r["mean_inv_bp"] == (10000 * s) // (255 * h * w)


def test_extract_features_real_path(spark):
    media = multimodal.synth_media(spark, n=30, seed=42).filter(
        "kind = 'image'"
    )
    feats = multimodal.extract_features(media, fake=False).collect()
    assert feats and all(r["decode_ok"] for r in feats)
    assert all(len(r["feat"]) == multimodal.FEATURE_DIM for r in feats)
    # featurize(decode(payload)) equals the local pipeline on the same id
    one = feats[0]
    local = multimodal.image_features(
        normalize(multimodal.synth_image_array(one["media_id"]))
    )
    assert np.allclose(one["feat"], local, atol=1e-6)


def test_extract_features_real_path_bad_rows(spark):
    # corrupt payloads flow through as decode_ok=False, not a stage failure
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "media_id": [0, 1],
            "kind": ["image", "image"],
            "payload": [
                bytearray(encode_png(_rand_img(8, 8, 0))),
                bytearray(b"corrupt bytes"),
            ],
            "width": [8, 8],
            "height": [8, 8],
            "duration_ms": [None, None],
        }
    )
    media = spark.createDataFrame(pdf, schema=multimodal.MEDIA_SCHEMA)
    rows = {r["media_id"]: r for r in
            multimodal.extract_features(media, fake=False).collect()}
    assert rows[0]["decode_ok"] and not rows[1]["decode_ok"]
    assert rows[1]["feat"] is None


# ------------------------------------------------------------ fuzzing
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st_

    @settings(max_examples=60, deadline=None)
    @given(
        h=st_.integers(min_value=1, max_value=40),
        w=st_.integers(min_value=1, max_value=40),
        seed=st_.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_fuzz_roundtrip_grey(h, w, seed):
        img = _rand_img(h, w, seed)
        assert np.array_equal(decode_png(encode_png(img)), img)

    @settings(max_examples=40, deadline=None)
    @given(
        h=st_.integers(min_value=1, max_value=24),
        w=st_.integers(min_value=1, max_value=24),
        seed=st_.integers(min_value=0, max_value=2**31 - 1),
        filters=st_.lists(
            st_.integers(min_value=0, max_value=4), min_size=1, max_size=5
        ),
    )
    def test_fuzz_spec_filters(h, w, seed, filters):
        """Decode must invert ANY spec-legal forward filtering, grey and
        RGB, at every size down to 1×1."""
        grey = _rand_img(h, w, seed)
        assert np.array_equal(decode_png(_build_png(grey, filters)), grey)
        rgb = _rand_img(h, w, seed + 1, channels=3)
        assert np.array_equal(decode_png(_build_png(rgb, filters)), rgb)

except ImportError:  # pragma: no cover - hypothesis is in the image
    pass
