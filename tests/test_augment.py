"""D1–D8 augmentation family: warp/morph primitive correctness against
naive recomputation, per-row seeded determinism, partitioning
invariance, and the end-to-end Spark stage.

Reference: /root/reference/Modules/DataAugmentation.py:11-182 and
utils.py:742-761 (semantics; divergences documented in augment.py)."""

from __future__ import annotations

import numpy as np
import pytest

from htrtf_spark.operators import augment, multimodal
from htrtf_spark.operators.png_io import decode_png


def _img(h, w, seed):
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w), dtype=np.uint8
    ).astype(np.uint8)


def test_affine_identity_and_translate():
    img = _img(12, 17, 0)
    ident = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    assert np.array_equal(augment.affine_warp(img, ident, "nearest"), img)
    assert np.array_equal(augment.affine_warp(img, ident, "bilinear"), img)
    # integer translate (+3, +2) == shift with zero fill
    m = np.array([[1.0, 0.0, 3.0], [0.0, 1.0, 2.0]])
    got = augment.affine_warp(img, m, "nearest")
    expect = np.zeros_like(img)
    expect[2:, 3:] = img[:-2, :-3]
    assert np.array_equal(got, expect)
    # bilinear at integer offsets is also exact
    assert np.array_equal(augment.affine_warp(img, m, "bilinear"), expect)


def test_affine_rot90_matches_numpy():
    img = _img(11, 11, 1)
    c, s = 0.0, 1.0
    # rotate about the PIXEL-GRID center (n-1)/2 so the lattice maps to
    # itself exactly (cv2's n/2 center shifts by half a pixel)
    cx = cy = (11 - 1) / 2.0
    m = np.array(
        [[c, s, (1 - c) * cx - s * cy], [-s, c, s * cx + (1 - c) * cy]]
    )
    got = augment.affine_warp(img, m, "nearest")
    assert np.array_equal(got, np.rot90(img, 1))


def test_morph_max_min_naive():
    img = _img(9, 13, 2)
    support = np.ones((3, 3), dtype=bool)
    dil = augment._morph(img, support, "max")
    ero = augment._morph(img, support, "min")
    h, w = img.shape
    for r in range(h):
        for c in range(w):
            rs = slice(max(r - 1, 0), min(r + 2, h))
            cs = slice(max(c - 1, 0), min(c + 2, w))
            assert dil[r, c] == img[rs, cs].max()
            assert ero[r, c] == img[rs, cs].min()
    # partial support: only the center → identity
    only_center = np.zeros((3, 3), dtype=bool)
    only_center[1, 1] = True
    assert np.array_equal(augment._morph(img, only_center, "max"), img)


def test_scale_preserves_shape_and_identity_factor():
    img = _img(20, 30, 3)
    rs = np.random.RandomState(0)
    for _ in range(10):
        out = augment.scale(img, rs, prob=1.0)
        assert out.shape == img.shape
    # factor 1.0 (resize to same dims) is the identity
    assert np.array_equal(augment._resize(img, 20, 30), img)


def test_crop_or_pad_axis():
    img = _img(10, 10, 4)
    grown = augment._crop_or_pad_axis(img, 14, 0)
    assert grown.shape == (14, 10) and grown[:2].sum() == 0
    cropped = augment._crop_or_pad_axis(img, 6, 1)
    assert cropped.shape == (10, 6)
    assert np.array_equal(cropped, img[:, 2:8])


def test_distort_deterministic_per_seed():
    img = _img(24, 32, 5)
    a = augment.distort(img.copy(), augment._row_rng(7, 3))
    b = augment.distort(img.copy(), augment._row_rng(7, 3))
    assert np.array_equal(a, b)
    c = augment.distort(img.copy(), augment._row_rng(7, 4))
    assert not np.array_equal(a, c)  # different row → different draws


def test_prob_zero_is_identity():
    img = _img(16, 16, 6)
    rs = augment._row_rng(0, 0)
    assert np.array_equal(augment.distort(img, rs, prob=0.0), img)


def test_pack_images():
    a, b = _img(4, 6, 7), _img(6, 3, 8)
    packed = augment.pack_images([a, b], 8, 8)
    assert packed.shape == (2, 8, 8)
    assert np.array_equal(packed[0, :4, :6], a)
    assert packed[0, 4:, :].sum() == 0 and packed[0, :, 6:].sum() == 0
    assert np.array_equal(packed[1, :6, :3], b)
    with pytest.raises(ValueError, match="larger than pack"):
        augment.pack_images([_img(10, 4, 9)], 8, 8)


def test_augment_stage_deterministic_and_partition_invariant(spark):
    media = multimodal.synth_media(spark, n=45, seed=42)
    cols = ["media_id", "ink_out"]
    a = {
        r["media_id"]: r["ink_out"]
        for r in augment.augment_images(media, seed=3).select(*cols).collect()
    }
    b = {
        r["media_id"]: r["ink_out"]
        for r in augment.augment_images(media.repartition(7), seed=3)
        .select(*cols)
        .collect()
    }
    assert a == b and len(a) == 15  # every image row, any partitioning
    c = {
        r["media_id"]: r["ink_out"]
        for r in augment.augment_images(media, seed=4).select(*cols).collect()
    }
    assert a != c  # a different seed actually changes the draws


def test_augment_payload_roundtrip(spark):
    media = multimodal.synth_media(spark, n=9, seed=42)
    rows = augment.augment_images(media, seed=3, pack_h=48, pack_w=48).collect()
    for r in rows:
        img = decode_png(bytes(r["payload"]))
        assert img.shape == (48, 48)
        assert int(img.astype(np.int64).sum()) == r["ink_out"]


def test_deterministic_augment_vs_numpy(spark):
    media = multimodal.synth_media(spark, n=30, seed=42)
    got = {
        r["media_id"]: r
        for r in augment.deterministic_augment(media, ty=2, tx=3).collect()
    }
    for mid, r in got.items():
        inv = 255 - multimodal.synth_image_array(mid).astype(np.int64)
        shifted = np.zeros_like(inv)
        shifted[2:, 3:] = inv[:-2, :-3]
        assert r["ink_shifted"] == int(shifted.sum())
        dil = augment._morph(
            shifted.astype(np.uint8), np.ones((3, 3), dtype=bool), "max"
        )
        assert r["ink_dilated"] == int(dil.astype(np.int64).sum())
