"""MDLSTM family (T10–T16): wavefront sweep vs an independent
raster-order scalar recursion, skew/unskew, 4-direction sweep, width
chunking, eval-mode dropout.

Reference: MDLSTM.py:224-314 (cell), :493-578 (skew), layers.py:327-377
(directions/dropout), :345-369 (chunking)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from htrtf_spark.operators import mdlstm


def _sig(v):
    return 1.0 / (1.0 + math.exp(-v))


def _raster_mdlstm(img, kernel, bias):
    """Direct per-pixel recursion in raster order — the cell's natural
    definition, independent of the skew/wavefront machinery."""
    h, w, cin = img.shape
    units = kernel.shape[1] // 5
    hs = np.zeros((h, w, units))
    cs = np.zeros((h, w, units))
    for r in range(h):
        for c in range(w):
            h_left = hs[r, c - 1] if c > 0 else np.zeros(units)
            h_top = hs[r - 1, c] if r > 0 else np.zeros(units)
            c_left = cs[r, c - 1] if c > 0 else np.zeros(units)
            c_top = cs[r - 1, c] if r > 0 else np.zeros(units)
            x = np.concatenate([img[r, c], h_left, h_top])
            g = x @ kernel + bias
            for u in range(units):
                i = g[u]
                f = g[units + u]
                lam = g[2 * units + u]
                o = g[3 * units + u]
                j = g[4 * units + u]
                cc = (c_top[u] * _sig(lam) + c_left[u] * (1 - _sig(lam))) * _sig(
                    f
                ) + _sig(i) * math.tanh(j)
                cs[r, c, u] = cc
                hs[r, c, u] = math.tanh(cc) * _sig(o)
    return hs


def test_skew_unskew_roundtrip():
    rs = np.random.RandomState(0)
    img = rs.rand(5, 7, 2)
    sk = mdlstm.skew(img)
    assert sk.shape == (11, 7, 2)
    # column w holds pixel (t-w, w)
    for col in range(7):
        assert np.array_equal(sk[col : col + 5, col], img[:, col])
        assert sk[:col, col].sum() == 0
    assert np.array_equal(mdlstm.unskew(sk, 5), img)


@pytest.mark.parametrize("h,w", [(1, 1), (3, 4), (4, 3), (5, 5)])
def test_mdlstm_sweep_vs_raster(h, w):
    rs = np.random.RandomState(1)
    cin, units = 2, 3
    img = rs.normal(0, 1, size=(h, w, cin))
    kernel = rs.normal(0, 0.4, size=(cin + 2 * units, 5 * units))
    bias = rs.normal(0, 0.1, size=5 * units)
    got = mdlstm.mdlstm_sweep(img, kernel, bias)
    assert np.allclose(got, _raster_mdlstm(img, kernel, bias), atol=1e-10)


def test_band_mask():
    # 3x4 image: step 0 → col 0 only; step 3 → cols 1..3; step 5 → col 3
    assert list(mdlstm._band_mask(0, 3, 4)) == [True, False, False, False]
    assert list(mdlstm._band_mask(3, 3, 4)) == [False, True, True, True]
    assert list(mdlstm._band_mask(5, 3, 4)) == [False, False, False, True]


def test_4dir_equals_flipped_sweeps():
    rs = np.random.RandomState(2)
    img = rs.normal(0, 1, size=(4, 6, 1))
    params = mdlstm.synth_mdlstm_params(seed=3, cin=1, units=4)
    out = mdlstm.mdlstm_4dir(img, params)
    acc = np.zeros((4, 6, 4))
    for d in mdlstm.DIRECTIONS:
        o = mdlstm.mdlstm_sweep(
            mdlstm._flip(img, d),
            params[f"mdlstm1/{d}_kernel"],
            params[f"mdlstm1/{d}_bias"],
        )
        acc += mdlstm._flip(o, d)
    assert np.allclose(out, acc)
    assert np.allclose(
        mdlstm.mdlstm_4dir(img, params, combine="tanh_sum"), np.tanh(acc)
    )


def test_width_chunked():
    rs = np.random.RandomState(4)
    img = rs.normal(0, 1, size=(3, 10, 2))
    kernel = rs.normal(0, 0.4, size=(2 + 2 * 3, 15))
    bias = np.zeros(15)
    fn = lambda x: mdlstm.mdlstm_sweep(x, kernel, bias)
    got = mdlstm.width_chunked(img, 4, fn)
    assert got.shape == (3, 10, 3)
    # chunks are INDEPENDENT sweeps (state resets at boundaries)
    a = fn(np.concatenate([img[:, 0:4]], axis=1))
    pad = np.zeros((3, 2, 2))
    c3 = fn(np.concatenate([img[:, 8:10], pad], axis=1))[:, :2]
    assert np.allclose(got[:, 0:4], a)
    assert np.allclose(got[:, 8:10], c3)
    # chunk >= W: identical to the plain sweep
    assert np.allclose(mdlstm.width_chunked(img, 16, fn), fn(
        np.concatenate([img, np.zeros((3, 6, 2))], axis=1))[:, :10])


def test_dropout_eval_identity_and_train_scaling():
    rs = np.random.RandomState(5)
    x = np.ones((50, 40))
    assert mdlstm.dropout(x, 0.5, None, training=False) is x
    y = mdlstm.dropout(x, 0.5, rs, training=True)
    assert set(np.unique(y)) <= {0.0, 2.0}  # inverted dropout scaling
    assert abs(y.mean() - 1.0) < 0.1
    with pytest.raises(ValueError):
        mdlstm.dropout(x, 0.5, None, training=True)


def test_mdlstm_features_stage_vs_local(spark):
    from htrtf_spark.operators import multimodal
    from htrtf_spark.operators.png_io import normalize

    media = multimodal.synth_media(spark, n=9, seed=42)
    params = mdlstm.synth_mdlstm_params(seed=11, cin=1, units=6)
    rows = {r["media_id"]: r for r in
            mdlstm.mdlstm_features(media, units=6, seed=11, chunk=16).collect()}
    img_ids = [r["media_id"] for r in media.filter("kind='image'").collect()]
    assert sorted(rows) == sorted(img_ids)
    for mid in img_ids:
        img = normalize(multimodal.synth_image_array(mid))[:, :, None]
        feats = mdlstm.width_chunked(
            img, 16, lambda x: mdlstm.mdlstm_4dir(x, params)
        )
        assert rows[mid]["act_sum_bp"] == int(round(float(feats.sum()) * 1e4))


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st_

    @settings(max_examples=30, deadline=None)
    @given(
        h=st_.integers(min_value=1, max_value=5),
        w=st_.integers(min_value=1, max_value=5),
        units=st_.integers(min_value=1, max_value=3),
        seed=st_.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_fuzz_wavefront_equals_raster(h, w, units, seed):
        rs = np.random.RandomState(seed)
        cin = 2
        img = rs.normal(0, 1, size=(h, w, cin))
        kernel = rs.normal(0, 0.4, size=(cin + 2 * units, 5 * units))
        bias = rs.normal(0, 0.1, size=5 * units)
        got = mdlstm.mdlstm_sweep(img, kernel, bias)
        assert np.allclose(got, _raster_mdlstm(img, kernel, bias), atol=1e-9)

except ImportError:  # pragma: no cover
    pass
