"""Conv feature stack (T1/T2/T17/T18) + external-params source (S7):
vectorized ops vs naive recomputation, shape validation, broadcast
stage end-to-end.

Reference: layers.py:215-248 (CNN), :282-289 (max_pool),
:298-313 (layer norm), tasks.py:72-76 (mask),
utils.py:392-440,718-740 (param loading)."""

from __future__ import annotations

import numpy as np
import pytest

from htrtf_spark.operators import convnet, multimodal
from htrtf_spark.operators.png_io import normalize


def _naive_conv(x, w, b):
    h, wd, cin = x.shape
    cout = w.shape[3]
    out = np.zeros((h, wd, cout))
    for r in range(h):
        for c in range(wd):
            acc = b.astype(np.float64).copy()
            for dy in range(3):
                for dx in range(3):
                    rr, cc = r + dy - 1, c + dx - 1
                    if 0 <= rr < h and 0 <= cc < wd:
                        acc += x[rr, cc].astype(np.float64) @ w[dy, dx]
            out[r, c] = acc
    return out


def test_conv2d_same_vs_naive():
    rs = np.random.RandomState(0)
    x = rs.rand(7, 9, 3)
    w = rs.normal(0, 1, size=(3, 3, 3, 4))
    b = rs.normal(0, 1, size=4)
    assert np.allclose(convnet.conv2d_same(x, w, b), _naive_conv(x, w, b))


def test_max_pool_2x2_same_vs_naive():
    rs = np.random.RandomState(1)
    for h, w in [(6, 8), (7, 9), (1, 5)]:
        x = rs.rand(h, w, 2)
        got = convnet.max_pool_2x2_same(x)
        ho, wo = -(-h // 2), -(-w // 2)
        assert got.shape == (ho, wo, 2)
        for r in range(ho):
            for c in range(wo):
                block = x[2 * r : 2 * r + 2, 2 * c : 2 * c + 2]
                assert np.allclose(got[r, c], block.reshape(-1, 2).max(axis=0))


def test_layer_norm_and_mask():
    rs = np.random.RandomState(2)
    x = rs.rand(4, 5, 8) * 10 + 3
    y = convnet.layer_norm(x)
    assert np.allclose(y.mean(axis=-1), 0, atol=1e-6)
    assert np.allclose(y.std(axis=-1), 1, atol=1e-3)
    m = convnet.valid_mask(3, 4, 5, 6)
    assert m.sum() == 12 and m[:3, :4].all() and m[3:].sum() == 0


def test_out_dims_ceil_tracking():
    # three pooled layers → ceil(dim/8); matches layers.py:285 arithmetic
    assert convnet.out_dims(16, 16) == (2, 2)
    assert convnet.out_dims(17, 23) == (3, 3)
    assert convnet.out_dims(1, 1) == (1, 1)


def test_params_roundtrip_and_validation(spark, tmp_path):
    params = convnet.synth_params(seed=5)
    pdir = str(tmp_path / "params")
    convnet.write_params(spark, params, pdir)
    loaded = convnet.load_params(spark, pdir)
    assert sorted(loaded) == sorted(params)
    for k in params:
        assert np.allclose(loaded[k], params[k], atol=1e-7)
        assert loaded[k].shape == params[k].shape
    convnet.validate_params(loaded)

    # shape drift aborts at load
    bad = dict(params)
    bad["conv1/kernel"] = bad["conv1/kernel"][:, :, :, :8]
    with pytest.raises(ValueError, match="conv1/kernel"):
        convnet.validate_params(bad)
    del bad["conv1/kernel"]
    with pytest.raises(ValueError, match="missing params"):
        convnet.validate_params(bad)


def test_featurize_conv_end_to_end(spark, tmp_path):
    params = convnet.synth_params(seed=5)
    pdir = str(tmp_path / "p2")
    convnet.write_params(spark, params, pdir)
    media = multimodal.synth_media(spark, n=15, seed=42)
    rows = {r["media_id"]: r for r in
            convnet.featurize_conv(media, pdir).collect()}
    img_ids = [r["media_id"] for r in media.filter("kind='image'").collect()]
    assert sorted(rows) == sorted(img_ids)
    for mid in img_ids:
        arr = multimodal.synth_image_array(mid)
        img = normalize(arr)
        fmap, oh, ow = convnet.conv_stack(img, params)
        r = rows[mid]
        assert (r["out_h"], r["out_w"]) == (oh, ow)
        assert r["seq_len_out"] == convnet.out_dims(*img.shape)[1]
        assert np.allclose(
            r["feat"], fmap.mean(axis=(0, 1)), atol=1e-5
        )
        # integer box-conv probe: cover-weighted closed-form sum
        inv = (255 - arr.astype(np.int64))
        h, w = inv.shape
        cr = np.full(h, 3); cr[[0, -1]] = 2
        cc = np.full(w, 3); cc[[0, -1]] = 2
        assert r["box_sum"] == int((inv * np.outer(cr, cc)).sum())


def test_featurize_conv_rgb_payload(spark, tmp_path):
    """Truecolor PNGs (decode_png returns [H,W,3]) must flow through the
    conv featurizer via the shared grey fold — not crash the stage."""
    import struct
    import zlib as _z

    from htrtf_spark.operators.png_io import _chunk, _SIG, to_gray

    rs = np.random.RandomState(9)
    img = rs.randint(0, 256, size=(10, 12, 3), dtype=np.uint8)
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(10))
    ihdr = struct.pack(">IIBBBBB", 12, 10, 8, 2, 0, 0, 0)
    png = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", _z.compress(raw)) + _chunk(b"IEND", b"")

    import pandas as pd

    pdf = pd.DataFrame(
        {
            "media_id": [0],
            "kind": ["image"],
            "payload": [bytearray(png)],
            "width": [12],
            "height": [10],
            "duration_ms": [None],
        }
    )
    media = spark.createDataFrame(pdf, schema=multimodal.MEDIA_SCHEMA)
    params = convnet.synth_params(seed=5)
    pdir = str(tmp_path / "rgbp")
    convnet.write_params(spark, params, pdir)
    rows = convnet.featurize_conv(media, pdir).collect()
    assert len(rows) == 1
    grey = to_gray(img)
    h, w = grey.shape
    cr = np.full(h, 3); cr[[0, -1]] = 2
    cc = np.full(w, 3); cc[[0, -1]] = 2
    inv = 255 - grey
    assert rows[0]["box_sum"] == int((inv * np.outer(cr, cc)).sum())


# ------------------------------------------------- S7 AACHEN layout map


def test_aachen_mapping_roundtrip(spark, tmp_path):
    """load_aachen_params == the reference's load_AACHEN_PARAMS layout
    rules (utils.py:392-559) applied to a parquet named-tensor table:
    conv kernels transposed (n_out,n_in,fh,fw)→(fh,fw,n_in,n_out), each
    MDLSTM direction's W/U/V stacked on axis 0, dense head unchanged.
    Asymmetric shapes make any axis mix-up a hard failure."""
    import numpy as np

    from htrtf_spark.operators import aachen
    from htrtf_spark.operators.convnet import write_params

    ext = aachen.synth_aachen_params(seed=7)
    path = str(tmp_path / "aachen_params")
    write_params(spark, ext, path)
    got = aachen.load_aachen_params(spark, path)

    # conv: value-exact transpose
    w0 = ext["conv0/W_conv0"]
    assert got["conv1/kernel"].shape == (3, 5, 1, 4)
    assert np.array_equal(got["conv1/kernel"], w0.transpose([2, 3, 1, 0]))
    assert np.array_equal(got["conv1/bias"], ext["conv0/b_conv0"])

    # mdlstm: stacked [x; h; v] kernel, external dir 3 == down-backward
    k = got["mdlstm1/db_kernel"]
    assert k.shape == (3 + 2 * 2, 5 * 2)
    assert np.array_equal(k[:3], ext["mdlstm0/W3_mdlstm0"])
    assert np.array_equal(k[3:5], ext["mdlstm0/U3_mdlstm0"])
    assert np.array_equal(k[5:7], ext["mdlstm0/V3_mdlstm0"])
    assert np.array_equal(got["mdlstm1/db_bias"], ext["mdlstm0/b3_mdlstm0"])

    # dense head passes through
    assert np.array_equal(got["dense/kernel"], ext["output/W_in_mdlstm4_output"])
    assert np.array_equal(got["dense/bias"], ext["output/b_output"])

    # the mapped dict drives the real operators end to end
    from htrtf_spark.operators.mdlstm import mdlstm_4dir

    img = np.random.RandomState(0).normal(0, 1, size=(4, 6, 3)).astype(
        np.float32
    )
    out = mdlstm_4dir(img, got, layer=1)
    assert out.shape == (4, 6, 2) and np.isfinite(out).all()


def test_aachen_mapping_rejects_mismatched_gates():
    import numpy as np

    from htrtf_spark.operators import aachen

    ext = aachen.synth_aachen_params(seed=1, mdlstm_layers=1, conv_layers=0)
    ext["mdlstm0/U2_mdlstm0"] = np.zeros((2, 11), dtype=np.float32)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="gate widths"):
        aachen.map_aachen_params(ext)


def test_seed_params_scoped_transfer(spark, tmp_path):
    """TL analog (SURVEY §3.4 / Structure_006_TL.py:173-178): tensors
    matching the scope globs are copied value-exact from the prior run;
    everything else keeps its fresh init; shape mismatches raise."""
    import numpy as np
    import pytest

    from htrtf_spark.operators.convnet import (
        seed_params,
        seed_params_from,
        write_params,
    )
    from htrtf_spark.operators.rnn import synth_net_params

    prior = synth_net_params(seed=1)
    init = synth_net_params(seed=2)
    scopes = ["conv*", "bilstm[123]/*"]
    params, report = seed_params(prior, init, scopes)

    assert set(params) == set(init)
    for name in params:
        if name.startswith("conv") or any(
            name.startswith(f"bilstm{i}/") for i in (1, 2, 3)
        ):
            assert np.array_equal(params[name], prior[name]), name
            assert name in report["copied"]
        else:
            assert np.array_equal(params[name], init[name]), name
            assert name in report["fresh"]
    assert any(n.startswith("bilstm4/") for n in report["fresh"])
    assert any(n.startswith("logits/") for n in report["fresh"])

    # round-trip through the parquet named-tensor table
    path = str(tmp_path / "prior_params")
    write_params(spark, prior, path)
    params2, report2 = seed_params_from(spark, path, init, scopes)
    assert report2["copied"] == report["copied"]
    for name in report["copied"]:
        assert np.allclose(params2[name], prior[name])

    # a scoped tensor with a different shape is a config error
    bad = dict(init)
    bad["conv1/kernel"] = np.zeros((1, 1, 1, 1), dtype=np.float32)
    with pytest.raises(ValueError, match="conv1/kernel"):
        seed_params(prior, bad, ["conv*"])

    # prior-only scoped tensors are ignored, not injected
    prior2 = dict(prior)
    prior2["conv9/kernel"] = np.zeros((3, 3, 1, 1), dtype=np.float32)
    params3, report3 = seed_params(prior2, init, ["conv*"])
    assert "conv9/kernel" not in params3
    assert "conv9/kernel" in report3["ignored_prior"]
