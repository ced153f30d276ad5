"""BiLSTM decode head + CTC loss (T3–T6): cell math vs a scalar
reimplementation, CTC loss vs brute-force path enumeration, and the
distributed full-net decode stage vs a local recompute.

Reference: layers.py:6-107 (BasicLSTMCell fw/bw), Structure_006.py:82-85
(reshape), :117-123 (dense), :130-134 (ctc loss)."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest

from htrtf_spark.operators import convnet, multimodal, rnn


def _scalar_lstm(x, kernel, bias):
    """Independent scalar-loop BasicLSTMCell (forget_bias=1)."""
    t_len, d = x.shape
    hid = kernel.shape[1] // 4
    h = [0.0] * hid
    c = [0.0] * hid
    out = np.zeros((t_len, hid))
    for t in range(t_len):
        inp = list(x[t]) + h
        g = [
            sum(inp[k] * kernel[k][j] for k in range(d + hid)) + bias[j]
            for j in range(4 * hid)
        ]
        nh, nc = [0.0] * hid, [0.0] * hid
        for u in range(hid):
            i, j = g[u], g[hid + u]
            f, o = g[2 * hid + u], g[3 * hid + u]
            sig = lambda v: 1.0 / (1.0 + math.exp(-v))
            nc[u] = c[u] * sig(f + 1.0) + sig(i) * math.tanh(j)
            nh[u] = math.tanh(nc[u]) * sig(o)
        h, c = nh, nc
        out[t] = h
    return out


def test_lstm_forward_vs_scalar():
    rs = np.random.RandomState(0)
    x = rs.normal(0, 1, size=(4, 3))
    kernel = rs.normal(0, 0.5, size=(3 + 2, 8))
    bias = rs.normal(0, 0.1, size=8)
    got = rnn.lstm_forward(x, kernel, bias)
    assert np.allclose(got, _scalar_lstm(x, kernel, bias), atol=1e-10)


def test_bilstm_backward_is_reversed_forward():
    rs = np.random.RandomState(1)
    x = rs.normal(0, 1, size=(5, 4))
    params = {
        "bilstm1/fw_kernel": rs.normal(0, 0.3, size=(4 + 3, 12)).astype(np.float32),
        "bilstm1/fw_bias": np.zeros(12, dtype=np.float32),
        "bilstm1/bw_kernel": rs.normal(0, 0.3, size=(4 + 3, 12)).astype(np.float32),
        "bilstm1/bw_bias": np.zeros(12, dtype=np.float32),
    }
    out = rnn.bilstm(x, params, 1)
    assert out.shape == (5, 6)
    fw = rnn.lstm_forward(x, params["bilstm1/fw_kernel"], params["bilstm1/fw_bias"])
    bw = rnn.lstm_forward(x[::-1], params["bilstm1/bw_kernel"], params["bilstm1/bw_bias"])
    assert np.allclose(out[:, :3], fw)
    assert np.allclose(out[:, 3:], bw[::-1])


def test_height_collapse():
    fmap = np.arange(2 * 3 * 4).reshape(2, 3, 4).astype(float)
    x = rnn.height_collapse(fmap)
    assert x.shape == (3, 8)
    for t in range(3):
        expect = np.concatenate([fmap[0, t], fmap[1, t]])  # height-major
        assert np.array_equal(x[t], expect)


def _brute_ctc(log_probs, targets, blank):
    t_len, n_c = log_probs.shape
    total = -np.inf
    for path in itertools.product(range(n_c), repeat=t_len):
        # collapse: merge repeats, then drop blanks
        merged = [k for idx, k in enumerate(path) if idx == 0 or k != path[idx - 1]]
        lab = [k for k in merged if k != blank]
        if lab == list(targets):
            lp = sum(log_probs[t, k] for t, k in enumerate(path))
            total = np.logaddexp(total, lp)
    return -total


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_loss_vs_brute_force(seed):
    rs = np.random.RandomState(seed)
    t_len, n_c = 4, 3  # 81 paths — exhaustive
    logits = rs.normal(0, 2, size=(t_len, n_c))
    lp = rnn.log_softmax(logits)
    blank = n_c - 1
    for targets in ([0], [0, 1], [1, 1], [0, 1, 0]):
        got = rnn.ctc_loss(lp, np.array(targets), blank)
        want = _brute_ctc(lp, targets, blank)
        assert got == pytest.approx(want, abs=1e-9), targets


def test_ctc_loss_edge_cases():
    lp = rnn.log_softmax(np.zeros((3, 2)))
    blank = 1
    # empty target: P = P(all blanks) = (1/2)^3
    assert rnn.ctc_loss(lp, np.array([], dtype=np.int64), blank) == pytest.approx(
        -3 * math.log(0.5)
    )
    # impossible: repeated label needs a separating blank, T too short
    assert rnn.ctc_loss(lp, np.array([0, 0, 0]), blank) == math.inf


def test_net_logits_shapes_and_determinism():
    params = rnn.synth_net_params(seed=3, num_hidden=8, num_classes=10,
                                  image_height=24)
    img = np.random.RandomState(4).rand(24, 19).astype(np.float32)
    a = rnn.net_logits(img, params)
    b = rnn.net_logits(img, params)
    assert a.shape == (convnet.out_dims(24, 19)[1], 10)
    assert np.array_equal(a, b)


def test_net_decode_stage_vs_local(spark, tmp_path):
    from htrtf_spark.operators.augment import _crop_or_pad_axis
    from htrtf_spark.operators.png_io import normalize

    charset = list("abcdefghijklmnopqrstuvwxyz ")
    params = rnn.synth_net_params(
        seed=5, num_hidden=8, num_classes=len(charset) + 1, image_height=40
    )
    pdir = str(tmp_path / "netp")
    convnet.write_params(spark, params, pdir)
    media = multimodal.synth_media(spark, n=12, seed=42)
    rows = {r["media_id"]: r for r in
            rnn.net_decode(media, pdir, charset, image_height=40).collect()}
    img_ids = [r["media_id"] for r in media.filter("kind='image'").collect()]
    assert sorted(rows) == sorted(img_ids)
    blank = len(charset)
    for mid in img_ids:
        arr = multimodal.synth_image_array(mid)
        img = _crop_or_pad_axis(normalize(arr), 40, 0)
        logits = rnn.net_logits(img, params)
        ids = logits.argmax(axis=1)
        keep = np.concatenate([[True], ids[1:] != ids[:-1]])
        seq = ids[keep]
        seq = seq[seq != blank]
        r = rows[mid]
        assert r["decoded"] == "".join(charset[i] for i in seq)
        assert r["t_frames"] == logits.shape[0]
        assert r["logit_sum_bp"] == int(round(float(logits.sum()) * 1e4))


def test_ctc_loss_zero_frames():
    lp = np.zeros((0, 3))
    assert rnn.ctc_loss(lp, np.array([], dtype=np.int64), 2) == 0.0
    assert rnn.ctc_loss(lp, np.array([0]), 2) == math.inf


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st_

    @settings(max_examples=40, deadline=None)
    @given(
        t_len=st_.integers(min_value=1, max_value=5),
        n_c=st_.integers(min_value=2, max_value=3),
        seed=st_.integers(min_value=0, max_value=2**31 - 1),
        tgt_len=st_.integers(min_value=0, max_value=3),
    )
    def test_fuzz_ctc_loss_vs_brute_force(t_len, n_c, seed, tgt_len):
        rs = np.random.RandomState(seed)
        lp = rnn.log_softmax(rs.normal(0, 2, size=(t_len, n_c)))
        blank = n_c - 1
        targets = rs.randint(0, n_c - 1, size=tgt_len)
        got = rnn.ctc_loss(lp, targets, blank)
        want = _brute_ctc(lp, list(targets), blank)
        if want == np.inf or got == np.inf:
            assert got == want
        else:
            assert got == pytest.approx(want, abs=1e-9)

except ImportError:  # pragma: no cover
    pass
