"""Supplementary benchmark: image/net/augment stage throughput at bench
scale (separate from bench.py, whose headline protocol stays stable
round-over-round).

    python tools/bench_media.py [n_media]

One JSON line: images/s per stage, best of 3 reps on local[32].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000

    from htrtf_spark.operators import augment, convnet, mdlstm, multimodal, rnn
    from htrtf_spark.session import get_spark

    spark = get_spark(app_name="bench_media", master="local[32]")
    media = multimodal.synth_media(spark, n=n, seed=42).cache()
    n_img = media.filter("kind='image'").count()
    n_video = media.filter("kind='video'").count()

    import tempfile

    pdir = os.path.join(tempfile.mkdtemp(prefix="bm_params_"), "p")
    convnet.write_params(spark, convnet.synth_params(seed=5), pdir)
    ndir = os.path.join(tempfile.mkdtemp(prefix="bm_netp_"), "p")
    charset = list("abcdefghijklmnopqrstuvwxyz ")
    convnet.write_params(
        spark,
        rnn.synth_net_params(seed=5, num_hidden=8,
                             num_classes=len(charset) + 1, image_height=40),
        ndir,
    )

    stages = {
        "png_decode_stats": lambda: multimodal.extract_image_stats(media),
        "augment_d1_d8": lambda: augment.augment_images(media, seed=7),
        "conv_featurize": lambda: convnet.featurize_conv(media, pdir),
        "net_decode_full": lambda: rnn.net_decode(media, ndir, charset,
                                                  image_height=40),
        "mdlstm_4dir": lambda: mdlstm.mdlstm_features(media, units=6,
                                                      chunk=16),
        "frame_sample": lambda: multimodal.sample_frames(media),
    }
    out = {}
    for name, mk in stages.items():
        mk().count()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            mk().count()
            best = min(best, time.monotonic() - t0)
        # sample_frames processes only the VIDEO rows (one third of the
        # table), not everything that isn't an image
        unit = n_img if name != "frame_sample" else n_video
        out[name] = {"wall_sec": round(best, 2),
                     "items_per_sec": int(unit / best)}

    print(json.dumps({"n_media": n, "n_images": n_img, "stages": out}))
    spark.stop()


if __name__ == "__main__":
    main()
