"""Audio/video multimodal lanes (operators/media.py): real WAV + PNGV
decode through Spark, stub error-lane for foreign codecs."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ksj2gp_spark.operators import media


def _sine(freq, rate, secs, amp=0.5):
    t = np.arange(int(rate * secs)) / rate
    return amp * np.sin(2 * np.pi * freq * t)


def test_wav_roundtrip_kernel():
    s = _sine(440, 16000, 0.25)
    back, rate = media._decode_audio_bytes(media.encode_wav(s, 16000), "wav")
    assert rate == 16000
    assert len(back) == len(s)
    assert np.allclose(back, s, atol=1 / 32000)


def test_audio_features_spark(spark):
    rows = []
    for i, amp in enumerate((0.1, 0.5, 0.9)):
        s = _sine(220 * (i + 1), 8000, 0.5, amp)
        rows.append((f"a{i}", media.encode_wav(s, 8000), "wav", 500))
    rows.append(("bad", b"\x00" * 64, "mp3", 1000))  # stubbed codec
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "bytes", "fmt", "duration_ms"])
    )
    out = media.audio_features(df).toPandas().set_index("media_id")
    for i, amp in enumerate((0.1, 0.5, 0.9)):
        r = out.loc[f"a{i}"]
        assert r["decode_error"] is None
        assert r["duration_ok"]
        # sine RMS = amp/sqrt(2)
        assert abs(r["rms"] - amp / np.sqrt(2)) < 0.01
        assert abs(r["peak"] - amp) < 0.01
    assert out.loc["bad", "decode_error"].startswith("NotImplementedError")


def test_frame_sampling_spark(spark):
    rng = np.random.default_rng(5)
    vids = []
    for v in range(2):
        frames = [
            np.full((8, 12), 10 * (f + 1) + v, dtype=np.uint8)
            for f in range(13)
        ]
        vids.append((f"v{v}", media.encode_pngv(frames, fps=10), "pngv"))
    vids.append(("h264vid", rng.bytes(100), "mp4"))
    df = spark.createDataFrame(
        pd.DataFrame(vids, columns=["media_id", "bytes", "fmt"])
    )
    out = media.sample_frames(df, every_k=5).toPandas()
    good = out[out["decode_error"].isnull()]
    # frames 0, 5, 10 sampled per video
    assert sorted(good[good["media_id"] == "v0"]["frame_idx"]) == [0, 5, 10]
    r = good[(good["media_id"] == "v1") & (good["frame_idx"] == 5)].iloc[0]
    assert (r["h"], r["w"]) == (8, 12)
    assert r["mean_luma"] == 61.0  # 10*(5+1)+1
    bad = out[out["media_id"] == "h264vid"]
    assert bad["decode_error"].iloc[0].startswith("NotImplementedError")


def test_media_join_composability(spark):
    """Frame features join back to a caption table — the multimodal
    columns flow through ordinary relational ops."""
    frames = [np.zeros((4, 4), dtype=np.uint8) for _ in range(6)]
    df = spark.createDataFrame(
        pd.DataFrame(
            [("v0", media.encode_pngv(frames), "pngv", "a video")],
            columns=["media_id", "bytes", "fmt", "caption"],
        )
    )
    out = media.sample_frames(df, every_k=2).join(
        df.select("media_id", "caption"), "media_id"
    )
    got = out.agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"]
    assert got == 3  # frames 0, 2, 4


def test_extract_patches_exact_sums_and_quarantine(spark):
    """Patch sums over lossless PNG equal the fixture's pixel formula;
    undecodable rows and sub-patch images are skipped."""
    import numpy as np
    import pandas as pd

    from ksj2gp_spark.formats import imagecodec
    from ksj2gp_spark.operators.images import extract_patches

    rows = []
    for i in (1, 2, 4):
        h, w = 8 + i % 9, 8 + (i * 3) % 9
        arr = imagecodec.make_test_image(i, h, w)
        rows.append((f"img{i}", imagecodec.encode_image(arr, "png"), "png"))
    rows.append(("bad", b"garbage", "png"))
    # 3x3 image: smaller than one 4x4 patch -> no rows
    tiny = imagecodec.make_test_image(9, 3, 3)
    rows.append(("tiny", imagecodec.encode_image(tiny, "png"), "png"))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"])
    )
    got = extract_patches(df, patch=4).toPandas()
    assert set(got["image_id"]) == {"img1", "img2", "img4"}
    for i in (1, 2, 4):
        h, w = 8 + i % 9, 8 + (i * 3) % 9
        arr = imagecodec.make_test_image(i, h, w).astype(np.int64)
        nh, nw = h // 4, w // 4
        want = (
            arr[: nh * 4, : nw * 4]
            .reshape(nh, 4, nw, 4, 3)
            .sum(axis=(1, 3))
        )
        sub = got[got["image_id"] == f"img{i}"]
        assert len(sub) == nh * nw
        for _, r in sub.iterrows():
            assert (
                want[r["py"], r["px"]]
                == np.array([r["sum_r"], r["sum_g"], r["sum_b"]])
            ).all()
