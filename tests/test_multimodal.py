"""Multimodal binary-column plumbing: schema, batch shape, stub boundary."""

from __future__ import annotations

import pandas as pd
import pytest

from feast_spark.functions.multimodal import (
    encode_fake_image,
    frame_sample,
    image_features,
    image_metadata,
)


@pytest.fixture(scope="module")
def images(spark):
    rows = [
        (i, encode_fake_image(64 * (i + 1), 48 * (i + 1), seed=i)) for i in range(6)
    ] + [(99, b"not an image")]
    pdf = pd.DataFrame(rows, columns=["img_id", "data"])
    return spark.createDataFrame(pdf, schema="img_id long, data binary")


def test_metadata_header_scan(images):
    meta = image_metadata(images, "data", "img_id").toPandas().sort_values("id")
    good = meta[meta.valid]
    assert len(good) == 6
    assert good[good.id == 2].width.iloc[0] == 192
    bad = meta[~meta.valid]
    assert bad.id.tolist() == [99] and bad.format.iloc[0] == "unknown"


def test_feature_extraction_fake_codec(images):
    feats = (
        image_features(images.filter("img_id < 99"), "data", "img_id", fake=True)
        .toPandas()
        .sort_values("id")
    )
    assert len(feats) == 6
    assert (feats.px_mean.between(0, 255)).all()
    # deterministic: same seed -> same stats
    again = image_features(
        images.filter("img_id = 3"), "data", "img_id", fake=True
    ).toPandas()
    assert again.px_mean.iloc[0] == feats[feats.id == 3].px_mean.iloc[0]


def test_real_codec_boundary_is_stubbed(images):
    with pytest.raises(Exception) as ei:
        image_features(images.filter("img_id = 0"), "data", "img_id", fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sampling_explodes(images):
    frames = frame_sample(
        images.filter("img_id < 99"), "data", "img_id", every_n=10, fake=True
    ).toPandas()
    assert set(frames.id) == set(range(6))
    assert (frames.frame_idx % 10 == 0).all()
    assert (frames.groupby("id").size() >= 1).all()


def test_image_resize_roundtrip(spark):
    import pandas as pd

    from feast_spark.functions.multimodal import (
        encode_fake_image,
        image_metadata,
        image_resize,
    )

    imgs = spark.createDataFrame(
        pd.DataFrame(
            {"img_id": [0, 1], "data": [encode_fake_image(64, 48, 7),
                                         encode_fake_image(128, 96, 9)]}
        ),
        schema="img_id long, data binary",
    )
    resized = image_resize(imgs, "data", "img_id", target_w=8, target_h=6, fake=True)
    meta = image_metadata(resized, "data", "id").toPandas()
    assert meta.width.tolist() == [8, 8]
    assert meta.height.tolist() == [6, 6]
    assert meta.valid.all()
    # codec boundary still honest without fake
    import pytest

    with pytest.raises(Exception):
        image_resize(imgs, "data", "img_id", 8, 6, fake=False).collect()


# ---------------------------------------------------------------------------
# audio surface
# ---------------------------------------------------------------------------


def _audio_df(spark, specs):
    # specs: list of (id, sample_rate, channels, n_samples) or (id, None)
    import pandas as pd

    from feast_spark.functions.multimodal import encode_fake_audio

    rows = []
    for spec in specs:
        if spec[1] is None:
            rows.append((spec[0], b"garbage-not-audio"))
        else:
            i, sr, ch, ns = spec
            rows.append((i, encode_fake_audio(sr, ch, ns, seed=i)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["clip_id", "data"])
    )


def test_audio_metadata_header_only(spark):
    from feast_spark.functions.multimodal import audio_metadata

    df = _audio_df(
        spark,
        [(0, 16000, 1, 16000 * 65), (1, 44100, 2, 44100), (2, None)],
    )
    got = {
        r["id"]: r for r in audio_metadata(df, "data", "clip_id").collect()
    }
    assert got[0]["sample_rate"] == 16000 and got[0]["duration_sec"] == 65.0
    assert got[1]["channels"] == 2 and got[1]["duration_sec"] == 1.0
    assert got[1]["format"] == "fsau"
    assert got[2]["valid"] is False and got[2]["format"] == "unknown"


def test_audio_chunks_windowing(spark):
    from feast_spark.functions.multimodal import audio_chunks

    df = _audio_df(
        spark,
        [
            (0, 16000, 1, 16000 * 65),  # 65s -> 3 chunks of (30, 30, 5)
            (1, 16000, 1, 16000 * 30),  # exactly one chunk
            (2, None),                   # invalid -> no chunks
        ],
    )
    out = audio_chunks(df, "data", "clip_id", chunk_seconds=30.0).toPandas()
    c0 = out[out.id == 0].sort_values("chunk_idx")
    assert c0.chunk_idx.tolist() == [0, 1, 2]
    assert c0.start_sec.tolist() == [0.0, 30.0, 60.0]
    assert c0.dur_sec.tolist() == [30.0, 30.0, 5.0]
    assert out[out.id == 1].dur_sec.tolist() == [30.0]
    assert (out.id == 2).sum() == 0


def test_audio_features_codec_boundary(spark):
    import pytest as _pytest

    from feast_spark.functions.multimodal import audio_features

    df = _audio_df(spark, [(0, 8000, 1, 8000)])
    got = audio_features(df, "data", "clip_id", fake=True).collect()[0]
    assert got["sample_rate"] == 8000 and got["rms"] > 0
    # without the fake codec, the declared NotImplementedError boundary
    with _pytest.raises(Exception):
        audio_features(df, "data", "clip_id", fake=False).collect()


# ---------------------------------------------------------------------------
# video surface
# ---------------------------------------------------------------------------


def _video_df(spark, specs):
    # specs: (id, width, height, fps, n_frames) or (id, None)
    import pandas as pd

    from feast_spark.functions.multimodal import encode_fake_video

    rows = []
    for spec in specs:
        if spec[1] is None:
            rows.append((spec[0], b"garbage-not-video"))
        else:
            i, w, h, fps, nf = spec
            rows.append((i, encode_fake_video(w, h, fps, nf, seed=i)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["clip_id", "data"])
    )


def test_video_metadata_header_only(spark):
    from feast_spark.functions.multimodal import video_metadata

    df = _video_df(
        spark,
        [(0, 1920, 1080, 30, 30 * 65), (1, 640, 480, 24, 24), (2, None)],
    )
    got = {r["id"]: r for r in video_metadata(df, "data", "clip_id").collect()}
    assert got[0]["width"] == 1920 and got[0]["n_frames"] == 30 * 65
    assert got[0]["duration_sec"] == 65.0 and got[0]["format"] == "fsvi"
    assert got[1]["fps"] == 24 and got[1]["duration_sec"] == 1.0
    assert got[2]["valid"] is False and got[2]["format"] == "unknown"


def test_video_frame_sample_header_only(spark):
    from feast_spark.functions.multimodal import video_frame_sample

    df = _video_df(
        spark,
        [
            (0, 64, 64, 30, 91),   # 91 frames @ 30fps, 1s step -> 0,30,60,90
            (1, 64, 64, 10, 5),    # shorter than one step -> frame 0 only
            (2, None),             # invalid -> no rows
        ],
    )
    out = video_frame_sample(df, "data", "clip_id", every_sec=1.0).toPandas()
    by_id = {i: g for i, g in out.groupby("id")}
    assert sorted(by_id[0]["frame_idx"]) == [0, 30, 60, 90]
    assert sorted(by_id[0]["timestamp_sec"]) == [0.0, 1.0, 2.0, 3.0]
    assert sorted(by_id[1]["frame_idx"]) == [0]
    assert 2 not in by_id
    # sub-second sampling multiplies rows
    dense = video_frame_sample(df, "data", "clip_id", every_sec=0.5).toPandas()
    assert len(dense[dense["id"] == 0]) == 7  # step 15: 0,15,...,90


def test_video_features_codec_boundary(spark):
    import pytest as _pytest

    from feast_spark.functions.multimodal import video_features

    df = _video_df(spark, [(0, 320, 240, 30, 30)])
    got = video_features(df, "data", "clip_id", fake=True).collect()[0]
    assert got["width"] == 320 and got["fps"] == 30
    assert 0.0 <= got["px_mean"] <= 255.0
    with _pytest.raises(Exception):
        video_features(df, "data", "clip_id", fake=False).collect()
