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
