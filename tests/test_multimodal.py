"""Multimodal plumbing tests: binary columns + mapInPandas kernels (decode
stubbed — the Spark-side schema/batch/fan-out shapes are what's under test)."""

from __future__ import annotations

import pytest

from go_nats_to_clickhouse_spark.operators.multimodal import (
    audio_features,
    image_features,
    sample_frames,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, 90).cache()

def test_synthetic_media_shape(spark, media):
    assert media.count() == 90
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    assert dict(media.dtypes)["content"] == "binary"


def test_image_features(spark, media):
    out = image_features(media, fake=True)
    rows = out.collect()
    assert len(rows) == 30  # only kind == image
    r = rows[0]
    assert r["width"] >= 1 and r["height"] >= 1
    assert r["n_bytes"] > 0
    assert 0.0 <= r["mean_luma"] <= 255.0


def test_image_features_real_decoder_is_stubbed(spark, media):
    out = image_features(media, fake=False)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        out.collect()


def test_audio_features(spark, media):
    rows = audio_features(media, fake=True).collect()
    assert len(rows) == 30
    assert all(r["sample_rate"] == 16000 for r in rows)
    assert all(r["rms"] > 0 for r in rows)


def test_frame_sampling_fans_out(spark, media):
    rows = sample_frames(media, every_n=2, fake=True).collect()
    # each fake video has len(buf)//100 frames sampled every 2
    assert len(rows) > 30  # more rows than videos -> fan-out happened
    assert all(isinstance(r["frame_png"], (bytes, bytearray)) for r in rows)
    assert all(r["frame_idx"] % 2 == 0 for r in rows)


def test_resize_images_normalizes_dims(spark, media):
    from go_nats_to_clickhouse_spark.operators.multimodal import resize_images

    out = resize_images(media, width=224, height=224, fake=True).collect()
    assert len(out) == media.filter("kind = 'image'").count()
    for r in out:
        assert (r.width, r.height) == (224, 224)
        assert len(r.content) == 224 * 224 // 8


def test_resize_real_decoder_is_stubbed(spark, media):
    import pytest

    from go_nats_to_clickhouse_spark.operators.multimodal import resize_images

    with pytest.raises(Exception, match="codec"):
        resize_images(media, fake=False).collect()


def test_resize_target_not_multiple_of_seed(spark, media):
    """width*height/8 not divisible by the 16-byte md5 seed must still
    produce full-length payloads (ceiling repetition, not floor)."""
    from go_nats_to_clickhouse_spark.operators.multimodal import resize_images

    out = resize_images(media, width=100, height=10, fake=True).collect()
    assert out and all(len(r.content) == 100 * 10 // 8 for r in out)
