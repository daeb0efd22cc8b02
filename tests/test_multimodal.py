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


def test_image_features_real_decode_rejects_garbage(spark, media):
    # synthetic_media payloads are not valid PNGs: the real decoder must
    # fail loudly, not fabricate stats.
    out = image_features(media, fake=False)
    with pytest.raises(Exception, match="PNG|signature"):
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


class TestRealCodecs:
    """Real decode paths over synthetic_media_codec (valid PNG/WAV/SPKV
    payloads with closed-form statistics)."""

    @pytest.fixture(scope="class")
    def real_media(self, spark):
        from go_nats_to_clickhouse_spark.operators.multimodal import (
            synthetic_media_codec,
        )

        return synthetic_media_codec(spark, 60).cache()

    def test_image_decode_matches_closed_form(self, spark, real_media):
        rows = image_features(real_media).collect()
        assert len(rows) == 20
        for r in rows:
            i = r["media_id"]
            assert r["width"] == 16 + i % 16
            assert r["height"] == 16 + (i * 7) % 16
            assert r["mean_luma"] == float((i * 13) % 256)

    def test_audio_decode_matches_closed_form(self, spark, real_media):
        rows = audio_features(real_media).collect()
        assert len(rows) == 20
        for r in rows:
            i = r["media_id"]
            assert r["sample_rate"] == 16000
            assert r["duration_s"] == (1600 + (i % 10) * 160) / 16000
            assert r["rms"] == float(abs((i * 37) % 1999 - 999))

    def test_frame_sampling_and_decode(self, spark, real_media):
        from go_nats_to_clickhouse_spark.operators.multimodal import frame_stats

        rows = frame_stats(sample_frames(real_media, every_n=2)).collect()
        assert rows
        for r in rows:
            i, f = r["media_id"], r["frame_idx"]
            assert f % 2 == 0 and f <= i % 7
            assert r["frame_mean"] == float((i + f * 11) % 256)

    def test_resize_roundtrip(self, spark, real_media):
        from go_nats_to_clickhouse_spark.operators.codecs import decode_png
        from go_nats_to_clickhouse_spark.operators.multimodal import resize_images

        rows = resize_images(real_media, width=32, height=48).collect()
        assert len(rows) == 20
        for r in rows:
            px = decode_png(bytes(r["content"]))
            assert px.shape == (48, 32)
            assert float(px.mean()) == float((r["media_id"] * 13) % 256)


class TestCodecPrimitives:
    def test_png_roundtrip_shapes(self):
        import numpy as np

        from go_nats_to_clickhouse_spark.operators import codecs

        rng = np.random.default_rng(7)
        for shape in [(5, 3), (12, 7, 3), (4, 4, 4)]:
            a = rng.integers(0, 256, size=shape, dtype=np.uint8)
            b = codecs.decode_png(codecs.encode_png(a))
            assert b.shape == a.shape and (a == b).all()

    def test_png_filtered_rows_decode(self):
        # Hand-build a PNG using Sub/Up/Average/Paeth filters per row and
        # check the unfilter logic reconstructs the flat image.
        import struct
        import zlib

        import numpy as np

        from go_nats_to_clickhouse_spark.operators import codecs

        w, h = 6, 4
        img = np.arange(w * h, dtype=np.uint8).reshape(h, w)
        rows = []
        for y, ftype in enumerate((1, 2, 3, 4)):
            cur = img[y].astype(int)
            prev = img[y - 1].astype(int) if y else np.zeros(w, dtype=int)
            enc = np.zeros(w, dtype=int)
            for x in range(w):
                left = cur[x - 1] if x else 0
                up = prev[x]
                ul = prev[x - 1] if x else 0
                if ftype == 1:
                    pred = left
                elif ftype == 2:
                    pred = up
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else up if pb <= pc else ul
                enc[x] = (cur[x] - pred) % 256
            rows.append(bytes([ftype]) + bytes(enc.astype(np.uint8)))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        png = (
            codecs.PNG_SIGNATURE
            + codecs._chunk(b"IHDR", ihdr)
            + codecs._chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + codecs._chunk(b"IEND", b"")
        )
        got = codecs.decode_png(png)
        assert (got == img).all()

    def test_wav_roundtrip(self):
        import numpy as np

        from go_nats_to_clickhouse_spark.operators import codecs

        s = np.array([0, 100, -100, 32767, -32768], dtype=np.int16)
        dec, sr = codecs.decode_wav(codecs.encode_wav(s, 8000))
        assert sr == 8000 and (dec == s).all()

    def test_luma_weights(self):
        import numpy as np

        from go_nats_to_clickhouse_spark.operators import codecs

        rgb = np.zeros((1, 1, 3), dtype=np.uint8)
        rgb[0, 0] = (255, 0, 0)
        assert abs(codecs.luma(rgb)[0, 0] - 255 * 0.299) < 1e-9


def test_resize_target_not_multiple_of_seed(spark, media):
    """width*height/8 not divisible by the 16-byte md5 seed must still
    produce full-length payloads (ceiling repetition, not floor)."""
    from go_nats_to_clickhouse_spark.operators.multimodal import resize_images

    out = resize_images(media, width=100, height=10, fake=True).collect()
    assert out and all(len(r.content) == 100 * 10 // 8 for r in out)
