"""Multimodal decode queries with closed-form oracles.

The fixture (``operators/multimodal.synthetic_media_codec``) generates REAL
encoded media — PNG images, PCM WAV audio, SPKV frame containers — whose
pixel/sample statistics have closed forms in the media_id. The Spark side
genuinely encodes and decodes bytes (builtin stdlib codecs, Pillow when
present); the DuckDB oracle computes the same statistics arithmetically
from ``range()``. A hash match therefore proves the full encode→decode
round trip, not just plumbing shapes.

n_bytes/raw payload columns are deliberately excluded from oracled outputs
(compressed sizes have no closed form; binary cells don't canonicalize)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.queries.registry import query

N_MEDIA = 120


@query(
    "multimodal_image_features",
    f"""
SELECT CAST(i AS BIGINT) AS media_id,
       CAST(16 + i % 16 AS INT) AS width,
       CAST(16 + (i * 7) % 16 AS INT) AS height,
       CAST((i * 13) % 256 AS DOUBLE) AS mean_luma
FROM range(0, {N_MEDIA}) t(i)
WHERE i % 3 = 0
""",
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image decode as a query: synthetic PNGs -> mapInPandas decode
    kernel -> pixel statistics, hash-checked against the closed form."""
    from go_nats_to_clickhouse_spark.operators.multimodal import (
        image_features,
        synthetic_media_codec,
    )

    return image_features(synthetic_media_codec(spark, N_MEDIA)).select(
        "media_id", "width", "height", "mean_luma"
    )


@query(
    "multimodal_audio_features",
    f"""
SELECT CAST(i AS BIGINT) AS media_id,
       CAST(1600 + (i % 10) * 160 AS DOUBLE) / 16000 AS duration_s,
       CAST(16000 AS INT) AS sample_rate,
       CAST(ABS((i * 37) % 1999 - 999) AS DOUBLE) AS rms
FROM range(0, {N_MEDIA}) t(i)
WHERE i % 3 = 1
""",
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV decode as a query: sample count, rate and RMS from actual
    PCM samples (constant-amplitude fixture -> RMS == |amplitude|)."""
    from go_nats_to_clickhouse_spark.operators.multimodal import (
        audio_features,
        synthetic_media_codec,
    )

    return audio_features(synthetic_media_codec(spark, N_MEDIA)).select(
        "media_id", "duration_s", "sample_rate", "rms"
    )


@query(
    "multimodal_frame_stats",
    f"""
SELECT CAST(i AS BIGINT) AS media_id,
       CAST(f AS INT) AS frame_idx,
       CAST((i + f * 11) % 256 AS DOUBLE) AS frame_mean
FROM range(0, {N_MEDIA}) t(i), range(0, 7) s(f)
WHERE i % 3 = 2 AND f <= i % 7 AND f % 2 = 0
""",
)
def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling + per-frame decode: every-2nd frame of each SPKV
    container, decoded, mean pixel value vs the closed form. Exercises the
    explode-then-decode fan-out shape a video pipeline uses."""
    from go_nats_to_clickhouse_spark.operators.multimodal import (
        frame_stats,
        sample_frames,
        synthetic_media_codec,
    )

    return frame_stats(
        sample_frames(synthetic_media_codec(spark, N_MEDIA), every_n=2)
    )


@query(
    "multimodal_resize_stats",
    f"""
SELECT CAST(i AS BIGINT) AS media_id,
       CAST(64 AS INT) AS width,
       CAST(64 AS INT) AS height,
       CAST((i * 13) % 256 AS DOUBLE) AS mean_luma
FROM range(0, {N_MEDIA}) t(i)
WHERE i % 3 = 0
""",
)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode -> nearest-neighbor resize -> re-encode -> decode again:
    the resized PNG is re-read by the feature kernel, so a hash match
    proves both codec directions. Constant images stay constant under
    nearest-neighbor, giving the closed-form mean."""
    from go_nats_to_clickhouse_spark.operators.multimodal import (
        image_features,
        resize_images,
        synthetic_media_codec,
    )

    resized = resize_images(
        synthetic_media_codec(spark, N_MEDIA), width=64, height=64
    ).withColumn("kind", F.lit("image"))
    return image_features(resized).select("media_id", "width", "height", "mean_luma")
