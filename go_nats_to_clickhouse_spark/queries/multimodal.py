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


@query(
    "multimodal_keyframe_select",
    f"""
WITH fm AS (
  SELECT i, f, CAST((i + f * 11) % 256 AS DOUBLE) AS m
  FROM range(0, {N_MEDIA}) t(i), range(0, 7) s(f)
  WHERE i % 3 = 2 AND f <= i % 7
),
d AS (
  SELECT i, f, ABS(m - lag(m) OVER (PARTITION BY i ORDER BY f)) AS delta
  FROM fm
)
SELECT CAST(i AS BIGINT) AS media_id,
       CAST(f AS INT) AS keyframe_idx,
       CAST(delta AS DOUBLE) AS boundary_score
FROM (
  SELECT i, f, delta,
         ROW_NUMBER() OVER (PARTITION BY i ORDER BY delta DESC, f) AS rn
  FROM d WHERE delta IS NOT NULL
)
WHERE rn = 1 ORDER BY media_id
""",
)
def multimodal_keyframe_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary keyframe selection — the frame a vision-language
    training pipeline keeps per video: decode EVERY frame (real SPKV
    container decode through the mapInPandas kernel), compute the
    inter-frame mean-pixel delta per video, and select the frame with
    the largest jump (tie -> earliest). Single-frame videos have no
    boundary and emit nothing.

    Scale shape: the decode fan-out is the same explode-then-decode
    shape as multimodal_frame_stats (frames decode partition-parallel,
    one video never crosses executors); the per-video lag/argmax windows
    partition by media_id — millions of small partitions, no global
    sort. The oracle recomputes the decoded means from the fixture's
    closed form, so a hash match proves the decode -> delta -> argmax
    chain end-to-end, not just the window algebra."""
    from go_nats_to_clickhouse_spark.operators.multimodal import (
        frame_stats,
        sample_frames,
        synthetic_media_codec,
    )
    from pyspark.sql.window import Window

    fm = frame_stats(
        sample_frames(synthetic_media_codec(spark, N_MEDIA), every_n=1)
    )
    wl = Window.partitionBy("media_id").orderBy("frame_idx")
    d = fm.select(
        "media_id",
        "frame_idx",
        F.abs(
            F.col("frame_mean") - F.lag("frame_mean").over(wl)
        ).alias("delta"),
    ).filter(F.col("delta").isNotNull())
    wr = Window.partitionBy("media_id").orderBy(
        F.col("delta").desc(), "frame_idx"
    )
    return (
        d.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "media_id",
            F.col("frame_idx").cast("int").alias("keyframe_idx"),
            F.col("delta").cast("double").alias("boundary_score"),
        )
        .orderBy("media_id")
    )
