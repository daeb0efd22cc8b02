"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

This is the standard large-scale layout for multimodal training data:
the bytes stay an opaque ``binary`` column (parquet keeps them contiguous
and compressed), metadata travels in typed columns, and every transform is
a per-batch Python stage that never materializes more than one Arrow batch
per task — so a 100 TB corpus streams through executors at
``maxPartitionBytes`` granularity with zero driver involvement.

The actual codec work (JPEG decode, resample, frame extraction) requires
image/audio libraries not present in this environment; those kernels are
stubbed behind ``_require_codecs()`` (NotImplementedError) or provided as
deterministic fakes (``fake=True``) so the Spark-side plumbing — schemas,
batch iteration, partitioning, output shapes — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal record layout
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.StringType(), True),  # JSON: width/height/dur...
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_bytes long, mean_luma double"
)

AUDIO_FEATURES_SCHEMA = (
    "media_id long, duration_s double, sample_rate int, n_bytes long, rms double"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_png binary"


def _require_codecs(kind: str) -> None:
    raise NotImplementedError(
        f"real {kind} decoding needs codec libraries (PIL/ffmpeg/soundfile) "
        "that are not installed in this environment; run with fake=True for "
        "the deterministic stand-in kernels"
    )


def _fake_dims(buf: bytes) -> tuple[int, int]:
    # Deterministic stand-in for a real header parse.
    return (len(buf) % 640 + 1, len(buf) % 480 + 1)


def image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract images: (media_id, width, height, n_bytes,
    mean_luma). Arrow-batched; one decode per row, vectorized accumulation."""

    def kernel(batches: Iterator[Any]) -> Iterator[Any]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not fake:
                _require_codecs("image")
            contents = pdf["content"]
            dims = [_fake_dims(b or b"") for b in contents]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": np.array([d[0] for d in dims], dtype="int32"),
                    "height": np.array([d[1] for d in dims], dtype="int32"),
                    "n_bytes": contents.map(lambda b: len(b or b"")).astype("int64"),
                    # fake luma: mean byte value — the real kernel decodes and
                    # averages the Y channel; identical shape either way.
                    "mean_luma": contents.map(
                        lambda b: float(np.frombuffer(b or b"\x00", dtype="uint8").mean())
                    ),
                }
            )

    img = df.filter(F.col("kind") == "image")
    return img.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Audio decode stub: duration/sample-rate/RMS per clip."""

    def kernel(batches: Iterator[Any]) -> Iterator[Any]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not fake:
                _require_codecs("audio")
            contents = pdf["content"]
            n = contents.map(lambda b: len(b or b"")).astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_s": (n / 32000.0).astype("float64"),  # fake 16 kHz s16
                    "sample_rate": np.full(len(pdf), 16000, dtype="int32"),
                    "n_bytes": n,
                    "rms": contents.map(
                        lambda b: float(
                            np.sqrt(
                                np.mean(
                                    np.frombuffer(b or b"\x00", dtype="uint8")
                                    .astype("float64")
                                    ** 2
                                )
                            )
                        )
                    ),
                }
            )

    aud = df.filter(F.col("kind") == "audio")
    return aud.mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """Video frame sampling stub: explode each video into every-nth frames.

    Output is one row per sampled frame (media_id, frame_idx, frame_png) —
    the fan-out shape a real ffmpeg kernel produces; the fake kernel emits
    byte slices so downstream partitioning/row-explosion is exercised.
    """

    def kernel(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        for pdf in batches:
            if not fake:
                _require_codecs("video")
            out_ids, out_idx, out_frames = [], [], []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                buf = buf or b""
                n_frames = max(1, len(buf) // 100)  # fake: 1 frame per 100 bytes
                for i in range(0, n_frames, every_n):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_frames.append(buf[i * 100 : (i + 1) * 100])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_png": out_frames}
            )

    vid = df.filter(F.col("kind") == "video")
    return vid.mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, content binary"


def resize_images(
    df: DataFrame, width: int = 224, height: int = 224, fake: bool = False
) -> DataFrame:
    """Image resize stub: (media_id, width, height, content) at the target
    dimensions — the canonical normalize-before-training step.

    The real kernel decodes, resamples (e.g. bilinear to 224x224), and
    re-encodes inside the batch loop; the fake kernel emits a
    deterministic byte payload of width*height/8 bytes so output sizing,
    schema, and batch shape are exercised. Either way the stage is pure
    mapInPandas: no shuffle, output partitioning follows the scan.
    """

    def kernel(batches: Iterator[Any]) -> Iterator[Any]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not fake:
                _require_codecs("image")
            out = []
            target = width * height // 8
            for buf in pdf["content"]:
                seed = hashlib.md5(buf or b"").digest()
                reps = -(-target // len(seed))  # ceil: payload never short
                out.append((seed * reps)[:target])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "content": out,
                }
            )

    img = df.filter(F.col("kind") == "image")
    return img.mapInPandas(kernel, RESIZE_SCHEMA)


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic synthetic media table for tests/demos: binary payloads
    derived from the row id (no external fixtures needed)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    content = F.encode(
        F.concat(F.lit("media-payload-"), F.repeat(F.col("id").cast("string"), 300)),
        "UTF-8",
    )
    # few partitions on purpose: spraying a tiny demo table across every
    # core forks a Python worker per task for micro-batches of ~4 rows.
    return spark.range(n, numPartitions=max(1, n // 32)).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        content.alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.to_json(F.struct(F.col("id").alias("source_id"))).alias("meta"),
    )
