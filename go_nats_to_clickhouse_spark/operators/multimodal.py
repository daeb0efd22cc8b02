"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

This is the standard large-scale layout for multimodal training data:
the bytes stay an opaque ``binary`` column (parquet keeps them contiguous
and compressed), metadata travels in typed columns, and every transform is
a per-batch Python stage that never materializes more than one Arrow batch
per task — so a 100 TB corpus streams through executors at
``maxPartitionBytes`` granularity with zero driver involvement.

Decode is REAL: images through :mod:`operators.codecs` (Pillow when
importable, else the pure-stdlib PNG codec), audio through the stdlib WAV
reader, video frames through the SPKV length-prefixed container. The
``fake=True`` path keeps the original deterministic stand-in kernels for
plumbing tests that feed arbitrary bytes.
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

FRAME_STATS_SCHEMA = "media_id long, frame_idx int, frame_mean double"

RESIZE_SCHEMA = "media_id long, width int, height int, content binary"


def _fake_dims(buf: bytes) -> tuple[int, int]:
    # Deterministic stand-in for a real header parse.
    return (len(buf) % 640 + 1, len(buf) % 480 + 1)


def image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract images: (media_id, width, height, n_bytes,
    mean_luma). Arrow-batched; one real decode per row (Pillow or the
    builtin PNG codec), vectorized pixel statistics."""

    def kernel(batches: Iterator[Any]) -> Iterator[Any]:
        import numpy as np
        import pandas as pd

        from go_nats_to_clickhouse_spark.operators import codecs

        for pdf in batches:
            contents = pdf["content"]
            if fake:
                dims = [_fake_dims(b or b"") for b in contents]
                widths = [d[0] for d in dims]
                heights = [d[1] for d in dims]
                lumas = [
                    float(np.frombuffer(b or b"\x00", dtype="uint8").mean())
                    for b in contents
                ]
            else:
                widths, heights, lumas = [], [], []
                for b in contents:
                    px = codecs.decode_image(bytes(b))
                    heights.append(px.shape[0])
                    widths.append(px.shape[1])
                    lumas.append(float(codecs.luma(px).mean()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": np.array(widths, dtype="int32"),
                    "height": np.array(heights, dtype="int32"),
                    "n_bytes": contents.map(lambda b: len(b or b"")).astype("int64"),
                    "mean_luma": lumas,
                }
            )

    img = df.filter(F.col("kind") == "image")
    return img.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Audio decode: duration/sample-rate/RMS per clip. Real path parses
    16-bit PCM WAV (stdlib); RMS is computed over raw int16 samples."""

    def kernel(batches: Iterator[Any]) -> Iterator[Any]:
        import numpy as np
        import pandas as pd

        from go_nats_to_clickhouse_spark.operators import codecs

        for pdf in batches:
            contents = pdf["content"]
            n = contents.map(lambda b: len(b or b"")).astype("int64")
            if fake:
                durations = (n / 32000.0).astype("float64")  # fake 16 kHz s16
                rates = np.full(len(pdf), 16000, dtype="int32")
                rms = [
                    float(
                        np.sqrt(
                            np.mean(
                                np.frombuffer(b or b"\x00", dtype="uint8").astype(
                                    "float64"
                                )
                                ** 2
                            )
                        )
                    )
                    for b in contents
                ]
            else:
                durations, rates, rms = [], [], []
                for b in contents:
                    samples, sr = codecs.decode_wav(bytes(b))
                    flat = samples.astype("float64").ravel()
                    durations.append(len(samples) / sr)
                    rates.append(sr)
                    rms.append(float(np.sqrt(np.mean(flat**2))) if len(flat) else 0.0)
                rates = np.array(rates, dtype="int32")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_s": durations,
                    "sample_rate": rates,
                    "n_bytes": n,
                    "rms": rms,
                }
            )

    aud = df.filter(F.col("kind") == "audio")
    return aud.mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """Video frame sampling: explode each video into every-nth frames.

    Output is one row per sampled frame (media_id, frame_idx, frame_png).
    Real path walks the SPKV container (ffmpeg would slot in here for real
    codecs); the fake kernel emits byte slices so arbitrary-bytes plumbing
    tests still exercise the fan-out shape.
    """

    def kernel(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        from go_nats_to_clickhouse_spark.operators import codecs

        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(buf or b"")
                if fake:
                    n_frames = max(1, len(buf) // 100)  # fake: 1 frame per 100 B
                    for i in range(0, n_frames, every_n):
                        out_ids.append(mid)
                        out_idx.append(i)
                        out_frames.append(buf[i * 100 : (i + 1) * 100])
                else:
                    for i, frame in codecs.iter_frames(buf):
                        if i % every_n == 0:
                            out_ids.append(mid)
                            out_idx.append(i)
                            out_frames.append(frame)
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_png": out_frames}
            )

    vid = df.filter(F.col("kind") == "video")
    return vid.mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)


def frame_stats(frames_df: DataFrame) -> DataFrame:
    """Decode sampled frames and emit per-frame pixel statistics
    (media_id, frame_idx, frame_mean). Composes after :func:`sample_frames`;
    still map-only — the fan-out row set streams batch by batch."""

    def kernel(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        from go_nats_to_clickhouse_spark.operators import codecs

        for pdf in batches:
            means = [
                float(codecs.luma(codecs.decode_image(bytes(b))).mean())
                for b in pdf["frame_png"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_mean": means,
                }
            )

    return frames_df.mapInPandas(kernel, FRAME_STATS_SCHEMA)


def resize_images(
    df: DataFrame, width: int = 224, height: int = 224, fake: bool = False
) -> DataFrame:
    """Image resize: (media_id, width, height, content) at the target
    dimensions — the canonical normalize-before-training step.

    Real path decodes, nearest-neighbor resamples (numpy indexing), and
    re-encodes PNG inside the batch loop. The stage is pure mapInPandas:
    no shuffle, output partitioning follows the scan.
    """

    def kernel(batches: Iterator[Any]) -> Iterator[Any]:
        import hashlib

        import pandas as pd

        from go_nats_to_clickhouse_spark.operators import codecs

        for pdf in batches:
            out = []
            if fake:
                target = width * height // 8
                for buf in pdf["content"]:
                    seed = hashlib.md5(buf or b"").digest()
                    reps = -(-target // len(seed))  # ceil: payload never short
                    out.append((seed * reps)[:target])
            else:
                for buf in pdf["content"]:
                    px = codecs.decode_image(bytes(buf))
                    out.append(codecs.encode_png(codecs.resize_nearest(px, width, height)))
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
    """Deterministic synthetic media table for plumbing tests: binary
    payloads derived from the row id (NOT valid media — use with
    ``fake=True`` kernels, or :func:`synthetic_media_codec` for real)."""
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


def synthetic_media_codec(spark, n: int = 120) -> DataFrame:
    """Deterministic REAL media fixture with closed-form statistics, so the
    decode kernels can be oracle-checked end to end by any SQL engine:

    media_id = i, kind = (image, audio, video)[i % 3]

    * image: gray PNG, width ``16 + i%16``, height ``16 + (i*7)%16``, every
      pixel ``(i*13)%256``  ->  decoded mean_luma == (i*13)%256 exactly.
    * audio: 16 kHz mono s16 WAV with ``1600 + (i%10)*160`` samples, all at
      constant amplitude ``(i*37)%1999 - 999``  ->  duration_s and RMS have
      closed forms (n/16000 and abs(amplitude)).
    * video: SPKV container with ``1 + i%7`` 8x8 gray PNG frames, frame f
      constant ``(i + f*11)%256``  ->  per-frame mean is closed-form.

    Generation is distributed (mapInPandas over ``spark.range``) — the
    driver never materializes a payload.
    """

    def kernel(batches: Iterator[Any]) -> Iterator[Any]:
        import json

        import numpy as np
        import pandas as pd

        from go_nats_to_clickhouse_spark.operators import codecs

        for pdf in batches:
            kinds, contents, mimes, metas = [], [], [], []
            for i in pdf["id"]:
                i = int(i)
                if i % 3 == 0:
                    w, h, v = 16 + i % 16, 16 + (i * 7) % 16, (i * 13) % 256
                    kinds.append("image")
                    contents.append(
                        codecs.encode_png(np.full((h, w), v, dtype=np.uint8))
                    )
                    mimes.append("image/png")
                    metas.append(json.dumps({"width": w, "height": h}))
                elif i % 3 == 1:
                    n_samp = 1600 + (i % 10) * 160
                    amp = (i * 37) % 1999 - 999
                    kinds.append("audio")
                    contents.append(
                        codecs.encode_wav(
                            np.full(n_samp, amp, dtype=np.int16), 16000
                        )
                    )
                    mimes.append("audio/wav")
                    metas.append(json.dumps({"sample_rate": 16000, "n": n_samp}))
                else:
                    n_frames = 1 + i % 7
                    frames = [
                        codecs.encode_png(
                            np.full((8, 8), (i + f * 11) % 256, dtype=np.uint8)
                        )
                        for f in range(n_frames)
                    ]
                    kinds.append("video")
                    contents.append(codecs.encode_frames(frames))
                    mimes.append("video/x-spkv")
                    metas.append(json.dumps({"n_frames": n_frames}))
            yield pd.DataFrame(
                {
                    "media_id": pdf["id"],
                    "kind": kinds,
                    "content": contents,
                    "mime": mimes,
                    "meta": metas,
                }
            )

    return spark.range(n, numPartitions=max(1, n // 32)).mapInPandas(
        kernel, MEDIA_SCHEMA
    )
