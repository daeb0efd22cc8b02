"""Wire-format envelope handling + file-backed message sources.

The reference's message wire shape (README.md:18-30) is::

    {"metadata": {...}, "subject": "a.b.c", "data": {...}}

published to NATS; the service stores metadata/data as opaque strings.
:func:`parse_envelope` re-expresses that contract for any byte/string
stream (file source, Kafka value column, socket) so every engine transform
downstream of the NATS source also works on replayed files — the batch/
streaming unification the reference cannot do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_nats_to_clickhouse_spark.schemas import MESSAGE_SCHEMA

#: envelope fields as they appear on the wire; metadata/data stay opaque
#: JSON (schema-on-read, matching init.sql:14-15).
_ENVELOPE_FIELDS = T.StructType(
    [
        T.StructField("metadata", T.StringType()),
        T.StructField("subject", T.StringType()),
        T.StructField("data", T.StringType()),
    ]
)


def parse_envelope(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str | None = None,
    seq_col: str | None = None,
) -> DataFrame:
    """Parse a raw JSON envelope column into MESSAGE_SCHEMA columns.

    Timestamp/sequence come from transport metadata when available
    (``ts_col``/``seq_col``); with a bare file replay they are extracted
    from the embedded metadata JSON (best effort, NULL -> dead letter
    downstream — never a crash: permissive from_json + try_cast only).
    """
    parsed = df.withColumn(
        "_env", F.from_json(F.col(value_col).cast("string"), _ENVELOPE_FIELDS)
    )
    ts = (
        F.col(ts_col)
        if ts_col
        else F.timestamp_seconds(
            F.get_json_object(F.col("_env.metadata"), "$.timestamp").try_cast("long")
        )
    )
    seq = (
        F.col(seq_col)
        if seq_col
        else F.get_json_object(F.col("_env.metadata"), "$.sequence").try_cast("long")
    )
    return parsed.select(
        ts.cast("timestamp").alias("timestamp"),
        F.col("_env.subject").alias("subject"),
        seq.alias("sequence"),
        F.coalesce(F.col("_env.metadata"), F.lit("{}")).alias("metadata"),
        F.col("_env.data").alias("data"),
    )


def message_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Dev/file stand-in source: a directory of JSON-lines envelope files
    streamed with the built-in file source, emitting MESSAGE_SCHEMA rows —
    interchangeable with the NATS source for every downstream operator.
    ``max_files_per_trigger`` bounds each micro-batch (admission control,
    the file-source analog of the NATS source's maxRecordsPerTrigger)."""
    reader = spark.readStream.format("text").schema(
        T.StructType([T.StructField("value", T.StringType())])
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_envelope(reader.load(path))


def message_file_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch twin of :func:`message_file_stream` (backfills)."""
    return parse_envelope(spark.read.format("text").load(path))


#: fixed publish time for fixture-derived document messages (epoch secs,
#: 2024-03-01T12:00:00Z — inside the ym=202403 partition the pipeline
#: tests use); a live publisher stamps real time here.
DOC_PUBLISH_EPOCH = 1_709_294_400


def document_envelopes(docs: DataFrame) -> DataFrame:
    """The PUBLISHER side of the document-bearing message contract: one
    wire envelope JSON line per document (column ``value``), the exact
    shape :func:`parse_envelope` decodes and
    streaming/pipeline.docs_from_messages re-extracts.

    * ``data``     — the document payload JSON (doc_id/text/lang/source/
      n_chars) plus the reference's ``id`` message field (README.md:18-30)
      so the analytics MV's JSONExtractString('id') works unchanged;
    * ``metadata`` — publish timestamp + per-doc sequence (doc_id — unique
      by construction, the idempotency key the exactly-once sink dedups
      on);
    * ``subject``  — ``corpus.<source>.ingest.doc-<id>.batch``: segment 2
      routes the per-stream raw tables (one table per corpus source),
      segment 4 becomes the chat_id analog.

    Pure column expressions (to_json escapes embedded newlines/quotes, so
    one document is always exactly one line) — a distributed map-only
    stage at any corpus size."""
    data = F.to_json(
        F.struct(
            F.col("doc_id"),
            F.col("text"),
            F.col("lang"),
            F.col("source"),
            F.col("n_chars"),
            F.col("doc_id").cast("string").alias("id"),
        )
    )
    meta = F.to_json(
        F.struct(
            F.lit(DOC_PUBLISH_EPOCH).alias("timestamp"),
            F.col("doc_id").alias("sequence"),
        )
    )
    subject = F.concat_ws(
        ".",
        F.lit("corpus"),
        F.col("source"),
        F.lit("ingest"),
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")),
        F.lit("batch"),
    )
    return docs.select(
        F.to_json(
            F.struct(
                meta.alias("metadata"),
                subject.alias("subject"),
                data.alias("data"),
            )
        ).alias("value")
    )


def embedding_envelopes(vecs: DataFrame) -> DataFrame:
    """Publisher side for EMBEDDING-bearing messages — the vector twin
    of :func:`document_envelopes`: one envelope per (vec_id, embedding)
    row, decoded downstream by streaming/pipeline.vecs_from_messages.
    Sequence = vec_id offset into its own subject space (subjects
    differ from document messages, so the (subject, sequence)
    idempotency key never collides across payload kinds)."""
    # publish doubles: Jackson writes round-trippable doubles, so the
    # decoded cv is bit-identical to cast(embedding as double) and the
    # streamed index scores exactly like a batch-built one
    data = F.to_json(
        F.struct(
            F.col("vec_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "embedding"
            ),
            F.col("vec_id").cast("string").alias("id"),
        )
    )
    meta = F.to_json(
        F.struct(
            F.lit(DOC_PUBLISH_EPOCH).alias("timestamp"),
            F.col("vec_id").alias("sequence"),
        )
    )
    subject = F.concat_ws(
        ".",
        F.lit("corpus"),
        F.lit("embeddings"),
        F.lit("ingest"),
        F.concat(F.lit("vec-"), F.col("vec_id").cast("string")),
        F.lit("batch"),
    )
    return vecs.select(
        F.to_json(
            F.struct(
                meta.alias("metadata"),
                subject.alias("subject"),
                data.alias("data"),
            )
        ).alias("value")
    )
