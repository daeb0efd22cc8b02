"""Document chunking — Python UDTF (Spark 4) + the equivalent expression
form.

Chunking into fixed word windows is the canonical training-data prep step.
Two implementations on purpose:

* :func:`chunk_expr` — pure built-in expressions (sequence/slice/
  concat_ws + explode). This is the production path: codegen'd, no Python.
* :class:`ChunkDocumentsUDTF` — a Python UDTF with identical semantics,
  registered for SQL lateral use. UDTFs are row-at-a-time Python — the
  right tool only when the per-row logic stops being expressible (custom
  tokenizers, stateful chunkers); shipping both, checked against the same
  oracle, documents the boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHUNK_SCHEMA = "doc_id bigint, chunk_idx int, chunk_text string, n_words int"


def chunk_expr(df: DataFrame, chunk_words: int = 50) -> DataFrame:
    """Expression-form chunker: explode fixed word windows per document."""
    w = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(w) / F.lit(float(chunk_words))).cast("int")
    chunks = F.expr(
        f"transform(sequence(0, cast(ceil(size(split(text, ' ')) / {chunk_words}.0) as int) - 1), "
        f"c -> struct(c AS chunk_idx, "
        f"concat_ws(' ', slice(split(text, ' '), c * {chunk_words} + 1, {chunk_words})) AS chunk_text, "
        f"size(slice(split(text, ' '), c * {chunk_words} + 1, {chunk_words})) AS n_words))"
    )
    return (
        df.select("doc_id", F.explode(chunks).alias("ch"))
        .select(
            "doc_id",
            F.col("ch.chunk_idx").cast("int").alias("chunk_idx"),
            F.col("ch.chunk_text").alias("chunk_text"),
            F.col("ch.n_words").cast("int").alias("n_words"),
        )
    )


class ChunkDocumentsUDTF:
    """Python UDTF: one input row (doc_id, text) -> one row per chunk."""

    def __init__(self):
        self.chunk_words = 50

    def eval(self, doc_id: int, text: str):  # noqa: D102
        if text is None:
            return
        words = text.split(" ")
        k = self.chunk_words
        for c in range((len(words) + k - 1) // k):
            piece = words[c * k : (c + 1) * k]
            yield doc_id, c, " ".join(piece), len(piece)


def register_chunk_udtf(spark: SparkSession, name: str = "chunk_documents") -> None:
    from pyspark.sql.functions import udtf

    # useArrow: rows move through Arrow batches instead of pickled
    # one-at-a-time (the plan shows ArrowEvalPythonUDTF, not BatchEval).
    spark.udtf.register(
        name, udtf(ChunkDocumentsUDTF, returnType=CHUNK_SCHEMA, useArrow=True)
    )


def chunk_udtf(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Run the UDTF laterally over a documents DataFrame."""
    register_chunk_udtf(spark)
    df.select("doc_id", "text").createOrReplaceTempView("_chunk_input")
    return spark.sql(
        "SELECT c.doc_id, c.chunk_idx, c.chunk_text, c.n_words "
        "FROM _chunk_input d, LATERAL chunk_documents(d.doc_id, d.text) c"
    )
