"""VariantType analytics — the ClickHouse ``JSON`` column type done
Spark-4-native (SURVEY.md §7 "hard parts" item 1).

The reference's analytics table re-types the opaque string payloads as
ClickHouse ``JSON`` (init.sql:79-80) so later queries can path-extract
without re-parsing text. Spark 4's VariantType is the same idea: a binary,
shredded semi-structured encoding parsed ONCE at ingest, with typed
``variant_get`` access afterwards — repeated extraction no longer pays a
JSON text parse per path. The default pipeline keeps strings (schema-on-
read, exactly the reference's ingest contract); this module is the opt-in
re-typed layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def analytics_with_variant(analytics: DataFrame) -> DataFrame:
    """Re-type the opaque metadata/data string columns as VariantType —
    the analog of landing them in ClickHouse ``JSON`` columns.

    try_parse_json keeps malformed payloads as NULL variants instead of
    failing the batch (ANSI-safe).
    """
    return analytics.withColumn(
        "metadata_v", F.try_parse_json(F.col("metadata"))
    ).withColumn("data_v", F.try_parse_json(F.col("data")))


def variant_extract_demo(analytics_v: DataFrame) -> DataFrame:
    """Typed path extraction from the variant columns; equivalent to the
    string-based MV extraction but without re-parsing JSON text per path."""
    return analytics_v.select(
        "subject",
        F.expr("try_variant_get(data_v, '$.text', 'string')").alias("text_v"),
        F.expr("try_variant_get(data_v, '$.timestamp', 'long')").alias("ts_v"),
        F.expr("try_variant_get(metadata_v, '$.seq', 'long')").alias("seq_v"),
    )


def variant_supported(spark) -> bool:
    """Capability gate for the VariantType path (VERDICT r4 #8): True when
    this Spark exposes VariantType + the parse/get/serialize trio. On a
    Spark without them (pre-4.0) callers keep the schema-on-read default,
    which is also the reference's own ingest contract (payloads land as
    String, init.sql:14-15)."""
    try:
        from pyspark.sql.types import VariantType  # noqa: F401
    except ImportError:
        return False
    return all(
        hasattr(F, attr)
        for attr in ("try_parse_json", "try_variant_get", "to_json")
    )


def analytics_projection_variant(df: DataFrame) -> DataFrame:
    """The full ``analitics_data_mv`` projection (init.sql:100-121)
    computed through ONE VariantType parse per payload column — the
    parse-once F7 fidelity path.

    The string-based :func:`~go_nats_to_clickhouse_spark.operators.
    analytics.analytics_projection` re-derives each JSON path from the
    text column (Catalyst may or may not fuse the parses); here ``data``
    is parsed exactly once into a shredded variant and every extraction is
    a typed ``try_variant_get`` off it — the ClickHouse ``JSON`` column
    behavior, where path access never re-parses text. Output columns and
    semantics are bit-identical to the string path (pinned by
    tests/test_variant.py::test_projection_variant_matches_string_path),
    including the ''-for-non-string rule of ``JSONExtractString`` and the
    0-default DateTime of ``JSONExtractUInt``."""
    from go_nats_to_clickhouse_spark.functions.clickhouse import split_by_char
    from go_nats_to_clickhouse_spark.operators.analytics import SUBJECT_SEGMENTS

    def _ch_string(v, key: str):
        field = F.expr(f"try_variant_get({v}, '$.{key}', 'variant')")
        return F.when(
            F.schema_of_variant(field) == F.lit("STRING"),
            F.expr(f"try_variant_get({v}, '$.{key}', 'string')"),
        ).otherwise(F.lit(""))

    def _ch_uint(v, key: str):
        # best-effort numeric parse with UInt default 0, matching
        # JSONExtractUInt: a string "123" parses, "x" -> 0, missing -> 0
        as_str = F.expr(f"try_variant_get({v}, '$.{key}', 'string')")
        return F.coalesce(as_str.try_cast("long"), F.lit(0).cast("long"))

    with_v = df.withColumn("_data_v", F.try_parse_json(F.col("data")))
    with_parts = with_v.withColumn("_parts", split_by_char("subject"))
    split_cols = [
        F.coalesce(F.get(F.col("_parts"), i), F.lit("")).alias(name)
        for i, name in enumerate(SUBJECT_SEGMENTS)
    ]
    return with_parts.select(
        F.col("timestamp"),
        F.col("subject"),
        F.col("chat_id"),
        F.col("metadata"),
        F.col("data"),
        _ch_string("_data_v", "text").alias("message_text"),
        _ch_string("_data_v", "meta").alias("message_meta"),
        _ch_string("_data_v", "id").alias("message_id"),
        F.timestamp_seconds(_ch_uint("_data_v", "timestamp")).alias(
            "message_timestamp"
        ),
        *split_cols,
    )


def variant_roundtrip(df: DataFrame, col: str) -> DataFrame:
    """String -> Variant -> JSON-string round trip for ``col``: adds
    ``{col}_v`` (the parsed variant) and ``{col}_json`` (its canonical
    serialization; NULL for malformed input). Valid JSON survives the trip
    with identical semantics (key order/whitespace canonicalized)."""
    v = F.try_parse_json(F.col(col))
    return df.withColumn(f"{col}_v", v).withColumn(f"{col}_json", F.to_json(v))
