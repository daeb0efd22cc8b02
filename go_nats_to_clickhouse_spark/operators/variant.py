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
