"""Scalar function library: ClickHouse-edge-semantics wrappers, text
analysis, and vector math — all thin compositions of built-in
``pyspark.sql.functions`` so they stay inside whole-stage codegen."""

from go_nats_to_clickhouse_spark.functions.clickhouse import (
    ch_json_extract_string,
    ch_json_extract_uint,
    ch_split_element,
    chat_id_from_subject,
    split_by_char,
    to_yyyymm,
)

__all__ = [
    "ch_json_extract_string",
    "ch_json_extract_uint",
    "ch_split_element",
    "chat_id_from_subject",
    "split_by_char",
    "to_yyyymm",
]
