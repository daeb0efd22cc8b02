"""ClickHouse edge-semantics as null-safe Spark column expressions.

ClickHouse scalar functions return *type default values* (empty string, 0)
instead of NULL or errors on missing/out-of-range input. Spark 4 runs ANSI
mode by default, where the naive equivalents (``element_at``, ``cast``)
throw. These wrappers reproduce the ClickHouse behavior explicitly with
null-safe built-ins (``get``, ``try_cast``, ``coalesce``) — JVM-side
expressions only, no UDFs, so they inline into whole-stage codegen and cost
nothing at 100 TB scale.

Reference semantics being reproduced:
* ``splitByChar('.', s)[n]`` — 1-based index, '' when out of range
  (init.sql:113-120).
* ``JSONExtractString(j, 'k')`` — '' when key missing/not a string
  (init.sql:109-111).
* ``JSONExtractUInt(j, 'k')`` — 0 when missing/non-numeric (init.sql:112).
* ``toYYYYMM(ts)`` — partition key, UInt32 like 202401 (init.sql:18).
* Go chat-id extraction — 4th dot-segment, '' if fewer than 4 segments
  (main.go:173-183).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def split_by_char(col: Column | str, delim: str = ".") -> Column:
    """ClickHouse ``splitByChar(delim, s)``: split on a literal character.

    ``F.split`` takes a Java regex, so the delimiter is escaped to stay a
    literal. NULL input yields NULL (callers wrap with coalesce).
    """
    escaped = "".join("\\" + ch if ch in r"\.[]{}()*+?^$|" else ch for ch in delim)
    return F.split(_col(col), escaped)


def ch_split_element(col: Column | str, n: int, delim: str = ".") -> Column:
    """``splitByChar(delim, s)[n]`` with ClickHouse defaults: 1-based index,
    empty string when the index is out of range or the input is NULL.

    ``F.get`` is 0-based and returns NULL (never throws) on out-of-range,
    even under ANSI — exactly the null-safe primitive we need.
    """
    if n < 1:
        raise ValueError("ClickHouse array indexing is 1-based; n must be >= 1")
    return F.coalesce(F.get(split_by_char(col, delim), n - 1), F.lit(""))


def chat_id_from_subject(subject: Column | str) -> Column:
    """The Go layer's chat-id extraction (main.go:173-183): 4th dot-segment
    of the subject, empty string when the subject has fewer than 4 segments.

    Identical semantics to :func:`ch_split_element` with n=4 — the reference
    implements the same rule twice (once in Go, once in SQL); we implement
    it once.
    """
    return ch_split_element(subject, 4)


def ch_json_extract_string(col: Column | str, key: str) -> Column:
    """``JSONExtractString(j, key)``: '' when the key is missing, the JSON is
    malformed, the input is NULL, **or the value is not a JSON string** —
    ClickHouse returns '' for numbers/objects/arrays/bools, whereas
    ``get_json_object`` would return their JSON text. Spark 4's variant type
    makes the per-row type test cheap: ``schema_of_variant`` is 'STRING'
    only for actual JSON strings (DuckDB analog: ``json_type(...) =
    'VARCHAR'``)."""
    field = F.try_variant_get(F.try_parse_json(_col(col)), f"$.{key}", "variant")
    return F.when(
        F.schema_of_variant(field) == F.lit("STRING"),
        F.try_variant_get(field, "$", "string"),
    ).otherwise(F.lit(""))


def ch_json_extract_uint(col: Column | str, key: str) -> Column:
    """``JSONExtractUInt(j, key)``: LongType; 0 when missing/non-numeric.

    ``try_cast`` (never throws) reproduces ClickHouse's best-effort numeric
    parse; anything unparseable becomes the UInt default 0.
    """
    extracted = F.get_json_object(_col(col), f"$.{key}")
    return F.coalesce(extracted.try_cast("long"), F.lit(0).cast("long"))


def to_yyyymm(ts: Column | str) -> Column:
    """``toYYYYMM(timestamp)``: integer like 202401 — the partition key used
    by every reference table (init.sql:18,31,45,95).

    Kept as an INT (not a string) so partition pruning compares cheaply and
    the column sorts naturally.
    """
    return F.date_format(_col(ts), "yyyyMM").cast("int")
