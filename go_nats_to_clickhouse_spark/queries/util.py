"""Shared helpers for oracle-checked queries.

Numeric strategy: the driver hash-compares Spark results against DuckDB.
Floating-point SUMs are order-dependent, so two engines summing the same
doubles disagree in the last bits. Every money/quantity aggregate therefore:

1. casts the input to an exact DECIMAL (amounts have <= 2 fractional
   digits in this dataset, rates 2),
2. aggregates exactly (decimal arithmetic — engine-independent),
3. rounds to a fixed scale and casts to DOUBLE for output.

The decimal widths are chosen so intermediate products stay within both
engines' 38-digit cap (price(12,2) * rate(5,2) * rate(5,2) -> scale 6,
precision 24 — exact everywhere).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.schemas import load_table  # noqa: F401  (re-export)

#: decimal type for money/quantity columns (values have 2 fractional digits)
MONEY = "decimal(12,2)"
#: decimal type for small rates (discount, tax)
RATE = "decimal(4,2)"


def dec(col: Column | str, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(expr: Column, alias: str, scale: int = 2) -> Column:
    """Exact decimal SUM -> ROUND(scale) -> DOUBLE, aliased."""
    return F.round(F.sum(expr), scale).cast("double").alias(alias)



