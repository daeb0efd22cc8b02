"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join splitting handles most runtime skew automatically
(enabled in session.py); explicit salting remains the tool when one side's
hot keys are known in advance or when the skew is in an aggregation (AQE
does not split skewed groupBy keys). At 100 TB a single hot key (one
celebrity chat_id, one default subject) otherwise pins the job on one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s hot keys are spread over n_salts partitions.

    big gets a salt in [0, n_salts) derived from key-hash plus the row's
    partition/offset id — NOT row content, on purpose: identical rows (the
    degenerate-skew case) must still spread across reducers, which a
    content hash cannot do. The salt can therefore differ across
    recomputations of a non-deterministic upstream stage; results stay
    correct regardless because the small side carries every salt value.
    small is replicated n_salts times with every salt. The join key becomes
    (key, salt) — a hot key's rows now land on n_salts reducers instead of
    one. Cost: small side inflated n_salts x (fine — it is the small side
    by assumption).
    """
    salt = F.pmod(F.hash(F.col(key)) + F.monotonically_increasing_id(), n_salts).cast(
        "int"
    )
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")


def salted_count(
    df: DataFrame, key: str, n_salts: int = 8, agg_col: str | None = None
) -> DataFrame:
    """Two-phase skew-safe aggregation: count (or sum of agg_col) per key.

    Phase 1 aggregates on (key, salt) — hot keys split across reducers;
    phase 2 merges the n_salts partials per key. Same result as a direct
    groupBy, bounded task size.
    """
    salt = F.pmod(F.monotonically_increasing_id(), n_salts).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n")
            if agg_col is None
            else F.sum(agg_col).alias("_n")
        )
    )
    return partial.groupBy(key).agg(F.sum("_n").alias("n"))
