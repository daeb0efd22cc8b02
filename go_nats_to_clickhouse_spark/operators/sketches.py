"""Heavy-hitter sketch: ClickHouse ``topK()`` analog (SpaceSaving /
Misra-Gries family).

The exact global top-k by frequency needs a full groupBy over every
distinct value — at 100 TB with high-cardinality keys that shuffle is
the whole job. The sketch path bounds the shuffle instead: each Arrow
batch emits at most ``capacity`` (item, lower-bound-count) rows after a
Misra-Gries truncation, so shuffle volume is O(batches * capacity),
independent of cardinality. Counts are lower bounds; the classic MG
guarantee transfers: any item with true frequency > (n / capacity)
survives every truncation and appears in the merged result.

With ``capacity`` >= the number of distinct values nothing truncates
and the result is exact — which is what lets the registry query
hash-match a plain GROUP BY oracle while the same operator stays
sub-linear when capacity is squeezed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topk_sketch(
    df: DataFrame, col: str, k: int = 10, capacity: int = 4096
) -> DataFrame:
    """Approximate top-k items of ``col`` by frequency.

    Output: (item, est_count) — est_count is a lower bound on the true
    frequency, exact when capacity >= distinct(col). Two stages: per-batch
    Misra-Gries summaries via mapInPandas, then one bounded groupBy.

    NULLs in ``col`` are excluded from the ranking (value_counts drops
    them) — unlike GROUP BY, which emits a NULL group. Null-ordering in
    ties is engine-specific anyway; sketch a COALESCE'd column if NULL
    frequency matters.
    """
    in_type = df.schema[col].dataType.simpleString()

    def summarize(batches):
        import pandas as pd

        for pdf in batches:
            counts = pdf[col].value_counts(dropna=True)  # see NULL note above
            if len(counts) > capacity:
                # MG truncation: drop the tail, charge its max count against
                # everything kept — counts become valid lower bounds.
                overflow = counts.iloc[capacity]
                counts = (counts.iloc[:capacity] - overflow).clip(lower=0)
                counts = counts[counts > 0]
            yield pd.DataFrame(
                {"item": counts.index, "cnt": counts.to_numpy().astype("int64")}
            )

    partials = df.select(col).mapInPandas(summarize, f"item {in_type}, cnt long")
    merged = partials.groupBy("item").agg(F.sum("cnt").alias("est_count"))
    return merged.orderBy(F.col("est_count").desc(), F.col("item")).limit(k)


def topk_weighted_sketch(
    df: DataFrame, col: str, weight_col: str, k: int = 10, capacity: int = 4096
) -> DataFrame:
    """ClickHouse ``topKWeighted()`` analog: top-k items by SUM of a weight
    instead of row count.

    Same SpaceSaving shape as :func:`topk_sketch` — per-batch truncated
    weight summaries via mapInPandas, one bounded groupBy — so shuffle
    volume stays O(batches * capacity) at any cardinality. The MG bound
    transfers to weights: after truncation every kept weight sum is a
    lower bound, and any item whose true weight share exceeds
    total_weight / capacity survives. Exact when capacity >= distinct.

    Weights are summed as int64 (callers quantize floats first — weighted
    rank stability across engines needs exact accumulation), and MUST be
    non-negative: a negative weight breaks the Misra-Gries lower-bound
    contract (truncation charges a positive overflow against survivors).
    Enforced, not just documented: non-integral weight columns are rejected
    at the boundary, NULL weights are dropped with their rows, and a
    negative weight fails the job loudly inside the sketch batch.
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    wtype = df.schema[weight_col].dataType
    if not isinstance(wtype, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"topk_weighted_sketch: weight column {weight_col!r} must be an "
            f"integral type (quantize floats first), got {wtype.simpleString()}"
        )
    in_type = df.schema[col].dataType.simpleString()

    def summarize(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf.dropna(subset=[col, weight_col])
            if (pdf[weight_col] < 0).any():
                raise ValueError(
                    f"topk_weighted_sketch: negative weight in {weight_col!r} "
                    "violates the Misra-Gries lower-bound contract"
                )
            sums = (
                pdf.groupby(col, sort=False)[weight_col]
                .sum()
                .sort_values(ascending=False, kind="mergesort")
            )
            if len(sums) > capacity:
                overflow = sums.iloc[capacity]
                sums = (sums.iloc[:capacity] - overflow).clip(lower=0)
                sums = sums[sums > 0]
            yield pd.DataFrame(
                {"item": sums.index, "w": sums.to_numpy().astype("int64")}
            )

    partials = df.select(col, weight_col).mapInPandas(
        summarize, f"item {in_type}, w long"
    )
    merged = partials.groupBy("item").agg(F.sum("w").alias("est_weight"))
    return merged.orderBy(F.col("est_weight").desc(), F.col("item")).limit(k)
