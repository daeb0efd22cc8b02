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
