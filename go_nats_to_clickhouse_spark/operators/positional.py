"""Distributed global row indexing + positional (PASTE) join.

ClickHouse's ``PASTE JOIN`` concatenates two relations row-by-row in
their current order — a single-node notion. The distributed analog needs
a GLOBAL row index over a total order, and the naive Spark spelling
``row_number() OVER (ORDER BY ...)`` is a scale trap: an empty window
partition key collapses the whole relation into ONE reducer task that
sorts everything.

``global_row_index`` assigns the exact same index with no single-reducer
stage, the classic two-pass shape:

1. ``repartitionByRange`` on the order columns (range exchange — Spark
   samples boundaries; equal keys land in the same partition) and
   ``sortWithinPartitions`` — a full sort, but PARALLEL per partition.
2. One tiny job counts rows per partition; cumulative offsets for each
   partition id are computed on the driver (numPartitions-bounded, KBs).
3. A map-only ``mapInPandas`` adds ``offset[pid] + local position``,
   carrying the running position across Arrow batches of the partition.

The order columns must be a TOTAL order (include a unique tiebreak key);
otherwise ties straddling Arrow batches would make indexes
nondeterministic. Index values equal ``row_number() - 1`` exactly, which
is what lets the paste-join query hash-match a window-function oracle.

Reference anchor: the reference delegates joins to ClickHouse
(init.sql); PASTE JOIN is in ClickHouse's public join-type inventory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_row_index(
    df: DataFrame,
    order_cols: list[Column | str],
    index_col: str = "pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """0-based global row index over a total order, no single-reducer sort.

    ``order_cols`` must define a total order (append a unique key). The
    output schema is the input schema plus ``index_col`` (long).
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    cols = list(df.columns)
    sorted_df = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    # Two consumers below (count pass + index pass): snapshot so the range
    # exchange + sort runs once. localCheckpoint rather than persist — the
    # repo's standing rule after the uncacheByPath incident (persist is
    # droppable; a snapshot is not), and the frame is small relative to
    # its build cost.
    snap = sorted_df.localCheckpoint(eager=True)
    counts = {
        r["__pid"]: r["cnt"]
        for r in snap.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):  # range partitions are ordered by key range
        offsets[pid] = acc
        acc += counts[pid]

    from pyspark.sql.types import LongType

    out_schema = snap.drop("__pid").schema.add(index_col, LongType())

    def add_index(batches):
        pos = None
        for pdf in batches:
            if not len(pdf):
                continue
            if pos is None:
                # one partition per invocation: every batch shares the pid
                pos = offsets[int(pdf["__pid"].iloc[0])]
            pdf = pdf.drop(columns=["__pid"])
            pdf[index_col] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield pdf

    # mapInPandas preserves within-partition row order (Arrow batches are
    # consumed and emitted in order), so local positions follow the sort.
    return snap.mapInPandas(add_index, out_schema)


def paste_join(
    left: DataFrame,
    right: DataFrame,
    left_order: list[Column | str],
    right_order: list[Column | str],
    index_col: str = "pos",
) -> DataFrame:
    """ClickHouse PASTE JOIN analog: pair the i-th row of ``left`` (under
    ``left_order``) with the i-th row of ``right`` (under ``right_order``),
    truncated to the shorter side (inner join on the global index).

    Both indexes are built by :func:`global_row_index`; the join key is
    the dense integer position, so the final shuffle is perfectly
    balanced by construction (no key skew is possible).

    The two sides must carry DISJOINT column names (ClickHouse PASTE
    JOIN has the same precondition — duplicate names are ambiguous in
    the pasted row); overlapping names raise here rather than producing
    a frame whose duplicate columns fail on first reference (ADVICE
    r7)."""
    overlap = set(left.columns) & set(right.columns)
    if index_col in left.columns or index_col in right.columns:
        overlap.add(index_col)
    if overlap:
        raise ValueError(
            f"paste_join requires disjoint column names; both sides (or the "
            f"index column {index_col!r}) carry {sorted(overlap)} — "
            "rename/prefix one side first"
        )
    li = global_row_index(left, left_order, index_col)
    ri = global_row_index(right, right_order, index_col)
    return li.join(ri, index_col)
