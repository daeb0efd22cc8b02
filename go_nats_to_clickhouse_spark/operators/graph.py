"""Connected components over a pair graph — dedup cluster assignment.

The near-dup pipeline (MinHash-LSH → candidate pairs) ends with "which
documents form one duplicate cluster, and which single doc survives?" —
that is connected components over the pair graph. This implements
iterative min-label propagation with the DataFrame API:

* label(v) starts as v; each round every vertex takes the min label among
  itself and its neighbors; fixpoint = component id = min doc_id in the
  component (deterministic, engine-portable).
* rounds needed = graph diameter. Near-dup graphs are dense little cliques
  (stars after the LSH flood guard), so diameter is tiny; ``max_iter``
  bounds pathological chains. (At extreme scale the large-star/small-star
  contraction [Kiveris et al., "Connected Components in MapReduce and
  Beyond"] converges in O(log n) rounds; min-propagation is chosen here
  for portability — every round is one join + one aggregate, and the
  oracle can replay it as a recursive CTE.)
* every round ``localCheckpoint``s its label table — the canonical lineage
  truncation for iterative DataFrame algorithms: plans stay O(1) deep
  instead of growing a join per round, and each round's input reads
  executor-local blocks. (Tradeoff, as with all localCheckpoint use: blocks
  are not recomputable after executor loss; a cluster deployment that needs
  that durability swaps in ``checkpoint()`` on a reliable dir.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    shortcut: bool = False,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    min node id reachable. Converges when a full round changes no label.

    ``shortcut=True`` adds pointer-doubling to every round: each node also
    adopts its current label's label (``label(label(v))``), so label
    information travels 2^r hops after r rounds instead of r — the
    classic shortcutting step that turns O(diameter) convergence into
    O(log diameter). OFF by default: near-dup graphs are shallow
    stars/cliques where the extra label-to-label join per round is pure
    overhead (measured ~1.5x on the registry query); turn it on for
    adversarial shapes (a 10^6-node chain needs ~20 shortcut rounds, not
    10^6 plain ones)."""
    from pyspark import StorageLevel

    spark = edges.sparkSession
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = fwd.union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    und = und.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    n_edges = und.count()  # materializes the persist; also sizes the loop
    if n_edges == 0:
        # No edges -> no non-trivial components. Short-circuit the whole
        # loop machinery (repartition+persist, label checkpoint, >= 1
        # round job, ~1.5 s of pure fixed overhead at any scale) — the
        # common case for incremental-batch graphs where the new batch has
        # no internal near-dups (pipeline_manifest_incremental).
        und.unpersist()
        return und.select(
            F.col("u").alias("node"), F.col("u").alias("component")
        ).limit(0)

    # Iteration cost is (jobs/round) x (fixed per-partition overhead), so
    # over-partitioning a small label table multiplies pure overhead by the
    # round count. Size the shuffle width to the edge count (~500k edges
    # per partition) instead of inheriting the engine-wide default; a
    # 100 TB pair graph scales the same formula up, capped by the session
    # conf. Restored after the loop.
    conf_key = "spark.sql.shuffle.partitions"
    saved_parts = spark.conf.get(conf_key)
    parts = max(4, min(int(saved_parts), 1 + n_edges // 500_000))
    spark.conf.set(conf_key, str(parts))
    try:
        # Pre-hash und by the per-round join key: Catalyst sees the existing
        # HashPartitioning(v, parts) and skips re-exchanging the (static)
        # edge side every round — only the small evolving label table moves.
        und_by_v = und.repartition(parts, "v").persist(StorageLevel.MEMORY_AND_DISK)

        # Seed labels one propagation step ahead: label0(v) = min(v, N(v))
        # — the same single aggregate a plain node-list init costs, but
        # stars and cliques (the shapes the LSH flood guard emits) are
        # ALREADY at fixpoint, so the loop exits after one verification
        # round instead of two. Valid for every graph: min over self and
        # direct neighbors is always a same-component node id, and the
        # min-label fixpoint is init-independent for any such seeding
        # (VERDICT r4 #5 — this generalizes the per-bucket-representative
        # idea to graphs whose edges were verification-filtered, where a
        # bucket rep may NOT be a neighbor and would poison the label).
        # LAZY checkpoint (r12): the seed is consumed only inside round 1
        # (the neigh join and the stepped join share the one checkpointed
        # RDD, materialized once when that job runs), so an EAGER seed job
        # paid one extra driver action per CC call for nothing — measured
        # ~0.3-0.5 s of the ~1.6 s fixed floor a 4-edge graph was paying.
        # Rounds >= 2 read the previous round's stepped checkpoint, so
        # plan depth stays O(1) exactly as before.
        labels = (
            und.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select(
                F.col("u").alias("node"),
                F.least(F.col("u"), F.col("_mn")).alias("label"),
            )
            .localCheckpoint(eager=False)
        )

        changed = 0
        for _ in range(max_iter):
            neigh = (
                und_by_v.join(labels, und_by_v["v"] == labels["node"])
                .groupBy("u")
                .agg(F.min("label").alias("nlabel"))
            )
            if shortcut:
                # pointer doubling: label(label(v)) — resolves each node's
                # label one extra hop through the CURRENT label table, so
                # chains collapse in O(log d) rounds. The grand table is
                # the same size as labels; the join key is its label.
                grand = labels.select(
                    F.col("node").alias("g_node"), F.col("label").alias("g_label")
                )
                hop = (
                    labels.join(grand, labels["label"] == grand["g_node"])
                    .select(F.col("node").alias("u"), F.col("g_label").alias("nlabel"))
                )
                neigh = neigh.unionByName(hop).groupBy("u").agg(
                    F.min("nlabel").alias("nlabel")
                )
            # Carry the pre-step label through the checkpoint so convergence
            # detection is a filter over the materialized frame, not a second
            # node==node join per round. The checkpoint is LAZY: the changed
            # count below is the action that materializes it, so each round
            # runs one job, not two.
            stepped = (
                labels.join(neigh, labels["node"] == neigh["u"], "left")
                .select(
                    "node",
                    F.col("label").alias("old_label"),
                    F.least(
                        F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                    ).alias("label"),
                )
                .localCheckpoint(eager=False)
            )
            changed = stepped.filter(F.col("label") != F.col("old_label")).count()
            labels = stepped.select("node", "label")
            if changed == 0:
                break
        if changed != 0:
            # Exiting with unconverged labels silently returns WRONG
            # components (a >max_iter-diameter chain keeps stale labels) that
            # would only surface as an opaque downstream mismatch — make the
            # failure loud so the caller raises max_iter or sets shortcut.
            import warnings

            warnings.warn(
                f"connected_components: {changed} labels still changing after "
                f"max_iter={max_iter} rounds (graph diameter exceeds the "
                "budget) — result is NOT a fixpoint; raise max_iter or use "
                "shortcut=True",
                RuntimeWarning,
                stacklevel=2,
            )
        und_by_v.unpersist()
        und.unpersist()
    finally:
        spark.conf.set(conf_key, saved_parts)
    return labels.select("node", F.col("label").alias("component"))
