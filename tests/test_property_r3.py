"""Randomized equivalence tests for the round-3 behavioral analogs.

Each test batches many generated cases into ONE DataFrame and compares
against a from-scratch Python reference in a single job — property-style
coverage without a Spark job per example.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _random_sequences(seed: int, n_users: int = 60, max_len: int = 12):
    rng = random.Random(seed)
    out = {}
    for uid in range(n_users):
        out[uid] = [rng.choice("VPO") for _ in range(rng.randrange(0, max_len))]
    return out


def _greedy_count(seq: list[str]) -> int:
    """Reference greedy automaton: non-overlapping V->P chains."""
    count, open_view = 0, False
    for ch in seq:
        if ch == "V":
            open_view = True
        elif ch == "P" and open_view:
            count += 1
            open_view = False
    return count


def test_sequence_count_equals_greedy_automaton(spark):
    # The lag-expression form counts purchases whose immediately preceding
    # FILTERED row is a view; prove it equals the greedy automaton on
    # random V/P/other sequences (other events must not break chains:
    # ClickHouse sequenceCount's (?1)(?2) matches across gaps).
    seqs = _random_sequences(seed=1234)
    rows = []
    for uid, seq in seqs.items():
        for i, ch in enumerate(seq):
            et = {"V": "view", "P": "purchase", "O": "other"}[ch]
            rows.append((uid * 1000 + i, dt.datetime(2024, 1, 1, 0, 0, i), uid, et))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    vp = df.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev")
    )
    got = {
        r.user_id: r.n
        for r in vp.groupBy("user_id")
        .agg(
            F.count(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("prev") == "view"), 1
                )
            ).alias("n")
        )
        .collect()
    }
    for uid, seq in seqs.items():
        filtered = [c for c in seq if c in "VP"]
        want = _greedy_count(filtered)
        assert got.get(uid, 0) == want, f"user {uid} seq {''.join(seq)}"


def test_funnel_depth_equals_bruteforce(spark):
    # window_funnel_depth's min-click < max-purchase formulation per view
    # window must equal the brute-force "exists v < c < p within 1h of v".
    rng = random.Random(99)
    rows = []
    events = {}
    for uid in range(40):
        evs = []
        t = 0
        for i in range(rng.randrange(1, 10)):
            t += rng.randrange(1, 3000)
            et = rng.choice(["view", "click", "purchase"])
            evs.append((t, et))
        events[uid] = evs
        for j, (t, et) in enumerate(evs):
            rows.append(
                (uid * 100 + j, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t), uid, et)
            )

    def brute_depth(evs):
        views = [t for t, e in evs if e == "view"]
        if not views:
            return None
        depth = 1
        for v in views:
            clicks = [t for t, e in evs if e == "click" and v < t <= v + 3600]
            if clicks:
                depth = max(depth, 2)
                for c in clicks:
                    if any(
                        e == "purchase" and c < t <= v + 3600 for t, e in evs
                    ):
                        depth = max(depth, 3)
        return depth

    from go_nats_to_clickhouse_spark.operators.range_join import range_join

    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("vts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("vend"),
    )
    steps = e.filter(F.col("event_type").isin("click", "purchase")).select(
        F.col("user_id").alias("s_user"),
        F.col("event_type").alias("s_type"),
        F.col("ts").alias("s_ts"),
    )
    hits = range_join(
        steps, views,
        point="s_ts", start="vts", end="vend",
        bucket_width=3600, closed="right", equi=[("s_user", "v_user")],
    )
    per_view = hits.groupBy("vid", "v_user").agg(
        F.min(F.when(F.col("s_type") == "click", F.col("s_ts"))).alias("first_click"),
        F.max(F.when(F.col("s_type") == "purchase", F.col("s_ts"))).alias("last_purchase"),
    )
    depth = views.join(per_view, ["vid", "v_user"], "left").select(
        "v_user",
        (
            F.lit(1)
            + F.when(F.col("first_click").isNotNull(), 1).otherwise(0)
            + F.when(
                F.col("first_click").isNotNull()
                & (F.col("last_purchase") > F.col("first_click")),
                1,
            ).otherwise(0)
        ).alias("depth"),
    )
    got = {
        r.user_id: r.d
        for r in depth.groupBy(F.col("v_user").alias("user_id"))
        .agg(F.max("depth").alias("d"))
        .collect()
    }
    for uid, evs in events.items():
        want = brute_depth(evs)
        assert got.get(uid) == want, f"user {uid}: {evs}"
