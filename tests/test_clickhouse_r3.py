"""Semantics tests for the round-3 ClickHouse analogs, on handcrafted
fixtures that hit edges the sf data does not (funnel chains straddling the
window boundary, weighted quantile interpolation, non-ASCII encoding)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ev(spark, rows):
    base = dt.datetime(2024, 1, 1)
    data = [
        (i, base + dt.timedelta(seconds=s), uid, et, 0.0, "{}")
        for i, (uid, et, s) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def _funnel(spark, events_df):
    """Run window_funnel_depth's core against an in-memory events frame by
    monkey-free re-composition: same operator chain as the query."""
    from go_nats_to_clickhouse_spark.operators.range_join import range_join

    e = events_df
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
    return {
        r.user_id: r.funnel_depth
        for r in depth.groupBy(F.col("v_user").alias("user_id"))
        .agg(F.max("depth").cast("int").alias("funnel_depth"))
        .collect()
    }


def test_funnel_depths(spark):
    got = _funnel(spark, _ev(spark, [
        # user 1: full chain inside the hour -> 3
        (1, "view", 0), (1, "click", 600), (1, "purchase", 1200),
        # user 2: click but purchase BEFORE the click -> 2
        (2, "view", 0), (2, "purchase", 100), (2, "click", 600),
        # user 3: view only -> 1
        (3, "view", 0),
        # user 4: click lands exactly at the window edge (3600s, closed
        # right -> included); purchase just past it -> 2
        (4, "view", 0), (4, "click", 3600), (4, "purchase", 3601),
        # user 5: chain completes only from the SECOND view's window -> 3
        (5, "view", 0), (5, "view", 7000), (5, "click", 7300), (5, "purchase", 7600),
        # user 6: no view at all -> absent from output
        (6, "click", 0), (6, "purchase", 10),
    ]))
    assert got == {1: 3, 2: 2, 3: 1, 4: 2, 5: 3}


def test_funnel_same_instant_click_excluded(spark):
    # closed="right" means a click at exactly the view's timestamp does
    # NOT count (strictly after), and a purchase at exactly the click's
    # timestamp does not complete the chain (strict >).
    got = _funnel(spark, _ev(spark, [
        (1, "view", 0), (1, "click", 0),            # same instant -> depth 1
        (2, "view", 0), (2, "click", 5), (2, "purchase", 5),  # p == c -> depth 2
    ]))
    assert got == {1: 1, 2: 2}


def test_weighted_percentile_matches_expanded_multiset(spark):
    # weights expand to the multiset [1, 2,2, 9,9,9]: median = (2+9)/2? No -
    # continuous quantile at p=0.5 over n=6 sits at index 2.5 -> 2 + 0.5*(9-2).
    df = spark.createDataFrame([(1.0, 1), (2.0, 2), (9.0, 3)], "x double, w int")
    got = df.agg(F.expr("percentile(x, 0.5, w)").alias("m")).collect()[0].m
    import numpy as np

    want = float(np.percentile([1, 2, 2, 9, 9, 9], 50))
    assert abs(got - want) < 1e-9


def test_encoding_roundtrip_non_ascii(spark):
    df = spark.createDataFrame([("héllo",), ("数据",)], "s string")
    out = df.select(
        (F.decode(F.unhex(F.hex(F.col("s"))), "UTF-8") == F.col("s")).alias("hex_ok"),
        (F.decode(F.unbase64(F.base64(F.col("s").cast("binary"))), "UTF-8") == F.col("s")).alias("b64_ok"),
    ).collect()
    assert all(r.hex_ok and r.b64_ok for r in out)


def test_sequence_count_greedy_blocks(spark):
    # Greedy non-overlapping view->purchase matching equals counting
    # purchases whose immediately-preceding (filtered) row is a view:
    # V V P P V P -> 2;  P V P -> 1;  V V -> 0;  P P -> 0.
    from pyspark.sql.window import Window

    rows = []
    seqs = {1: "VVPPVP", 2: "PVP", 3: "VV", 4: "PP"}
    for uid, s in seqs.items():
        for i, ch in enumerate(s):
            rows.append((uid * 100 + i, dt.datetime(2024, 1, 1, 0, 0, i), uid,
                         "view" if ch == "V" else "purchase"))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    vp = df.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev"))
    got = {
        r.user_id: r.n
        for r in vp.groupBy("user_id").agg(
            F.count(F.when((F.col("event_type") == "purchase") & (F.col("prev") == "view"), 1)).alias("n")
        ).collect()
    }
    assert got == {1: 2, 2: 1, 3: 0, 4: 0}


def test_time_decayed_sum_telescoping_matches_direct(spark):
    # The telescoped running-sum form must equal the direct
    # sum-over-history definition sum_j v_j * exp(-(t_i - t_j)/tau).
    import math

    ts = [0.0, 10.0, 25.0, 100.0]
    vals = [1.0, 2.0, 4.0, 8.0]
    tau = 30.0
    direct = [
        sum(v * math.exp(-(t_i - t_j) / tau) for t_j, v in zip(ts, vals) if t_j <= t_i)
        for t_i in ts
    ]
    rows = [(1, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), v) for s, v in zip(ts, vals)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    from pyspark.sql.window import Window

    tsec = F.unix_micros("ts").cast("double") / F.lit(1e6)
    wuser = Window.partitionBy("user_id")
    wrun = Window.partitionBy("user_id").orderBy("ts").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (
        df.select("user_id", "ts", "value", (tsec - F.min(tsec).over(wuser)).alias("trel"))
        .select("trel", F.sum(F.col("value") * F.exp(F.col("trel") / tau)).over(wrun).alias("wsum"))
        .select((F.exp(-F.col("trel") / tau) * F.col("wsum")).alias("ds"))
        .collect()
    )
    for got, want in zip([r.ds for r in out], direct):
        assert abs(got - want) < 1e-9


def test_incremental_lsh_cross_corpus_only(spark):
    # A new doc identical to a corpus doc must collide (est_jaccard 1.0);
    # new-new and corpus-corpus pairs must NOT be emitted.
    from go_nats_to_clickhouse_spark.operators.dedup import incremental_lsh_pairs

    text = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different words about unrelated topics entirely here now"
    new_docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"  # 1 and 2 are near-dups of each other
    )
    corpus = spark.createDataFrame(
        [(100, text), (101, other)], "doc_id long, text string"
    )
    got = incremental_lsh_pairs(new_docs, corpus, num_hashes=16, bands=4).collect()
    pairs = {(r.new_id, r.corpus_id): r.est_jaccard for r in got}
    assert pairs.get((1, 100)) == 1.0
    assert pairs.get((2, 100)) == 1.0
    assert all(cid != 101 for (_, cid) in pairs), "unrelated corpus doc collided"
    assert all(nid in (1, 2) and cid == 100 for (nid, cid) in pairs)


def test_priority_list_names_all_registered():
    # A typo in __spark_entry__._PRIORITY silently drops that query from
    # the driver's 50-row sample window — fail loudly instead.
    import __spark_entry__ as m
    from go_nats_to_clickhouse_spark.queries import ORACLES, QUERIES

    missing = [n for n in m._PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    assert len(set(m._PRIORITY)) == len(m._PRIORITY), "duplicate priority names"
    ordered = list(m.queries())
    assert ordered[: len(m._PRIORITY)] == m._PRIORITY
    assert set(m.queries()) == set(m.oracle_sql()) == set(QUERIES) == set(ORACLES)
