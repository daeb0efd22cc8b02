"""Reference-implementation tests for the round-4 ClickHouse analog
families (queries/clickhouse_r4.py): each operator is checked against a
from-scratch Python brute force on randomized inputs, independent of the
DuckDB oracle (which proves engine agreement, not semantics)."""

from __future__ import annotations

import datetime as dt
import math
import random

from pyspark.sql import functions as F


def _random_intervals(seed: int, n_users: int = 12, max_iv: int = 14):
    rng = random.Random(seed)
    rows = []
    per_user = {}
    eid = 0
    for uid in range(n_users):
        ivs = []
        for _ in range(rng.randrange(1, max_iv)):
            s = rng.randrange(0, 5000)
            length = rng.randrange(1, 800)
            ivs.append((s, s + length))
            rows.append((eid, uid, s, s + length))
            eid += 1
        per_user[uid] = ivs
    return rows, per_user


def _covered(ivs):
    """Brute-force union length + merged count of half-open intervals."""
    ivs = sorted(ivs)
    total, count = 0, 0
    cur_s, cur_e = None, None
    for s, e in ivs:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e, count = s, e, count + 1
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        total += cur_e - cur_s
    return total, count


def _max_overlap(ivs):
    """Brute force: max concurrent [s, e) intervals and earliest instant."""
    pts = sorted([(s, 1) for s, _ in ivs] + [(e, -1) for _, e in ivs])
    best, cur, pos = 0, 0, None
    for t, d in pts:
        cur += d
        if cur > best:
            best, pos = cur, t
    return best, pos


def _islands_plan(spark, rows):
    df = spark.createDataFrame(rows, "event_id long, user_id long, s long, e long")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    pme = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    fl = df.select(
        "user_id",
        "s",
        "e",
        "event_id",
        F.when(pme.isNull() | (F.col("s") > pme), 1).otherwise(0).alias("ni"),
    )
    isl = fl.select(
        "user_id",
        "s",
        "e",
        F.sum("ni")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("island"),
    )
    return (
        isl.groupBy("user_id", "island")
        .agg((F.max("e") - F.min("s")).alias("covered"))
        .groupBy("user_id")
        .agg(F.sum("covered").alias("covered"), F.count(F.lit(1)).alias("n"))
    )


def test_interval_union_matches_bruteforce(spark):
    rows, per_user = _random_intervals(seed=42)
    got = {r.user_id: (r.covered, r.n) for r in _islands_plan(spark, rows).collect()}
    for uid, ivs in per_user.items():
        assert got[uid] == _covered(ivs), f"user {uid}: {ivs}"


def test_max_intersections_matches_bruteforce(spark):
    rows, per_user = _random_intervals(seed=77)
    df = spark.createDataFrame(rows, "event_id long, user_id long, s long, e long")
    from pyspark.sql.window import Window

    pts = df.select(
        "user_id", F.col("s").alias("t"), F.lit(1).alias("d"), "event_id"
    ).unionAll(
        df.select("user_id", F.col("e").alias("t"), F.lit(-1).alias("d"), "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("t", "d", "event_id")
    run = pts.select(
        "user_id",
        "t",
        F.sum("d")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("conc"),
    )
    mx = run.select(
        "user_id",
        "t",
        "conc",
        F.max("conc").over(Window.partitionBy("user_id")).alias("m"),
    )
    got = {
        r.user_id: (r.m, r.pos)
        for r in mx.filter(F.col("conc") == F.col("m"))
        .groupBy("user_id", "m")
        .agg(F.min("t").alias("pos"))
        .collect()
    }
    for uid, ivs in per_user.items():
        assert got[uid] == _max_overlap(ivs), f"user {uid}: {ivs}"


def test_welch_ttest_matches_textbook(spark, sf_dir):
    """Run the registry query and recompute Welch's t and Satterthwaite df
    from raw collected values with the textbook formulas."""
    from go_nats_to_clickhouse_spark.queries.clickhouse_r4 import agg_welch_ttest
    from go_nats_to_clickhouse_spark.queries.util import load_table

    row = agg_welch_ttest(spark, sf_dir).collect()[0]
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    vals = {"view": [], "click": []}
    for r in e.select("event_type", F.round("value", 3).alias("v")).collect():
        vals[r.event_type].append(float(r.v))

    def stats(xs):
        n = len(xs)
        m = sum(xs) / n
        var = sum((x - m) ** 2 for x in xs) / (n - 1)
        return n, m, var

    na, ma, va = stats(vals["view"])
    nb, mb, vb = stats(vals["click"])
    qa, qb = va / na, vb / nb
    t = (ma - mb) / math.sqrt(qa + qb)
    df = (qa + qb) ** 2 / (qa * qa / (na - 1) + qb * qb / (nb - 1))
    assert row.n_view == na and row.n_click == nb
    assert abs(row.t_stat - t) < 1e-4, (row.t_stat, t)
    assert abs(row.df - df) < max(1e-3 * df, 1e-4), (row.df, df)


def test_rank_corr_matches_scipy_free_spearman(spark):
    """Synthetic data with deliberate ties in both axes: the doubled
    average-rank construction must equal the textbook Spearman rho."""
    rng = random.Random(5)
    rows = []
    for i in range(200):
        x = rng.randrange(0, 50)  # heavy x ties
        y = rng.choice([1.0, 2.0, 2.0, 3.0, x * 0.1])  # y ties too
        rows.append(("t", i, x, y))
    df = spark.createDataFrame(rows, "event_type string, i long, x long, y double")

    def avg_ranks(xs):
        order = sorted(range(len(xs)), key=lambda i: xs[i])
        ranks = [0.0] * len(xs)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and xs[order[j]] == xs[order[i]]:
                j += 1
            avg = (i + 1 + j) / 2.0  # ranks are 1-based; mean of i+1..j
            for k in range(i, j):
                ranks[order[k]] = avg
            i = j
        return ranks

    xs = [r[2] for r in rows]
    ys = [r[3] for r in rows]
    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(rows)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    want = cov / math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )

    from pyspark.sql.window import Window

    wx = Window.partitionBy("event_type").orderBy("x")
    wy = Window.partitionBy("event_type").orderBy("y")
    rxc = (
        F.lit(2) * F.rank().over(wx)
        + F.count(F.lit(1)).over(Window.partitionBy("event_type", "x"))
        - F.lit(1)
    ).cast("long")
    ryc = (
        F.lit(2) * F.rank().over(wy)
        + F.count(F.lit(1)).over(Window.partitionBy("event_type", "y"))
        - F.lit(1)
    ).cast("long")
    r = df.select("event_type", rxc.alias("rx"), ryc.alias("ry"))
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").cast("double").alias("sx"),
        F.sum("ry").cast("double").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("double").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("double").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("double").alias("syy"),
    )
    nn = F.col("n").cast("double")
    rho = (nn * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (nn * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (nn * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    got = s.select(rho.alias("rho")).collect()[0].rho
    assert abs(got - want) < 1e-12, (got, want)


def test_vector_distances_match_numpy(spark, sf_dir):
    import numpy as np

    from go_nats_to_clickhouse_spark.queries.clickhouse_r4 import (
        _PROBE_VEC,
        vector_distance_functions,
    )
    from go_nats_to_clickhouse_spark.queries.util import load_table

    got = {r.vec_id: r for r in vector_distance_functions(spark, sf_dir).collect()}
    p = np.array(_PROBE_VEC)
    emb = {
        r.vec_id: np.array(r.embedding, dtype="float64")
        for r in load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 20)
        .collect()
    }
    for vid, v in emb.items():
        r = got[vid]
        assert abs(r.l1_dist - np.abs(v - p).sum()) < 1e-5
        assert abs(r.l2_dist - math.sqrt(((v - p) ** 2).sum())) < 1e-5
        assert abs(r.linf_dist - np.abs(v - p).max()) < 1e-5
        assert abs(r.dot_p - float(v @ p)) < 1e-5
        want_cos = 1.0 - float(v @ p) / (
            math.sqrt(float(v @ v)) * math.sqrt(float(p @ p))
        )
        assert abs(r.cosine_dist - want_cos) < 1e-5
