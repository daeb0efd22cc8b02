"""Reference-implementation tests for the round-4 second-wave ClickHouse
analog families (queries/clickhouse_r5.py): each operator is checked
against a from-scratch Python brute force, independent of the DuckDB
oracle (which proves engine agreement, not semantics)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _two_sample_values(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.util import load_table

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    vals = {"view": [], "click": []}
    for r in e.select("event_type", F.round("value", 2).alias("v")).collect():
        vals[r.event_type].append(round(float(r.v), 2))
    return vals["view"], vals["click"]


def _avg_ranks(combined):
    """Textbook average ranks (1-based, ties share the mean rank)."""
    order = sorted(range(len(combined)), key=lambda i: combined[i])
    ranks = [0.0] * len(combined)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and combined[order[j + 1]] == combined[order[i]]:
            j += 1
        avg = (i + j + 2) / 2.0  # mean of 1-based positions i+1 .. j+1
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


def test_mann_whitney_matches_textbook(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import agg_mann_whitney

    row = agg_mann_whitney(spark, sf_dir).collect()[0]
    a, b = _two_sample_values(spark, sf_dir)
    combined = a + b
    ranks = _avg_ranks(combined)
    n1, n2 = len(a), len(b)
    r1 = sum(ranks[: len(a)])
    u1 = r1 - n1 * (n1 + 1) / 2.0
    # tie correction over tie-group sizes
    from collections import Counter

    tie = sum(c**3 - c for c in Counter(combined).values())
    n = n1 + n2
    var = n1 * n2 / 12.0 * ((n + 1) - tie / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    assert row.n1 == n1 and row.n2 == n2
    assert abs(row.u1 - u1) < 1e-6, (row.u1, u1)
    assert abs(row.z - z) < 1e-5, (row.z, z)


def test_ks_matches_bruteforce(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import agg_ks_test

    row = agg_ks_test(spark, sf_dir).collect()[0]
    a, b = _two_sample_values(spark, sf_dir)
    n1, n2 = len(a), len(b)
    xs = sorted(set(a + b))
    sa, sb = sorted(a), sorted(b)

    import bisect

    best, best_at = -1, None
    for x in xs:
        c1 = bisect.bisect_right(sa, x)
        c2 = bisect.bisect_right(sb, x)
        gap = abs(c1 * n2 - c2 * n1)
        if gap > best:
            best, best_at = gap, x
    assert row.n1 == n1 and row.n2 == n2
    assert row.d_num == best
    assert abs(row.ks_d - best / (n1 * n2)) < 1e-12
    assert abs(row.ks_at - best_at) < 1e-9


def test_theils_u_matches_bruteforce(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import agg_theils_u
    from go_nats_to_clickhouse_spark.queries.util import load_table

    row = agg_theils_u(spark, sf_dir).collect()[0]
    cells = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .select("event_type", (F.col("user_id") % 10).alias("y"))
        .collect()
    ):
        cells[(r.event_type, r.y)] = cells.get((r.event_type, r.y), 0) + 1
    n = sum(cells.values())

    def entropy(counts):
        return -sum(c / n * math.log(c / n) for c in counts)

    xs = {}
    ys = {}
    for (x, y), c in cells.items():
        xs[x] = xs.get(x, 0) + c
        ys[y] = ys.get(y, 0) + c
    h_x = entropy(xs.values())
    # H(X|Y) = H(X,Y) - H(Y)
    h_xy = entropy(cells.values()) - entropy(ys.values())
    u = (h_x - h_xy) / h_x
    assert abs(row.h_x - h_x) < 1e-5
    assert abs(row.h_x_given_y - h_xy) < 1e-5
    assert abs(row.theils_u - u) < 1e-5


def test_categorical_iv_matches_bruteforce(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        agg_categorical_iv,
    )
    from go_nats_to_clickhouse_spark.queries.util import load_table

    rows = agg_categorical_iv(spark, sf_dir).collect()
    seg = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .select((F.col("user_id") % 10).alias("s"), "event_type")
        .collect()
    ):
        g, b = seg.get(r.s, (0, 0))
        if r.event_type == "purchase":
            seg[r.s] = (g, b + 1)
        else:
            seg[r.s] = (g + 1, b)
    tg = sum(g for g, _ in seg.values())
    tb = sum(b for _, b in seg.values())
    iv = 0.0
    for r in rows:
        g, b = seg[r.seg]
        assert (r.g, r.b) == (g, b)
        woe = math.log((g / tg) / (b / tb))
        assert abs(r.woe - woe) < 1e-5
        term = (g / tg - b / tb) * woe
        assert abs(r.iv_term - term) < 1e-5
        iv += term
    assert abs(rows[0].iv_total - iv) < 1e-4


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_string_distance_matches_python(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        scalar_string_distance,
    )

    got = {r.doc_id: r for r in scalar_string_distance(spark, sf_dir).collect()}
    tbl = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    checked = 0
    for doc in tbl:
        if doc["n_chars"] < 40 or checked >= 40:
            continue
        a, b = doc["text"][:16], doc["text"][16:32]
        r = got[doc["doc_id"]]
        assert r.lev == _lev(a, b), (a, b)
        assert r.ham == sum(x != y for x, y in zip(a[:8], b[:8]))
        sa, sb = set(a), set(b)
        assert abs(r.char_jaccard - len(sa & sb) / len(sa | sb)) < 1e-6
        checked += 1
    assert checked > 0


def test_lttb_pins_endpoints_and_maximizes_area(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        _LTTB_K,
        agg_lttb_downsample,
    )
    from go_nats_to_clickhouse_spark.queries.util import load_table

    out = agg_lttb_downsample(spark, sf_dir).collect()
    series = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("x"),
            F.round("value", 2).alias("y"),
        )
        .collect()
    ):
        series.setdefault(r.user_id, []).append(
            (r.x, r.event_id, float(r.y))
        )
    for uid in series:
        series[uid].sort()

    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, picks in by_user.items():
        pts = series[uid]
        cnt = len(pts)
        assert cnt >= _LTTB_K
        assert len(picks) == _LTTB_K  # every bucket non-empty, one pick each
        assert [p.bucket for p in picks] == list(range(_LTTB_K))
        # endpoints pinned
        assert picks[0].event_id == pts[0][1]
        assert picks[-1].event_id == pts[-1][1]

        # recompute the bucket-mean-anchor argmax for one middle bucket
        buckets = {}
        for rn, (x, eid, y) in enumerate(pts, 1):
            buckets.setdefault((rn - 1) * _LTTB_K // cnt, []).append(
                (x, eid, y)
            )
        b = _LTTB_K // 2
        pax = sum(x for x, _, _ in buckets[b - 1]) / len(buckets[b - 1])
        pay = sum(y for _, _, y in buckets[b - 1]) / len(buckets[b - 1])
        nax = sum(x for x, _, _ in buckets[b + 1]) / len(buckets[b + 1])
        nay = sum(y for _, _, y in buckets[b + 1]) / len(buckets[b + 1])

        def area(p):
            x, _, y = p
            return abs((pax - nax) * (y - pay) - (pax - x) * (nay - pay))

        best = max(buckets[b], key=lambda p: (area(p), -p[1]))
        assert picks[b].event_id == best[1]


def test_semantic_buckets_match_numpy(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        _N_CENTROIDS,
        _SEM_THRESHOLD,
        dedup_semantic_buckets,
    )

    got = {
        (r.vec_a, r.vec_b): (r.bucket, r.cosine)
        for r in dedup_semantic_buckets(spark, sf_dir).collect()
    }
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(tbl.column("vec_id").to_pylist())
    m = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    norms = np.linalg.norm(m, axis=1)
    cents = m[ids < _N_CENTROIDS]
    cos_c = (m @ cents.T) / np.outer(norms, np.linalg.norm(cents, axis=1))
    bucket = np.argmin(-cos_c, axis=1)  # argmax cos, tie -> lowest cid

    want = {}
    for bi in range(_N_CENTROIDS):
        members = np.where(bucket == bi)[0]
        for i_pos, i in enumerate(members):
            for j in members[i_pos + 1 :]:
                cos = float(m[i] @ m[j] / (norms[i] * norms[j]))
                if cos >= _SEM_THRESHOLD:
                    a, b = int(ids[i]), int(ids[j])
                    want[(min(a, b), max(a, b))] = bi
    assert set(got) == set(want)
    for k, bi in want.items():
        assert got[k][0] == bi


def test_student_ttest_matches_textbook(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        agg_student_ttest,
    )
    from go_nats_to_clickhouse_spark.queries.util import load_table

    row = agg_student_ttest(spark, sf_dir).collect()[0]
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    vals = {"view": [], "click": []}
    for r in e.select("event_type", F.round("value", 3).alias("v")).collect():
        vals[r.event_type].append(float(r.v))
    a, b = vals["view"], vals["click"]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    ssa = sum((x - ma) ** 2 for x in a)
    ssb = sum((x - mb) ** 2 for x in b)
    sp2 = (ssa + ssb) / (na + nb - 2)
    t = (ma - mb) / math.sqrt(sp2 * (1 / na + 1 / nb))
    assert (row.n_view, row.n_click, row.df) == (na, nb, na + nb - 2)
    assert abs(row.t_stat - t) < 1e-4, (row.t_stat, t)


def test_contingency_coefs_match_bruteforce(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        agg_contingency_coefs,
    )
    from go_nats_to_clickhouse_spark.queries.util import load_table

    row = agg_contingency_coefs(spark, sf_dir).collect()[0]
    cells = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.dayofweek("ts").alias("b"))
        .collect()
    ):
        cells[(r.event_type, r.b)] = cells.get((r.event_type, r.b), 0) + 1
    rows_tot, cols_tot = {}, {}
    for (a, b), c in cells.items():
        rows_tot[a] = rows_tot.get(a, 0) + c
        cols_tot[b] = cols_tot.get(b, 0) + c
    n = sum(cells.values())
    chi2 = sum(
        (c - rows_tot[a] * cols_tot[b] / n) ** 2
        / (rows_tot[a] * cols_tot[b] / n)
        for (a, b), c in cells.items()
    )
    r_, c_ = len(rows_tot), len(cols_tot)
    assert abs(row.chi2 - chi2) < 1e-3
    assert abs(row.contingency_coef - math.sqrt(chi2 / (chi2 + n))) < 1e-5
    phi2_bc = max(0.0, chi2 / n - (r_ - 1) * (c_ - 1) / (n - 1))
    dim = min(
        r_ - (r_ - 1) ** 2 / (n - 1), c_ - (c_ - 1) ** 2 / (n - 1)
    )
    assert abs(row.cramers_v_bc - math.sqrt(phi2_bc / dim)) < 1e-5


def test_global_shuffle_is_md5_order(spark, sf_dir):
    import hashlib

    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        _N_SHARDS,
        _SHUF_SALT,
        text_global_shuffle,
    )

    out = text_global_shuffle(spark, sf_dir).collect()
    ids = [d["doc_id"] for d in pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]).to_pylist()]
    want = {}
    by_shard = {}
    for doc_id in ids:
        h = hashlib.md5(f"{_SHUF_SALT}{doc_id}".encode()).hexdigest()
        shard = int(h[:7], 16) % _N_SHARDS
        by_shard.setdefault(shard, []).append((h, doc_id))
    for shard, lst in by_shard.items():
        for pos, (_, doc_id) in enumerate(sorted(lst), 1):
            want[doc_id] = (shard, pos)
    assert len(out) == len(ids)
    for r in out:
        assert want[r.doc_id] == (r.shard, r.pos)


def test_bigram_lm_score_matches_bruteforce(spark, sf_dir):
    from collections import Counter

    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        _LM_PREFIX_LEN,
        text_bigram_lm_score,
    )

    got = {r.doc_id: r for r in text_bigram_lm_score(spark, sf_dir).collect()}
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    cb = Counter()
    for d in docs:
        if len(d["text"]) < 2:
            continue
        s = d["text"].lower()[:_LM_PREFIX_LEN]
        for i in range(len(s) - 1):
            cb[s[i : i + 2]] += 1
    cp = Counter()
    for bg, c in cb.items():
        cp[bg[0]] += c
    checked = 0
    for d in docs[:50]:
        if len(d["text"]) < 2:
            continue
        s = d["text"].lower()[:_LM_PREFIX_LEN]
        qs = [
            round(math.log(cb[s[i : i + 2]] / cp[s[i]]) * 1e6)
            for i in range(len(s) - 1)
        ]
        want = sum(qs) / (1e6 * len(qs))
        r = got[d["doc_id"]]
        assert r.n_bigrams == len(qs)
        assert abs(r.avg_logp - want) < 1e-5, (r.avg_logp, want)
        checked += 1
    assert checked > 0


def test_quantize_int8_matches_numpy(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        vector_quantize_int8,
    )

    got = {r.vec_id: r for r in vector_quantize_int8(spark, sf_dir).collect()}
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()
    for row in tbl[:100]:
        v = np.asarray(row["embedding"], dtype=np.float64)
        maxabs = np.abs(v).max()
        if maxabs == 0:
            assert row["vec_id"] not in got
            continue
        q = np.round(v * 127.0 / maxabs).astype(np.int64)
        r = got[row["vec_id"]]
        assert r.q_sum == int(q.sum())
        assert r.q_norm2 == int((q * q).sum())
        l2 = float(np.sqrt(((v - q * maxabs / 127.0) ** 2).sum()))
        assert abs(r.l2_err - l2) < 1e-5
        assert abs(r.scale - maxabs / 127.0) < 1e-6


def test_asof_nearest_matches_pandas(spark):
    """Random distinct-timestamp data: direction='nearest' must agree with
    pandas.merge_asof(direction='nearest'); a constructed exact tie then
    pins the documented backward preference."""
    import random

    import pandas as pd

    rng = random.Random(11)
    lt = sorted(rng.sample(range(0, 500000, 7), 120))
    rt = sorted(rng.sample(range(3, 500000, 11), 90))
    ldf = pd.DataFrame(
        {
            "ts": pd.to_datetime(lt, unit="s"),
            "k": [i % 3 for i in range(len(lt))],
            "lid": range(len(lt)),
        }
    )
    rdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(rt, unit="s"),
            "k": [i % 3 for i in range(len(rt))],
            "rv": [i * 10 for i in range(len(rt))],
        }
    )
    from go_nats_to_clickhouse_spark.operators.asof import asof_join

    sl = spark.createDataFrame(ldf)
    sr = spark.createDataFrame(rdf)
    got = (
        asof_join(sl, sr, on="ts", by="k", direction="nearest")
        .orderBy("lid")
        .collect()
    )
    want = pd.merge_asof(
        ldf.sort_values("ts"),
        rdf.sort_values("ts"),
        on="ts",
        by="k",
        direction="nearest",
    ).sort_values("lid")
    for g, (_, w) in zip(got, want.iterrows()):
        assert g.lid == w["lid"]
        if pd.isna(w["rv"]):
            assert g.right_rv is None
        else:
            assert g.right_rv == w["rv"], (g.lid, g.right_rv, w["rv"])

    # exact tie: right rows 10s before AND 10s after -> backward wins
    tl = spark.createDataFrame(
        pd.DataFrame({"ts": pd.to_datetime([100], unit="s"), "k": [0]})
    )
    tr = spark.createDataFrame(
        pd.DataFrame(
            {"ts": pd.to_datetime([90, 110], unit="s"), "k": [0, 0],
             "tag": ["before", "after"]}
        )
    )
    row = asof_join(tl, tr, on="ts", by="k", direction="nearest").collect()[0]
    assert row.right_tag == "before"


def test_point_in_polygon_matches_halfplane(spark, sf_dir):
    """The pentagon is convex and CCW, so even-odd ray casting must agree
    with the independent all-edges-left half-plane test."""
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        _POLY,
        scalar_point_in_polygon,
    )

    rows = scalar_point_in_polygon(spark, sf_dir).collect()
    assert len(rows) > 0
    n = len(_POLY)
    inside_count = 0
    for r in rows:
        left_of_all = all(
            (_POLY[(i + 1) % n][0] - _POLY[i][0]) * (r.py - _POLY[i][1])
            - (_POLY[(i + 1) % n][1] - _POLY[i][1]) * (r.px - _POLY[i][0])
            > 0
            for i in range(n)
        )
        assert r.inside == left_of_all, (r.px, r.py, r.crossings)
        inside_count += r.inside
    assert 0 < inside_count < len(rows)  # both classes exercised


def test_sparkbar_levels_match_counts(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        _BAR_CHARS,
        agg_sparkbar,
    )
    from go_nats_to_clickhouse_spark.queries.util import load_table

    bars = {r.event_type: r for r in agg_sparkbar(spark, sf_dir).collect()}
    counts = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.hour("ts").alias("h"))
        .collect()
    ):
        counts.setdefault(r.event_type, [0] * 24)
        counts[r.event_type][r.h] += 1
    for et, per_hour in counts.items():
        bar = bars[et].bar
        assert len(bar) == 24
        maxc = max(per_hour)
        assert bars[et].max_hour_count == maxc
        for h, c in enumerate(per_hour):
            want = " " if c == 0 else _BAR_CHARS[int(7 * c // maxc)]
            assert bar[h] == want, (et, h, c, maxc, bar)


def test_interval_join_matches_bruteforce(spark):
    """Randomized intervals, many spanning multiple buckets: the bucketed
    overlap join must produce each overlapping pair EXACTLY once (the
    first-shared-bucket trick), matching an O(n²) brute force."""
    import random

    from go_nats_to_clickhouse_spark.operators.range_join import interval_join

    rng = random.Random(23)
    rows = []
    for i in range(300):
        s = rng.randrange(0, 10_000)
        length = rng.choice([1, 5, 50, 500, 3000])  # up to 30 buckets wide
        rows.append((i, i % 4, s, s + length))
    df = spark.createDataFrame(rows, "iid long, k long, s long, e long")
    a = df.select(
        F.col("iid").alias("ia"), F.col("k").alias("ka"),
        F.col("s").alias("sa"), F.col("e").alias("ea"),
    )
    b = df.select(
        F.col("iid").alias("ib"), F.col("k").alias("kb"),
        F.col("s").alias("sb"), F.col("e").alias("eb"),
    )
    got = (
        interval_join(
            a, b,
            left_start="sa", left_end="ea",
            right_start="sb", right_end="eb",
            bucket_width=100.0,
            equi=[("ka", "kb")],
        )
        .filter(F.col("ia") < F.col("ib"))
        .select("ia", "ib")
        .collect()
    )
    got_pairs = [(r.ia, r.ib) for r in got]
    want = set()
    for i, ki, si, ei in rows:
        for j, kj, sj, ej in rows:
            if i < j and ki == kj and si < ej and sj < ei:
                want.add((i, j))
    assert len(got_pairs) == len(set(got_pairs)), "duplicate pairs emitted"
    assert set(got_pairs) == want


def test_tfidf_keywords_match_bruteforce(spark, sf_dir):
    from collections import Counter

    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        text_tfidf_keywords,
    )

    out = {}
    for r in text_tfidf_keywords(spark, sf_dir).collect():
        out.setdefault(r.doc_id, []).append(r)
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    tf = {}
    df = Counter()
    for d in docs:
        words = [w for w in d["text"].lower().split(" ") if w]
        c = Counter(words)
        tf[d["doc_id"]] = c
        for w in c:
            df[w] += 1
    n = len([d for d in docs if tf[d["doc_id"]]])
    for d in docs[:40]:
        c = tf[d["doc_id"]]
        if not c:
            continue
        scored = sorted(
            ((t * math.log(n / df[w]), w) for w, t in c.items()),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        got = out[d["doc_id"]]
        assert [g.term for g in got] == [w for _, w in scored]
        for g, (s, w) in zip(got, scored):
            assert abs(g.tfidf - s) < 1e-5
            assert g.tf == c[w] and g.df == df[w]


def test_zorder_key_matches_python(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        scalar_zorder_key,
    )

    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    rows = scalar_zorder_key(spark, sf_dir).collect()
    assert rows
    for r in rows:
        z = morton(r.a, r.b)
        assert r.z_key == z
        assert r.z_cell == z >> 24
    # locality sanity: two points adjacent in both dims stay in nearby
    # z range (the property data skipping exploits)
    assert morton(5, 5) ^ morton(4, 4) < 1 << 6


def test_funnel_strict_order_matches_bruteforce(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        window_funnel_strict_order,
    )
    from go_nats_to_clickhouse_spark.queries.util import load_table

    got = {
        r.user_id: r.funnel_strict_order
        for r in window_funnel_strict_order(spark, sf_dir).collect()
    }
    per_user = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_id", "ts", "event_type")
        .collect()
    ):
        per_user.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, r.event_type)
        )
    import datetime as dt

    hour = dt.timedelta(hours=1)
    for uid, evs in per_user.items():
        evs.sort()
        best = 0
        for i, (ts, _, et) in enumerate(evs):
            if et != "view":
                continue
            depth = 1
            if (
                i + 1 < len(evs)
                and evs[i + 1][2] == "click"
                and evs[i + 1][0] > ts
                and evs[i + 1][0] <= ts + hour
            ):
                depth = 2
                if (
                    i + 2 < len(evs)
                    and evs[i + 2][2] == "purchase"
                    and evs[i + 2][0] <= ts + hour
                ):
                    depth = 3
            best = max(best, depth)
        if best:
            assert got[uid] == best, (uid, got[uid], best)


def test_boilerplate_ngrams_match_bruteforce(spark, sf_dir):
    from collections import Counter

    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        text_boilerplate_ngrams,
    )

    got = {
        (r.source, r.ngram): (r.df, r.df_ratio)
        for r in text_boilerplate_ngrams(spark, sf_dir).collect()
    }
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pylist()
    df = Counter()
    n_docs = Counter()
    for d in docs:
        ws = d["text"].split(" ")
        grams = {
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        } if len(ws) >= 3 else set()
        if grams:
            n_docs[d["source"]] += 1
        for g in grams:
            df[(d["source"], g)] += 1
    want = {
        k: (c, round(c / n_docs[k[0]], 6)) for k, c in df.items() if c >= 3
    }
    assert set(got) == set(want)
    for k, (c, ratio) in want.items():
        assert got[k][0] == c
        assert abs(got[k][1] - ratio) < 1e-9


def test_hard_negatives_match_numpy(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        _HN_QUERIES,
        _HN_TOPK,
        vector_hard_negatives,
    )

    got = {}
    for r in vector_hard_negatives(spark, sf_dir).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.negative_id))
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()
    ids = np.asarray([t["vec_id"] for t in tbl])
    labels = np.asarray([t["label"] for t in tbl])
    m = np.asarray([t["embedding"] for t in tbl], dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    for qpos in np.where(ids < _HN_QUERIES)[0]:
        cos = (m @ m[qpos]) / (norms * norms[qpos])
        mask = labels != labels[qpos]
        order = sorted(
            ((-c, int(i)) for c, i, ok in zip(cos, ids, mask) if ok)
        )[:_HN_TOPK]
        want = [(rk + 1, nid) for rk, (_, nid) in enumerate(order)]
        assert got[int(ids[qpos])] == want


def test_markov_transitions_match_bruteforce(spark, sf_dir):
    from collections import Counter

    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        behavioral_markov_transitions,
    )
    from go_nats_to_clickhouse_spark.queries.util import load_table

    got = {
        (r.from_type, r.to_type): (r.n, r.p)
        for r in behavioral_markov_transitions(spark, sf_dir).collect()
    }
    per_user = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "event_type")
        .collect()
    ):
        per_user.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, r.event_type)
        )
    pairs = Counter()
    for evs in per_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            pairs[(a, b)] += 1
    totals = Counter()
    for (a, _), c in pairs.items():
        totals[a] += c
    assert set(got) == set(pairs)
    for k, c in pairs.items():
        assert got[k][0] == c
        # query rounds p to 6 decimals; brute force doesn't
        assert abs(got[k][1] - c / totals[k[0]]) < 5.1e-7


def test_anomaly_mad_matches_bruteforce(spark, sf_dir):
    import statistics

    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        timeseries_anomaly_mad,
    )
    from go_nats_to_clickhouse_spark.queries.util import load_table

    got = {
        (r.user_id, r.event_id): r.score
        for r in timeseries_anomaly_mad(spark, sf_dir).collect()
    }
    per_user = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select("user_id", "event_id", F.round("value", 2).alias("x"))
        .collect()
    ):
        per_user.setdefault(r.user_id, []).append((r.event_id, float(r.x)))
    want = {}
    for uid, evs in per_user.items():
        xs = [x for _, x in evs]
        med = statistics.median(xs)  # interpolated for even n == quantile_cont
        ads = [abs(x - med) for x in xs]
        mad = statistics.median(ads)
        if mad <= 0:
            continue
        for eid, x in evs:
            score = abs(x - med) / (1.4826 * mad)
            if score > 3.0:
                want[(uid, eid)] = score
    assert set(got) == set(want)
    for k, s in want.items():
        assert abs(got[k] - s) < 1e-5


def test_period_power_matches_bruteforce(spark, sf_dir):
    from collections import Counter

    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        _PD_PERIODS,
        timeseries_period_power,
    )
    from go_nats_to_clickhouse_spark.queries.util import load_table

    got = {
        (r.event_type, r.period_hours): r.dispersion
        for r in timeseries_period_power(spark, sf_dir).collect()
    }
    hours = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .select("event_type", (F.unix_micros("ts") / 3600000000).alias("hf"))
        .collect()
    ):
        hours.setdefault(r.event_type, Counter())[int(r.hf)] += 1
    for et, hc in hours.items():
        h0 = min(hc)
        for p in _PD_PERIODS:
            s = Counter()
            for h, x in hc.items():
                s[(h - h0) % p] += x
            total = sum(s.values())
            disp = sum((p * v - total) ** 2 for v in s.values()) / (
                p * p * total
            )
            assert abs(got[(et, p)] - disp) < 1e-5, (et, p)


def test_timezone_functions_match_zoneinfo(spark, sf_dir):
    from datetime import timezone
    from zoneinfo import ZoneInfo

    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        scalar_timezone_functions,
    )

    rows = scalar_timezone_functions(spark, sf_dir).collect()
    assert rows
    from go_nats_to_clickhouse_spark.queries.util import load_table

    base = {
        r.event_id: r.ts
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select("event_id", "ts")
        .collect()
    }
    for r in rows[:200]:
        utc = base[r.event_id].replace(tzinfo=timezone.utc)
        ny = utc.astimezone(ZoneInfo("America/New_York")).replace(tzinfo=None)
        tokyo = utc.astimezone(ZoneInfo("Asia/Tokyo")).replace(tzinfo=None)
        kolkata = utc.astimezone(ZoneInfo("Asia/Kolkata")).replace(tzinfo=None)
        assert r.ny_wall == ny
        assert r.tokyo_wall == tokyo
        assert r.kolkata_wall == kolkata
        assert r.ny_hour == ny.hour
        assert r.tokyo_crosses_date == (tokyo.date() != base[r.event_id].date())
        assert r.kolkata_roundtrip_ok is True


def test_hash_functions_match_hashlib(spark, sf_dir):
    import hashlib

    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        scalar_hash_functions,
    )

    got = {r.doc_id: r for r in scalar_hash_functions(spark, sf_dir).collect()}
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    for d in docs[:60]:
        frag = d["text"][:32].encode()
        r = got[d["doc_id"]]
        assert r.md5_hex == hashlib.md5(frag).hexdigest()
        assert r.sha256_hex == hashlib.sha256(frag).hexdigest()
        h60 = int(hashlib.md5(frag).hexdigest()[:15], 16)
        assert r.md5_60bit == h60
        assert r.hash_bucket == h60 % 1024


def test_partial_state_merge_proof_holds(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        agg_partial_state_merge,
    )

    rows = agg_partial_state_merge(spark, sf_dir).collect()
    assert rows
    assert all(r.merge_equals_direct for r in rows)


def test_gopher_rules_match_bruteforce(spark, sf_dir):
    import re as _re

    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        _GOPHER_STOPWORDS,
        text_gopher_rules,
    )

    got = {r.doc_id: r for r in text_gopher_rules(spark, sf_dir).collect()}
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    n_pass = 0
    for d in docs[:80]:
        words = [w for w in d["text"].split(" ") if w]
        r = got[d["doc_id"]]
        assert r.n_words == len(words)
        mwl = sum(len(w) for w in words) / len(words) if words else 0.0
        assert abs(r.mean_word_len - mwl) < 1e-3
        alpha = (
            sum(bool(_re.fullmatch(r"[A-Za-z]+", w)) for w in words)
            / len(words)
            if words
            else 0.0
        )
        assert abs(r.alpha_frac - alpha) < 1e-3
        sym = (d["text"].count("#") + d["text"].count("…")) / max(
            len(d["text"]), 1
        )
        assert abs(r.symbol_ratio - sym) < 1e-5
        nstop = sum(w.lower() in _GOPHER_STOPWORDS for w in words)
        assert r.n_stopwords == nstop
        expect_pass = (
            50 <= len(words) <= 100000
            and 3.0 <= mwl <= 10.0
            and alpha >= 0.8
            and sym < 0.1
            and nstop >= 2
        )
        assert r.passes_gopher == expect_pass
        n_pass += expect_pass
    assert n_pass >= 0  # flags verified row-by-row above


def test_retention_matrix_matches_bruteforce(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        behavioral_retention_matrix,
    )
    from go_nats_to_clickhouse_spark.queries.util import load_table

    got = {
        (r.cohort_week, r.week_offset): (r.n_active, r.cohort_size)
        for r in behavioral_retention_matrix(spark, sf_dir).collect()
    }
    import datetime as dt

    weeks = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("week", "ts").cast("date").alias("wk"))
        .distinct()
        .collect()
    ):
        weeks.setdefault(r.user_id, set()).add(r.wk)
    cells = {}
    firsts = {u: min(ws) for u, ws in weeks.items()}
    for u, ws in weeks.items():
        w0 = firsts[u]
        for wk in ws:
            off = (wk - w0).days // 7
            cells.setdefault((w0, off), set()).add(u)
    sizes = {w0: len(us) for (w0, off), us in cells.items() if off == 0}
    want = {
        k: (len(us), sizes[k[0]]) for k, us in cells.items()
    }
    assert got == want


def test_training_manifest_composes_stages(spark, sf_dir):
    import hashlib

    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        pipeline_training_manifest,
        text_gopher_rules,
    )
    from go_nats_to_clickhouse_spark.queries.text import dedup_survivors

    out = pipeline_training_manifest(spark, sf_dir).collect()
    passed = {
        r.doc_id
        for r in text_gopher_rules(spark, sf_dir).collect()
        if r.passes_gopher
    }
    surv = {r.doc_id for r in dedup_survivors(spark, sf_dir).collect()}
    want_ids = passed & surv
    assert {r.doc_id for r in out} == want_ids
    # shard/pos are the salted-md5 order over exactly the kept set
    by_shard = {}
    for doc_id in want_ids:
        h = hashlib.md5(f"manifest-1:{doc_id}".encode()).hexdigest()
        by_shard.setdefault(int(h[:7], 16) % 8, []).append((h, doc_id))
    want = {}
    for shard, lst in by_shard.items():
        for pos, (_, doc_id) in enumerate(sorted(lst), 1):
            want[doc_id] = (shard, pos)
    for r in out:
        assert want[r.doc_id] == (r.shard, r.pos)


def test_dict_hierarchy_matches_bruteforce(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        join_dict_hierarchy,
    )

    got = {r.s_suppkey: r for r in join_dict_hierarchy(spark, sf_dir).collect()}
    sup = pq.read_table(f"{sf_dir}/supplier.parquet").to_pylist()
    nat = {n["n_nationkey"]: n for n in
           pq.read_table(f"{sf_dir}/nation.parquet").to_pylist()}
    reg = {r["r_regionkey"]: r for r in
           pq.read_table(f"{sf_dir}/region.parquet").to_pylist()}
    assert len(got) == len(sup)
    for s in sup:
        n = nat[s["s_nationkey"]]
        r = reg[n["n_regionkey"]]
        g = got[s["s_suppkey"]]
        assert g.hierarchy == f"{n['n_name']}>{r['r_name']}"
        assert g.is_in_asia == (r["r_name"] == "ASIA")


def test_interval_join_drops_degenerate_intervals(spark):
    from go_nats_to_clickhouse_spark.operators.range_join import interval_join

    rows = [
        (0, 10, 20),   # normal
        (1, 30, 30),   # empty [30, 30) — must never match
        (2, 50, 40),   # inverted — must never match (and not crash sequence())
        (3, 15, 35),   # overlaps row 0
    ]
    df = spark.createDataFrame(rows, "iid long, s long, e long")
    a = df.select(
        F.col("iid").alias("ia"), F.col("s").alias("sa"), F.col("e").alias("ea")
    )
    b = df.select(
        F.col("iid").alias("ib"), F.col("s").alias("sb"), F.col("e").alias("eb")
    )
    got = {
        (r.ia, r.ib)
        for r in interval_join(
            a, b,
            left_start="sa", left_end="ea",
            right_start="sb", right_end="eb",
            bucket_width=8.0,
        ).filter(F.col("ia") < F.col("ib")).collect()
    }
    assert got == {(0, 3)}


def test_readable_timedelta_matches_python(spark, sf_dir):
    from go_nats_to_clickhouse_spark.queries.clickhouse_r5 import (
        scalar_readable_timedelta,
    )

    rows = scalar_readable_timedelta(spark, sf_dir).collect()
    assert rows
    for r in rows[:200]:
        s = r.total_seconds
        dd, rem = divmod(s, 86400)
        hh, rem = divmod(rem, 3600)
        mm, ss = divmod(rem, 60)
        want = ""
        if dd > 0:
            want += f"{dd}d "
        if dd > 0 or hh > 0:
            want += f"{hh}h "
        want += f"{mm}m {ss}s"
        assert r.readable == want, (s, r.readable, want)
