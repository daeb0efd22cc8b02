"""Connected-components operator tests (operators/graph.py)."""

from __future__ import annotations

from go_nats_to_clickhouse_spark.operators.graph import connected_components


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    rows = connected_components(edges).collect()
    return {r["node"]: r["component"] for r in rows}


def test_single_chain_converges_to_min(spark):
    # a path graph needs diameter-many rounds — exercises the loop
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components(spark):
    got = _cc(spark, [(10, 11), (11, 12), (20, 21)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_star_and_clique_mix(spark):
    got = _cc(spark, [(7, 3), (7, 5), (2, 5), (100, 101), (101, 100)])
    assert got == {3: 2, 5: 2, 7: 2, 2: 2, 100: 100, 101: 100}


def test_edge_direction_irrelevant(spark):
    assert _cc(spark, [(9, 1)]) == _cc(spark, [(1, 9)])


def test_long_chain_converges_fast_with_shortcut(spark):
    # A 300-node path has diameter 299: plain min-propagation cannot finish
    # in 12 rounds, pointer-doubling must (2^12 >> 299). This pins the
    # O(log d) convergence claim, not just correctness.
    from go_nats_to_clickhouse_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(299)], "doc_a long, doc_b long"
    )
    out = connected_components(edges, max_iter=12, shortcut=True).collect()
    assert len(out) == 300
    assert all(r.component == 0 for r in out)

    partial = connected_components(edges, max_iter=12, shortcut=False).collect()
    assert any(r.component != 0 for r in partial), (
        "12 plain rounds resolved a 299-diameter chain — shortcut test is vacuous"
    )


def test_shortcut_matches_plain_on_random_graph(spark):
    import random

    from go_nats_to_clickhouse_spark.operators.graph import connected_components

    rng = random.Random(7)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    plain = sorted(
        (r.node, r.component)
        for r in connected_components(df, shortcut=False).collect()
    )
    fast = sorted(
        (r.node, r.component)
        for r in connected_components(df, shortcut=True).collect()
    )
    assert plain == fast
