"""Semantic pins for the ClickHouse parametric-aggregate analogs
(queries/clickhouse_aggs.py): argMax tie-breaking, groupArray
determinism, sumMap extraction, sequenceMatch equivalence.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.queries.clickhouse_aggs import (
    agg_argmax_latest_event,
    agg_group_array_types,
    agg_sequence_match,
    agg_sum_map_props,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )


TS = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _later(seconds):
    return TS + datetime.timedelta(seconds=seconds)


class TestArgMax:
    def test_ties_break_on_event_id(self, spark, tmp_path, monkeypatch):
        # Two events share the max ts — the larger event_id must win,
        # on every engine and under any partitioning.
        rows = [
            (1, TS, 7, "view", 1.0, "{}"),
            (2, TS, 7, "click", 2.0, "{}"),
            (0, _later(-10), 7, "open", 0.0, "{}"),
        ]
        df = _events(spark, rows)
        monkeypatch.setattr(
            "go_nats_to_clickhouse_spark.queries.clickhouse_aggs.load_table",
            lambda _s, _d, _n: df,
        )
        [r] = agg_argmax_latest_event(spark, "unused").collect()
        assert r.last_event_type == "click"
        assert r.last_value == 2.0
        assert r.first_event_type == "open"
        assert r.n_events == 3


class TestGroupArray:
    def test_sorted_distinct(self, spark, monkeypatch):
        rows = [
            (1, TS, 1, "b", 0.0, "{}"),
            (2, _later(1), 1, "a", 0.0, "{}"),
            (3, _later(2), 1, "b", 0.0, "{}"),
        ]
        monkeypatch.setattr(
            "go_nats_to_clickhouse_spark.queries.clickhouse_aggs.load_table",
            lambda _s, _d, _n: _events(spark, rows),
        )
        [r] = agg_group_array_types(spark, "unused").collect()
        # comma-joined sorted set: scalar output so comparison harnesses
        # can hash it (raw array cells are unhashable in pandas canon)
        assert r.event_types == "a,b"
        assert r.n_types == 2


class TestSumMap:
    def test_missing_key_is_null_not_zero(self, spark, monkeypatch):
        rows = [
            (1, TS, 1, "view", 0.0, '{"k": 5}'),
            (2, _later(1), 1, "view", 0.0, "{}"),
            (3, _later(2), 1, "view", 0.0, '{"k": 7}'),
        ]
        monkeypatch.setattr(
            "go_nats_to_clickhouse_spark.queries.clickhouse_aggs.load_table",
            lambda _s, _d, _n: _events(spark, rows),
        )
        [r] = agg_sum_map_props(spark, "unused").collect()
        assert r.sum_k == 12
        assert r.n_with_k == 2  # the {} row contributes nothing
        assert r.max_k == 7


class TestSequenceMatch:
    def test_order_matters(self, spark, monkeypatch):
        rows = [
            # user 1: purchase BEFORE view -> no match
            (1, TS, 1, "purchase", 0.0, "{}"),
            (2, _later(5), 1, "view", 0.0, "{}"),
            # user 2: view then purchase -> match
            (3, TS, 2, "view", 0.0, "{}"),
            (4, _later(5), 2, "purchase", 0.0, "{}"),
            # user 3: only unrelated events -> filtered out entirely
            (5, TS, 3, "scroll", 0.0, "{}"),
        ]
        monkeypatch.setattr(
            "go_nats_to_clickhouse_spark.queries.clickhouse_aggs.load_table",
            lambda _s, _d, _n: _events(spark, rows),
        )
        got = {
            r.user_id: r.matched
            for r in agg_sequence_match(spark, "unused").collect()
        }
        assert got == {1: False, 2: True}
