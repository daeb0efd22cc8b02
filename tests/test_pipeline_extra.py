"""Semantic pins for the round-2 pipeline/ClickHouse extensions:
decontamination overlap counting, sequence-packing invariants,
per-group sample determinism, moment formulas vs numpy, entropy,
moving-average frames, deltaSum reset tolerance.
"""

from __future__ import annotations

import datetime
import math

import numpy as np
from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.queries.clickhouse_more import (
    agg_delta_sum,
    agg_moving_avg,
)
from go_nats_to_clickhouse_spark.queries.pipeline_extra import (
    dedup_decontaminate,
    sample_per_group,
    text_sequence_packing,
)
from go_nats_to_clickhouse_spark.queries.stats import (
    agg_entropy,
    agg_statistical_moments,
)

TS = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )


def _patch(monkeypatch, module, df):
    monkeypatch.setattr(
        f"go_nats_to_clickhouse_spark.queries.{module}.load_table",
        lambda _s, _d, _n: df,
    )


class TestDecontaminate:
    def test_flags_only_train_docs_sharing_two_grams(self, spark, monkeypatch):
        shared = "alpha bravo charlie delta echo foxtrot"  # two 5-grams
        rows = [
            # doc 10 -> test split (doc_id % 10 == 0)
            (10, shared, "en", "web", 1),
            # doc 1 copies both 5-grams -> contaminated
            (1, shared + " golf", "en", "web", 1),
            # doc 2 shares only one 5-gram -> below threshold
            (2, "alpha bravo charlie delta echo zulu", "en", "web", 1),
            # doc 3 disjoint
            (3, "one two three four five six", "en", "web", 1),
        ]
        _patch(monkeypatch, "pipeline_extra", _docs(spark, rows))
        out = dedup_decontaminate(spark, "unused").collect()
        assert [(r.doc_id, r.n_contaminated_grams, r.n_test_docs) for r in out] == [
            (1, 2, 1)
        ]

    def test_test_docs_never_flagged(self, spark, monkeypatch):
        text = "a b c d e f g h"
        rows = [(10, text, "en", "web", 1), (20, text, "en", "web", 1)]
        _patch(monkeypatch, "pipeline_extra", _docs(spark, rows))
        assert dedup_decontaminate(spark, "unused").count() == 0


class TestSequencePacking:
    def test_partition_of_docs_and_token_conservation(self, spark, monkeypatch):
        rows = [
            (i, " ".join(["w"] * (300 + i)), "en", "web", 1) for i in range(40)
        ]
        df = _docs(spark, rows)
        _patch(monkeypatch, "pipeline_extra", df)
        out = text_sequence_packing(spark, "unused").collect()
        # every doc lands in exactly one pack; token totals are conserved
        assert sum(r.n_docs for r in out) == 40
        assert sum(r.total_tokens for r in out) == sum(300 + i for i in range(40))
        # a pack's doc range is contiguous within its shard ordering
        for r in out:
            assert r.first_doc <= r.last_doc
            assert r.shard == r.first_doc % 8 == r.last_doc % 8

    def test_pack_starts_bounded_by_capacity(self, spark, monkeypatch):
        # 5 docs of 1000 tokens in one shard: starts 0,1000,2000,3000,4000
        # -> packs 0,0,0 (start<2048), 1,1 (start<4096)
        rows = [(i * 8, " ".join(["w"] * 1000), "en", "web", 1) for i in range(5)]
        _patch(monkeypatch, "pipeline_extra", _docs(spark, rows))
        out = {r.pack_id: r.n_docs for r in text_sequence_packing(spark, "unused").collect()}
        assert out == {0: 3, 1: 2}


class TestSamplePerGroup:
    def test_cap_and_determinism(self, spark, monkeypatch):
        rows = [(i, "t", "en" if i % 3 else "fr", "web", 1) for i in range(200)]
        _patch(monkeypatch, "pipeline_extra", _docs(spark, rows))
        a = sample_per_group(spark, "unused").collect()
        b = sample_per_group(spark, "unused").collect()
        assert a == b
        per_lang = {}
        for r in a:
            per_lang.setdefault(r.lang, []).append(r.rk)
        for lang, rks in per_lang.items():
            assert rks == sorted(rks) and len(rks) <= 50


class TestMoments:
    def test_matches_numpy_population_moments(self, spark, monkeypatch):
        vals = [1.25, 2.5, 2.5, 7.125, 9.0, 0.125, 3.0]
        rows = [
            (i, TS, 1, "view", v, "{}") for i, v in enumerate(vals)
        ]
        _patch(monkeypatch, "stats", _events(spark, rows))
        [r] = agg_statistical_moments(spark, "unused").collect()
        a = np.array(vals)
        mu, var = a.mean(), a.var()
        skew = ((a - mu) ** 3).mean() / var ** 1.5
        kurt = ((a - mu) ** 4).mean() / var ** 2 - 3
        assert r.n == len(vals)
        assert math.isclose(r.mean_v, round(mu, 6), abs_tol=1e-6)
        assert math.isclose(r.var_pop, var, abs_tol=1e-5)
        assert math.isclose(r.skew_pop, skew, abs_tol=1e-5)
        assert math.isclose(r.kurt_pop, kurt, abs_tol=1e-5)


class TestEntropy:
    def test_uniform_distribution_is_log2_k(self, spark, monkeypatch):
        rows = [
            (i, TS, 1, t, 0.0, "{}")
            for i, t in enumerate(["a", "b", "c", "d"] * 5)
        ]
        _patch(monkeypatch, "stats", _events(spark, rows))
        [r] = agg_entropy(spark, "unused").collect()
        assert r.n_types == 4
        assert math.isclose(r.entropy_bits, 2.0, abs_tol=1e-9)

    def test_single_type_is_zero(self, spark, monkeypatch):
        rows = [(i, TS, 1, "a", 0.0, "{}") for i in range(7)]
        _patch(monkeypatch, "stats", _events(spark, rows))
        [r] = agg_entropy(spark, "unused").collect()
        assert r.entropy_bits == 0.0


class TestMovingAvg:
    def test_frame_shrinks_at_partition_start(self, spark, monkeypatch):
        rows = [
            (i, TS + datetime.timedelta(seconds=i), 1, "v", float(x), "{}")
            for i, x in enumerate([2.0, 4.0, 9.0, 1.0])
        ]
        _patch(monkeypatch, "clickhouse_more", _events(spark, rows))
        out = [r.mov_avg3 for r in agg_moving_avg(spark, "unused").collect()]
        assert out == [2.0, 3.0, 5.0, round((4 + 9 + 1) / 3, 6)]


class TestDeltaSum:
    def test_sums_only_positive_deltas(self, spark, monkeypatch):
        # 10 -> 12 (+2) -> 5 (reset) -> 9 (+4): deltaSum = 6
        rows = [
            (i, TS + datetime.timedelta(seconds=i), 1, "v", float(x), "{}")
            for i, x in enumerate([10.0, 12.0, 5.0, 9.0])
        ]
        _patch(monkeypatch, "clickhouse_more", _events(spark, rows))
        [r] = agg_delta_sum(spark, "unused").collect()
        assert (r.delta_sum, r.n_increases) == (6.0, 2)

    def test_single_row_user_has_zero(self, spark, monkeypatch):
        rows = [(1, TS, 1, "v", 10.0, "{}")]
        _patch(monkeypatch, "clickhouse_more", _events(spark, rows))
        [r] = agg_delta_sum(spark, "unused").collect()
        assert (r.delta_sum, r.n_increases) == (0.0, 0)
