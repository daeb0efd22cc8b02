"""N-gram-bloom skip index (plans/layout.py — the ClickHouse
``ngrambf_v1`` analog): LIKE-substring pruning must skip files, lose
nothing (incl. cross-token substrings the token index cannot serve),
and fall back cleanly on sub-gram needles.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.plans import layout as L


def _write_fixture(spark, path: str) -> None:
    """Two monthly partitions; the substring 'zebra quux' (cross-token)
    appears only in January rows."""
    rows = []
    for i in range(200):
        month = 1 if i % 2 == 0 else 2
        text = f"common words row {i}" + (
            " zebra quux trail" if month == 1 and i % 20 == 0 else ""
        )
        rows.append((dt.datetime(2024, month, 1 + i % 27), f"c{i}", i, text))
    df = spark.createDataFrame(
        rows, "timestamp timestamp, chat_id string, sequence long, data string"
    )
    L.write_partitioned(df, path, sort_keys=("timestamp",), mode="overwrite")


class TestNgramBloom:
    def test_cross_token_substring_prunes_and_loses_nothing(self, spark, tmp_path):
        path = str(tmp_path / "tbl")
        _write_fixture(spark, path)
        L.build_ngram_bloom(spark, path, "data")

        # 'ra qu' crosses the zebra/quux token boundary — the token
        # index has no entry for it; the n-gram index prunes on its
        # 3-grams ('ra ', 'a q', ' qu').
        got, report = L.search_like_pruned(spark, path, "data", "ra qu")
        assert report["files_candidate"] < report["files_total"]
        assert report["files_candidate"] >= 1
        full = spark.read.parquet(path).filter(
            F.lower("data").contains("ra qu")
        )
        assert sorted(r.sequence for r in got.collect()) == sorted(
            r.sequence for r in full.collect()
        )
        assert got.count() == 10

    def test_case_insensitive_match(self, spark, tmp_path):
        path = str(tmp_path / "tbl")
        _write_fixture(spark, path)
        L.build_ngram_bloom(spark, path, "data")
        got, _ = L.search_like_pruned(spark, path, "data", "ZEBRA")
        assert got.count() == 10

    def test_short_needle_falls_back_to_full_scan(self, spark, tmp_path):
        path = str(tmp_path / "tbl")
        _write_fixture(spark, path)
        L.build_ngram_bloom(spark, path, "data")
        got, report = L.search_like_pruned(spark, path, "data", "ro")
        # no full 3-gram -> every file is a candidate, results still exact
        assert report["files_candidate"] == report["files_total"]
        assert got.count() == 200  # every row says "row"

    def test_absent_substring_returns_empty(self, spark, tmp_path):
        path = str(tmp_path / "tbl")
        _write_fixture(spark, path)
        L.build_ngram_bloom(spark, path, "data")
        got, _ = L.search_like_pruned(spark, path, "data", "xylophone")
        assert got.count() == 0
