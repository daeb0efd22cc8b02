"""Token-bloom text skip index (plans/layout.py — the ClickHouse
``tokenbf_v1`` analog): pruning must actually skip files, never lose a
match, survive part rewrites via rebuild, and stay byte-equal to the
unpruned token search.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from go_nats_to_clickhouse_spark.plans import layout as L


def _write_fixture(spark, path: str) -> None:
    """Two monthly partitions; the token 'needle' appears only in the
    January rows, so at least February's files must be prunable."""
    rows = []
    for i in range(200):
        month = 1 if i % 2 == 0 else 2
        text = f"common words row {i}" + (" needle here" if month == 1 and i % 20 == 0 else "")
        rows.append((dt.datetime(2024, month, 1 + i % 27), f"c{i}", i, text))
    df = spark.createDataFrame(
        rows, "timestamp timestamp, chat_id string, sequence long, data string"
    )
    L.write_partitioned(df, path, sort_keys=("timestamp",), mode="overwrite")


class TestTokenBloom:
    def test_prunes_files_and_loses_nothing(self, spark, tmp_path):
        path = str(tmp_path / "tbl")
        _write_fixture(spark, path)
        L.build_token_bloom(spark, path, "data")

        got, report = L.search_token_pruned(spark, path, "data", "needle")
        assert report["files_candidate"] < report["files_total"]
        assert report["files_candidate"] >= 1

        full = spark.read.parquet(path).filter(
            F.array_contains(F.split(F.lower("data"), L.TOKEN_SPLIT), "needle")
        )
        assert sorted(r.sequence for r in got.collect()) == sorted(
            r.sequence for r in full.collect()
        )
        assert got.count() == 10  # i % 20 == 0 among 100 january rows

    def test_absent_token_prunes_everything(self, spark, tmp_path):
        path = str(tmp_path / "tbl")
        _write_fixture(spark, path)
        L.build_token_bloom(spark, path, "data")
        got, report = L.search_token_pruned(spark, path, "data", "absenttoken")
        assert got.count() == 0
        # 3 bits over 4096 for one token: candidates are fp-only, almost
        # always zero on this vocabulary — but never assert exactly zero
        # (a bloom is allowed false positives), only that results are empty.
        assert report["files_candidate"] <= report["files_total"]

    def test_sidecar_invisible_to_table_reads(self, spark, tmp_path):
        path = str(tmp_path / "tbl")
        _write_fixture(spark, path)
        before = spark.read.parquet(path).columns
        L.build_token_bloom(spark, path, "data")
        after = spark.read.parquet(path).columns
        assert before == after  # _-prefixed sidecar dir never leaks

    def test_rebuild_after_compaction(self, spark, tmp_path):
        path = str(tmp_path / "tbl")
        _write_fixture(spark, path)
        # extra appends -> many small files, then compact January
        extra = spark.createDataFrame(
            [(dt.datetime(2024, 1, 3), "cx", 10_000, "late needle arrival")],
            "timestamp timestamp, chat_id string, sequence long, data string",
        )
        L.write_partitioned(extra, path, sort_keys=("timestamp",))
        L.compact_table(spark, path, sort_keys=("timestamp",))
        L.build_token_bloom(spark, path, "data")  # rebuild over rewritten parts
        got, report = L.search_token_pruned(spark, path, "data", "needle")
        assert report["files_candidate"] < report["files_total"]
        assert got.count() == 11
        assert {r.sequence for r in got.filter(F.col("sequence") > 9000).collect()} == {
            10_000
        }


class TestFreshness:
    def test_append_without_rebuild_falls_back_to_full_scan(self, spark, tmp_path):
        """New parts the sidecar has never seen -> with heal=False the
        search must NOT prune (a pruned read would silently miss the new
        rows)."""
        path = str(tmp_path / "tbl")
        _write_fixture(spark, path)
        L.build_token_bloom(spark, path, "data")
        late = spark.createDataFrame(
            [(dt.datetime(2024, 2, 9), "cz", 20_000, "february needle too")],
            "timestamp timestamp, chat_id string, sequence long, data string",
        )
        L.write_partitioned(late, path, sort_keys=("timestamp",))
        got, report = L.search_token_pruned(
            spark, path, "data", "needle", heal=False
        )
        assert report["stale"] is True
        assert 20_000 in {r.sequence for r in got.collect()}
        assert got.count() == 11

    def test_append_heals_and_resumes_pruning(self, spark, tmp_path):
        """Default path (ADVICE r9): a stale sidecar is REBUILT in place
        and the search both returns the appended rows AND prunes again —
        the index never silently degrades to a permanent full scan."""
        path = str(tmp_path / "tbl")
        _write_fixture(spark, path)
        L.build_token_bloom(spark, path, "data")
        late = spark.createDataFrame(
            [(dt.datetime(2024, 2, 9), "cz", 20_000, "february needle too")],
            "timestamp timestamp, chat_id string, sequence long, data string",
        )
        L.write_partitioned(late, path, sort_keys=("timestamp",))
        got, report = L.search_token_pruned(spark, path, "data", "needle")
        assert report["stale"] is True and report["healed"] is True
        assert 20_000 in {r.sequence for r in got.collect()}
        assert got.count() == 11
        # second search runs against the healed sidecar: fresh AND pruning
        got2, report2 = L.search_token_pruned(spark, path, "data", "needle")
        assert report2["stale"] is False
        assert report2["files_candidate"] < report2["files_total"]
        assert got2.count() == 11

    def test_rewrite_under_same_path_detected_by_size(self, spark, tmp_path):
        """A part rewritten UNDER THE SAME PATH with different contents
        (manual single-file move) must fail the freshness check — the
        (path, size) identity catches what a path-set comparison cannot
        (ADVICE r9)."""
        import os
        import shutil

        path = str(tmp_path / "tbl")
        _write_fixture(spark, path)
        L.build_token_bloom(spark, path, "data")
        # find one live part and overwrite it in place with a bigger one
        part = None
        for root, _dirs, files in os.walk(path):
            if "_token_bloom" in root or root.rsplit("/", 1)[-1].startswith("."):
                continue
            for f in files:
                if f.endswith(".parquet"):
                    part = os.path.join(root, f)
                    break
            if part:
                break
        assert part is not None
        bigger = spark.createDataFrame(
            [
                (dt.datetime(2024, 1, 5), "zz", 30_000 + i, "swapped needle row")
                for i in range(50)
            ],
            "timestamp timestamp, chat_id string, sequence long, data string",
        )
        tmp_out = str(tmp_path / "one")
        bigger.coalesce(1).write.mode("overwrite").parquet(tmp_out)
        src = [
            os.path.join(tmp_out, f)
            for f in os.listdir(tmp_out)
            if f.endswith(".parquet")
        ][0]
        shutil.copy(src, part)  # same path, different bytes
        crc = os.path.join(
            os.path.dirname(part), f".{os.path.basename(part)}.crc"
        )
        if os.path.exists(crc):  # stale Hadoop local-FS checksum sidecar
            os.remove(crc)
        spark.catalog.refreshByPath(path)  # drop cached file statuses
        got, report = L.search_token_pruned(
            spark, path, "data", "needle", heal=False
        )
        assert report["stale"] is True  # size mismatch detected
        assert {r.sequence for r in got.collect()} >= {30_000, 30_001}


class TestSafetyFallbacks:
    def test_wrong_column_never_prunes(self, spark, tmp_path):
        """Searching a column other than the indexed one must not use the
        sidecar's blooms (silent false negatives otherwise) — ADVICE r9."""
        path = str(tmp_path / "tbl")
        _write_fixture(spark, path)
        L.build_token_bloom(spark, path, "data")
        got, report = L.search_token_pruned(spark, path, "chat_id", "c7")
        assert report.get("wrong_col") is True
        assert report["files_candidate"] == report["files_total"]
        assert got.count() == 1  # exact predicate over the full scan

    def test_untokenizable_token_full_scans(self, spark, tmp_path):
        """token='' (and any non-[a-z0-9]+ needle) must not prune: the
        bloom indexes no such token but the exact re-check CAN match
        boundary-empty tokens — pruning would silently drop those rows
        (ADVICE r9). The fallback keeps predicate semantics exact."""
        path = str(tmp_path / "tbl")
        # rows whose data starts with a separator -> '' boundary token
        rows = [
            (dt.datetime(2024, 1, 2), "aa", 1, "!leading separator"),
            (dt.datetime(2024, 1, 3), "bb", 2, "plain words here"),
        ]
        df = spark.createDataFrame(
            rows,
            "timestamp timestamp, chat_id string, sequence long, data string",
        )
        L.write_partitioned(df, path, sort_keys=("timestamp",))
        L.build_token_bloom(spark, path, "data")
        got, report = L.search_token_pruned(spark, path, "data", "")
        assert report.get("untokenizable") is True
        assert report["files_candidate"] == report["files_total"]
        # the exact predicate still decides membership: row 1 matches
        # (regex split of '!leading separator' yields a '' boundary token)
        assert {r.sequence for r in got.collect()} == {1}
        got2, report2 = L.search_token_pruned(spark, path, "data", "two words")
        assert report2.get("untokenizable") is True
        assert got2.count() == 0

    def test_compaction_rebuilds_automatically(self, spark, tmp_path):
        """compact_table must leave the indexes fresh over the new parts
        (ClickHouse merges rebuild secondary indexes)."""
        path = str(tmp_path / "tbl")
        _write_fixture(spark, path)
        L.build_token_bloom(spark, path, "data")
        L.build_ngram_bloom(spark, path, "data")
        L.compact_table(spark, path, sort_keys=("timestamp",))
        got, report = L.search_token_pruned(spark, path, "data", "needle")
        assert report["stale"] is False
        assert report["files_candidate"] < report["files_total"]
        assert got.count() == 10
        got2, report2 = L.search_like_pruned(spark, path, "data", "needle h")
        assert report2["stale"] is False
        assert got2.count() == 10


class TestAtomicPublish:
    def test_racing_builders_leave_one_complete_sidecar(self, spark, tmp_path):
        """Two concurrent build_token_bloom calls on the same table must
        leave exactly one complete, readable sidecar (ADVICE r9: the old
        in-place overwrite could interleave two writers' files)."""
        import threading

        path = str(tmp_path / "tbl")
        _write_fixture(spark, path)
        errs = []

        def build():
            try:
                L.build_token_bloom(spark, path, "data")
            except Exception as e:  # pragma: no cover - failure signal
                errs.append(e)

        ts = [threading.Thread(target=build) for _ in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        # the published sidecar is complete and fresh: search prunes
        got, report = L.search_token_pruned(spark, path, "data", "needle")
        assert report["stale"] is False
        assert report["files_candidate"] < report["files_total"]
        assert got.count() == 10
        # no build litter left behind
        import os

        litter = [
            d
            for d in os.listdir(path)
            if d.startswith((".{0}".format(L.TOKEN_BLOOM_DIR)))
        ]
        assert litter == [], litter
