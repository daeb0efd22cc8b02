"""Per-user admission control (users.xml analog) — VERDICT r7 missing #2."""

from __future__ import annotations

import pytest

from go_nats_to_clickhouse_spark.admission import (
    AdmissionController,
    Profile,
    Quota,
    QuotaExceeded,
    ReadonlyViolation,
    TooManyQueries,
    User,
    reference_defaults,
    write_fair_scheduler_xml,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def _ctrl(clock, **quota_kw):
    users = {"u": User("u", profile="default", quota="q")}
    profiles = {"default": Profile("default", pool="etl")}
    quotas = {"q": Quota(duration_seconds=3600.0, **quota_kw)}
    return AdmissionController(users, profiles, quotas, clock=clock)


class TestQuota:
    def test_zero_limits_track_but_never_reject(self, spark):
        clock = FakeClock()
        c = _ctrl(clock)  # reference ships all-zero limits
        for _ in range(5):
            with c.session(spark, "u"):
                clock.t += 1.0
        u = c.usage("u")
        assert u.queries == 5
        assert u.execution_time == pytest.approx(5.0)

    def test_query_limit_rejects_inside_interval(self, spark):
        clock = FakeClock()
        c = _ctrl(clock, max_queries=2)
        with c.session(spark, "u"):
            pass
        with c.session(spark, "u"):
            pass
        with pytest.raises(QuotaExceeded):
            with c.session(spark, "u"):
                pass

    def test_interval_rollover_resets_counters(self, spark):
        clock = FakeClock()
        c = _ctrl(clock, max_queries=1)
        with c.session(spark, "u"):
            pass
        clock.t += 3601.0
        with c.session(spark, "u"):  # new interval — admitted again
            pass

    def test_errors_counted_and_limited(self, spark):
        clock = FakeClock()
        c = _ctrl(clock, max_errors=1)
        with pytest.raises(ValueError):
            with c.session(spark, "u"):
                raise ValueError("boom")
        assert c.usage("u").errors == 1
        with pytest.raises(QuotaExceeded):
            with c.session(spark, "u"):
                pass

    def test_result_rows_charged(self, spark):
        clock = FakeClock()
        c = _ctrl(clock, max_result_rows=10)
        c.charge("u", result_rows=10)
        with pytest.raises(QuotaExceeded):
            with c.session(spark, "u"):
                pass


class TestConcurrencyAndPools:
    def test_max_concurrent_rejects_not_queues(self, spark):
        clock = FakeClock()
        users, profiles, quotas = reference_defaults()
        c = AdmissionController(
            users, profiles, quotas, max_concurrent_queries=1, clock=clock
        )
        with c.session(spark, "default"):
            with pytest.raises(TooManyQueries):
                with c.session(spark, "clhs"):
                    pass
        # slot released on exit
        with c.session(spark, "clhs"):
            pass

    def test_scheduler_pool_set_and_restored(self, spark):
        clock = FakeClock()
        c = _ctrl(clock)
        sc = spark.sparkContext
        before = sc.getLocalProperty("spark.scheduler.pool")
        with c.session(spark, "u"):
            assert sc.getLocalProperty("spark.scheduler.pool") == "etl"
        assert sc.getLocalProperty("spark.scheduler.pool") == before

    def test_fair_scheduler_xml(self, tmp_path):
        profiles = {
            "default": Profile("default", pool="default", weight=1),
            "etl": Profile("etl", pool="etl", weight=3, min_share=2),
        }
        out = write_fair_scheduler_xml(profiles, str(tmp_path / "fair.xml"))
        assert "<pool name=\"etl\">" in out
        assert "<weight>3</weight>" in out
        assert "<minShare>2</minShare>" in out


class TestReadonly:
    def test_readonly_refuses_mutations_allows_select(self, spark):
        users = {"ro": User("ro", profile="readonly", quota="default")}
        profiles = {"readonly": Profile("readonly", readonly=True)}
        quotas = {"default": Quota()}
        c = AdmissionController(users, profiles, quotas)
        assert c.run_sql(spark, "ro", "SELECT 1 AS x").collect()[0].x == 1
        with pytest.raises(ReadonlyViolation):
            c.run_sql(spark, "ro", "DROP TABLE t")
        with pytest.raises(ReadonlyViolation):
            c.run_sql(spark, "ro", "INSERT INTO t VALUES (1)")

    def test_reference_defaults_shape(self):
        users, profiles, quotas = reference_defaults()
        assert set(users) == {"default", "clhs"}
        assert profiles["readonly"].readonly
        assert not profiles["default"].readonly
        q = quotas["default"]
        # users.xml ships all-zero (track-only) limits on a 3600s interval
        assert q.duration_seconds == 3600.0
        assert (q.max_queries, q.max_errors, q.max_result_rows) == (0, 0, 0)


class TestQueryLog:
    """The system.query_log analog (VERDICT r8 #6)."""

    def _ctl(self):
        users = {
            "a": User("a", quota="small"),
            "ro": User("ro", profile="readonly"),
        }
        profiles = {
            "default": Profile("default", pool="etl"),
            "readonly": Profile("readonly", readonly=True),
        }
        quotas = {
            "default": Quota(),
            "small": Quota(max_queries=1),
        }
        return AdmissionController(users, profiles, quotas)

    def test_every_outcome_lands_one_event(self, spark):
        c = self._ctl()
        assert len(c.execute(spark, "a", "SELECT 1 AS x UNION ALL SELECT 2")) == 2
        with pytest.raises(QuotaExceeded):
            c.execute(spark, "a", "SELECT 1")
        with pytest.raises(ReadonlyViolation):
            c.execute(spark, "ro", "DROP TABLE t")
        rows = c.query_log_df(spark).orderBy("seq").collect()
        assert [r.event_type for r in rows] == [
            "QueryFinish",
            "ExceptionBeforeStart",
            "ExceptionBeforeStart",
        ]
        assert rows[0].result_rows == 2  # charged inside the session
        assert rows[0].pool == "etl"
        assert rows[1].error == "QuotaExceeded"
        assert rows[2].error == "ReadonlyViolation"
        assert rows[2].kind == "DROP"

    def test_error_inside_session_logs_exception_while_processing(self, spark):
        c = self._ctl()
        with pytest.raises(RuntimeError, match="boom"):
            with c.session(spark, "ro"):
                raise RuntimeError("boom")
        (row,) = c.query_log_df(spark).collect()
        assert row.event_type == "ExceptionWhileProcessing"
        assert row.error == "RuntimeError"
        # and the quota error counter moved with it
        assert c.usage("ro").errors == 1

    def test_write_query_log_persists_and_appends(self, spark, tmp_path):
        c = self._ctl()
        c.execute(spark, "ro", "SELECT 1 AS x")
        path = c.write_query_log(spark, str(tmp_path))
        c.execute(spark, "ro", "SELECT 2 AS x")
        c.write_query_log(spark, str(tmp_path))
        got = spark.read.parquet(path)
        # append semantics: first snapshot (1 event) + second (2 events)
        assert got.count() == 3
        assert got.filter("event_type = 'QueryFinish'").count() == 3

    def test_execution_time_charges_the_rolled_window(self, spark):
        """ADVICE r8: the usage object captured at entry can be replaced
        by a lazy window roll mid-query — exit-path charging must
        re-fetch, or time lands in a discarded window."""
        clock = FakeClock()
        users = {"u": User("u", quota="q")}
        profiles = {"default": Profile("default")}
        quotas = {"q": Quota(duration_seconds=10.0)}
        c = AdmissionController(users, profiles, quotas, clock=clock)
        with c.session(spark, "u"):
            clock.t += 25.0  # crosses two window boundaries mid-query
        u = c.usage("u")
        # the POST-roll window carries the charge (and only it)
        assert u.execution_time == pytest.approx(25.0)
        assert u.queries == 0  # the query was counted in the old window
