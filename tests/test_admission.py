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
