"""The pre-snapshot gate is only worth anything if the compare machinery
actually catches wrong answers. Feed it deliberately-broken oracles and
assert each failure class is detected (and that a correct pair passes)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def _run_gate(spark, sf_dir, monkeypatch, oracle_override):
    import __spark_entry__ as entrymod
    from tools.selfcheck import check_queries, make_oracle_connection

    real = entrymod.oracle_sql()
    real.update(oracle_override)
    monkeypatch.setattr(entrymod, "oracle_sql", lambda: real)
    con = make_oracle_connection(sf_dir)
    return check_queries(spark, con, sf_dir, list(oracle_override))


def test_gate_passes_on_correct_oracle(spark, sf_dir, monkeypatch):
    import __spark_entry__ as entrymod

    good = {"q4_late_shipments": entrymod.oracle_sql()["q4_late_shipments"]}
    assert _run_gate(spark, sf_dir, monkeypatch, good) == []


def test_gate_catches_row_count_mismatch(spark, sf_dir, monkeypatch):
    bad = {
        "q4_late_shipments": (
            "SELECT o_orderpriority, CAST(0 AS BIGINT) AS late_orders "
            "FROM orders GROUP BY o_orderpriority LIMIT 2"
        )
    }
    assert _run_gate(spark, sf_dir, monkeypatch, bad) == ["q4_late_shipments"]


def test_gate_catches_value_mismatch(spark, sf_dir, monkeypatch):
    import __spark_entry__ as entrymod

    # same rows/columns, one value off by one
    orig = entrymod.oracle_sql()["q4_late_shipments"]
    bad = {
        "q4_late_shipments": (
            f"SELECT o_orderpriority, late_orders + 1 AS late_orders FROM ({orig})"
        )
    }
    assert _run_gate(spark, sf_dir, monkeypatch, bad) == ["q4_late_shipments"]


def test_gate_catches_column_rename(spark, sf_dir, monkeypatch):
    import __spark_entry__ as entrymod

    orig = entrymod.oracle_sql()["q4_late_shipments"]
    bad = {
        "q4_late_shipments": (
            f"SELECT o_orderpriority, late_orders AS n_late FROM ({orig})"
        )
    }
    assert _run_gate(spark, sf_dir, monkeypatch, bad) == ["q4_late_shipments"]
