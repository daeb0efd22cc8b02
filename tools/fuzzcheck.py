"""Differential fuzz sweep: the whole registry vs DuckDB on SAMPLED data.

The oracle gate (tools/selfcheck.py) proves Spark == DuckDB on the
seed-42 driver fixtures. This tool re-proves it on data those fixtures
never exercised: each table is re-written as a seeded Bernoulli row
sample (without replacement, so key uniqueness — which many tie-breaks
lean on — survives, while referential integrity is deliberately allowed
to break so outer-join null branches get real traffic). Every
materialization family rebuilds against the sampled fixtures (their
cache fingerprints key on file mtime), so the sweep exercises the full
build+read chain, not just the read paths.

A failure here and not on the driver fixtures almost always means a
semantics difference the fixtures happened to hide — an unordered
tie-break, a NULL-handling divergence, an empty-group edge — exactly
the class of bug a different seed surfaces.

Usage:
    python tools/fuzzcheck.py [seed] [percent] [base_sf_dir] [query ...]
Defaults: seed 8, 90 %, /root/testdata/sf0.001, whole registry.
Naming queries restricts the sweep to them (the precommit smoke tier
uses this: one seed over just the changed queries, so the
rounding-boundary class q1 had cannot land ungated).
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def build_sampled_dir(base: str, out: str, seed: int, percent: int) -> None:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(base, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        # small dimension tables pass through whole: sampling a 5-row
        # region table risks empty joins that test nothing
        clause = (
            ""
            if t in ("region", "nation")
            else f" USING SAMPLE {percent} PERCENT (bernoulli, {seed})"
        )
        con.sql(
            f"COPY (SELECT * FROM '{src}'{clause}) TO '{dst}' (FORMAT PARQUET)"
        )
    con.close()


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    percent = int(sys.argv[2]) if len(sys.argv) > 2 else 90
    base = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    only = tuple(sys.argv[4:])

    out = tempfile.mkdtemp(prefix=f"fuzz-sf-{seed}-")
    build_sampled_dir(base, out, seed, percent)
    print(f"sampled fixtures ({percent}% seed {seed}) -> {out}")

    from selfcheck import check_queries, make_oracle_connection

    from go_nats_to_clickhouse_spark.config import EngineConfig
    from go_nats_to_clickhouse_spark.session import get_spark

    spark = get_spark(
        EngineConfig(shuffle_partitions=8), app_name=f"fuzzcheck-{seed}"
    )
    con = make_oracle_connection(out)
    failures = check_queries(spark, con, out, only=only)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
