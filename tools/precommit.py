"""The un-skippable add-a-query gate (VERDICT r7 #2).

Round 7's only red component was a query committed in the final snapshot
without EVER being executed: `agg_weighted_median_udaf` crashed at
``pandas_udf`` construction time, which took down the driver bench
(rc=1), the plan-audit suite, and both staleness tests at once. The
repo's stated discipline (selfcheck + planaudit + staleness before every
registry addition, COVERAGE.md) was skipped exactly once, under deadline
pressure — so the fix is a gate that does not depend on the discipline
being remembered:

Tier 1 — STATIC (no SparkSession, ~2 s): run on EVERY commit via the
installed git pre-commit hook, and also enforced by
``tests/test_precommit_gate.py`` (so plain ``pytest`` re-checks it even
where the hook is not installed):

  * every registered query has a ``STALENESS.json`` entry (i.e. the
    author ran ``tools/staleness.py --update`` after adding it);
  * every changed-or-new query sits inside the first 50 of the driver
    window (``tools/staleness.stale_outside_window`` is empty);
  * ``_PRIORITY`` is duplicate-free, every name resolves, the window is
    exactly the documented size, and the flagship is inside it;
  * every registered oracle PARSES AND BINDS in DuckDB (``EXPLAIN``
    against the sf0.001 views — no execution) — a typo'd oracle cannot
    land;
  * every no-oracle query is in the documented allowlist below.

Tier 2 — SMOKE (one local SparkSession): construct the DataFrame of
every CHANGED-OR-NEW query at sf0.001 — no collect, no job beyond what
construction itself requires. This is exactly the tier that would have
caught round 7's crash (the ``pandas_udf`` decorator raises during plan
construction, before any action). The hook triggers it automatically
when the staged diff touches the query packages; it is a no-op when
nothing changed.

Tier 3 — FUZZ (VERDICT r8 #3, same ``--smoke`` flag): run every
CHANGED-OR-NEW query against its DuckDB oracle on ONE seeded Bernoulli
sample of the fixtures (``tools/fuzzcheck.py`` machinery, restricted to
the changed set). The seed/percent pair is derived deterministically
from the changed-query names, so re-running the same changeset
reproduces the same sample while different changesets explore different
ones. This is the tier that would have caught the q1 /
``timeseries_resample_interpolate`` rounding-boundary class at commit
time: both queries were driver-seed-42-green for rounds while
diverging on other samples.

Usage:
    python tools/precommit.py              # tier 1
    python tools/precommit.py --smoke      # tiers 1 + 2 + 3 (changed only)
    python tools/precommit.py --smoke-all  # tiers 1 + 3, tier 2 over EVERYTHING
    python tools/precommit.py --install    # write .git/hooks/pre-commit
"""

from __future__ import annotations

import os
import stat
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

#: queries with deliberately no oracle (driver records rows-only) — keep
#: in sync with the genuinely-non-SQL-expressible set documented in
#: COVERAGE.md; anything else missing an oracle is a gate failure.
NO_ORACLE_ALLOWED: frozenset[str] = frozenset()

HOOK_BODY = """#!/bin/sh
# Installed by tools/precommit.py --install (add-a-query gate, VERDICT r7 #2).
cd "$(git rev-parse --show-toplevel)" || exit 1
if git diff --cached --name-only | grep -qE \\
    '^(go_nats_to_clickhouse_spark/(queries|operators|plans|functions)/|__spark_entry__\\.py|STALENESS\\.json)'; then
    exec python tools/precommit.py --smoke
fi
exec python tools/precommit.py
"""


def _fail(msgs: list[str]) -> None:
    print("PRECOMMIT GATE FAILED:")
    for m in msgs:
        print(f"  - {m}")
    raise SystemExit(1)


def static_gate(verbose: bool = True) -> list[str]:
    """Tier 1. Returns the list of changed-or-new query names (the tier-2
    work list) on success; exits 1 with every violation on failure."""
    import staleness

    import __spark_entry__ as entry
    from go_nats_to_clickhouse_spark.queries import ORACLES, QUERIES

    problems: list[str] = []

    # registry <-> staleness
    baseline = staleness.load_baseline()
    unregistered = sorted(n for n in QUERIES if n not in baseline)
    if unregistered:
        problems.append(
            "not in STALENESS.json (run `python tools/staleness.py --update`): "
            + " ".join(unregistered)
        )

    # changed/new inside the window
    stale = staleness.stale_outside_window()
    if stale:
        problems.append(
            "changed-or-new but OUTSIDE the driver window (front in "
            "_PRIORITY): " + " ".join(stale)
        )

    # window shape
    prio = entry._PRIORITY
    dups = sorted({n for n in prio if prio.count(n) > 1})
    if dups:
        problems.append("duplicate _PRIORITY entries: " + " ".join(dups))
    unknown = sorted(n for n in prio if n not in QUERIES)
    if unknown:
        problems.append("_PRIORITY names not in registry: " + " ".join(unknown))
    if len(prio) != staleness.WINDOW:
        problems.append(
            f"_PRIORITY holds {len(prio)} names; the driver samples exactly "
            f"{staleness.WINDOW} — keep the window full (spare slots are "
            "re-confirmation slots for the oldest greens)"
        )
    if "mv_analytics_projection" not in set(list(entry.queries())[: staleness.WINDOW]):
        problems.append("flagship mv_analytics_projection left the driver window")

    # every query carries an oracle (or is documented rows-only)
    missing_oracle = sorted(
        n for n in QUERIES if n not in ORACLES and n not in NO_ORACLE_ALLOWED
    )
    if missing_oracle:
        problems.append("no oracle_sql entry: " + " ".join(missing_oracle))

    # every oracle parses + binds in DuckDB (EXPLAIN, no execution)
    from selfcheck import make_oracle_connection

    con = make_oracle_connection("/root/testdata/sf0.001")
    for name, sql in ORACLES.items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001
            problems.append(f"oracle for {name} does not bind in DuckDB: {exc}")

    if problems:
        _fail(problems)

    hashes = staleness.current_hashes()
    changed = sorted(
        n
        for n, h in hashes.items()
        if (e := baseline.get(n)) is None or e.get("hash") != h
    )
    if verbose:
        print(
            f"tier-1 static gate OK: {len(QUERIES)} queries, "
            f"{len(ORACLES)} oracles bind, window exact; "
            f"{len(changed)} changed-or-new -> tier-2 work list"
        )
    return changed


def smoke(names: list[str]) -> None:
    """Tier 2: construct each named query's DataFrame at sf0.001."""
    if not names:
        print("tier-2 smoke: nothing changed — skipped")
        return
    from go_nats_to_clickhouse_spark.config import EngineConfig
    from go_nats_to_clickhouse_spark.queries import QUERIES
    from go_nats_to_clickhouse_spark.session import get_spark

    spark = get_spark(EngineConfig(shuffle_partitions=4), app_name="precommit-smoke")
    failures = []
    for name in names:
        t0 = time.time()
        try:
            df = QUERIES[name](spark, "/root/testdata/sf0.001")
            n_cols = len(df.columns)  # forces analysis
        except Exception as exc:  # noqa: BLE001
            print(f"SMOKE FAIL {name}: {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        print(f"smoke ok {name}: {n_cols} cols ({time.time() - t0:.1f}s)")
    if failures:
        _fail([f"query does not construct: {n}" for n in failures])
    print(f"tier-2 smoke OK: {len(names)} queries construct at sf0.001")


def fuzz_tier(names: list[str]) -> None:
    """Tier 3: differential oracle check of each named query on one
    seeded Bernoulli fixture sample (fuzzcheck machinery, changed set
    only). Seed/percent derive from the changed names — deterministic
    per changeset, varying across changesets."""
    if not names:
        print("tier-3 fuzz: nothing changed — skipped")
        return
    import hashlib
    import tempfile

    from fuzzcheck import build_sampled_dir
    from selfcheck import check_queries, make_oracle_connection

    from go_nats_to_clickhouse_spark.config import EngineConfig
    from go_nats_to_clickhouse_spark.session import get_spark

    digest = int(
        hashlib.md5(" ".join(sorted(names)).encode()).hexdigest(), 16
    )
    seed = digest % 997
    percent = 50 + digest % 46  # 50-95%: real row loss, never degenerate
    out = tempfile.mkdtemp(prefix=f"precommit-fuzz-{seed}-")
    build_sampled_dir("/root/testdata/sf0.001", out, seed, percent)
    print(f"tier-3 fuzz: {percent}% sample, seed {seed} -> {out}")
    spark = get_spark(EngineConfig(shuffle_partitions=4), app_name="precommit-fuzz")
    con = make_oracle_connection(out)
    failures = check_queries(spark, con, out, only=tuple(names))
    if failures:
        _fail([f"fuzz divergence (seed {seed}, {percent}%): {n}" for n in failures])
    print(f"tier-3 fuzz OK: {len(names)} queries agree on the sampled fixtures")


def install() -> None:
    hook = os.path.join(REPO, ".git", "hooks", "pre-commit")
    with open(hook, "w", encoding="utf-8") as fh:
        fh.write(HOOK_BODY)
    os.chmod(hook, os.stat(hook).st_mode | stat.S_IXUSR | stat.S_IXGRP)
    print(f"installed {hook}")


if __name__ == "__main__":
    if "--install" in sys.argv:
        install()
        raise SystemExit(0)
    changed = static_gate()
    if "--smoke-all" in sys.argv:
        from go_nats_to_clickhouse_spark.queries import QUERIES

        smoke(sorted(QUERIES))
        fuzz_tier(changed)
    elif "--smoke" in sys.argv:
        smoke(changed)
        fuzz_tier(changed)
