"""Physical-plan audit over the query registry — the scale linter.

For every registered query, builds the DataFrame (no execution) and
inspects the formatted physical plan for patterns that are fine at
sf0.1 but lethal at 100 TB:

* ``CartesianProduct``  — an unconditional O(N*M) join. A broadcast
  nested-loop against a 1-row threshold frame is fine (that's how
  uncorrelated scalar subqueries decorrelate); a shuffled cartesian is
  a bug, always.
* ``BatchEvalPython``   — row-at-a-time Python UDF in the plan. All
  Python must go through Arrow (``ArrowEvalPython`` / ``MapInPandas``
  / ``FlatMapGroupsInPandas`` are the allowed forms).
* ``SortMergeJoin on a dim table`` is NOT flagged — AQE converts
  eligible ones at runtime; the audit sticks to static certainties.

Also reports per-plan Exchange (shuffle) counts so regressions in
shuffle shape show up in review diffs.

Usage: python tools/planaudit.py [sf_dir] [query ...]
Exit code 1 if any hard flag fires.
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, "/root/repo")

HARD_FLAGS = {
    "CartesianProduct": "unconditional shuffled cross join",
    "BatchEvalPython": "row-at-a-time Python UDF (use Arrow forms)",
}


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit_plan(plan: str) -> tuple[list[str], int]:
    flags = [msg for pat, msg in HARD_FLAGS.items() if pat in plan]
    n_exchange = len(re.findall(r"\bExchange\b", plan))
    return flags, n_exchange


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from go_nats_to_clickhouse_spark.queries import QUERIES
    from go_nats_to_clickhouse_spark.session import get_spark

    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark(app_name="gntcs-planaudit")
    failures = 0
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        flags, n_exchange = audit_plan(formatted_plan(df))
        status = "FLAG" if flags else "ok"
        print(f"{status:4} {name}: exchanges={n_exchange}"
              + (f" :: {'; '.join(flags)}" if flags else ""))
        failures += bool(flags)
    print(f"\n{failures} flagged / {len(names)} plans")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
