"""Ambient-vs-regression adjudicator for bench slowdowns.

When a bench run regresses across the board, the FIRST question is
whether the host got slower or the code did (round 8: three solo runs
at 224-239 s vs a same-day 183.8 s record — ten minutes with this probe
beat an afternoon of false bisects). The decisive experiment: check out
the record commit into a throwaway git worktree and time the SAME
queries with the SAME fixtures in the SAME environment, side by side
with HEAD. If the record commit is equally slow NOW, the delta is host
weather; if it is fast, bisect the repo.

Usage:
    python tools/ambient_probe.py <record-commit> [sf_dir] [query ...]

Defaults: sf_dir /root/testdata/sf0.1; queries = the CPU-heavy dedup
family (the rows that amplify host slowdowns 2x while scheduling-floor
rows barely move). Prints one timing line per (tree, query); each tree
runs in its own subprocess so JVM state cannot leak between them.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = (
    "dedup_minhash_lsh_pairs",
    "dedup_survivors",
    "dedup_connected_components",
    "dedup_containment_pairs",
)

_PROBE = r"""
import os, sys, time
root = sys.argv[1]
sys.path.insert(0, root)
os.chdir(root)
from go_nats_to_clickhouse_spark.config import EngineConfig
from go_nats_to_clickhouse_spark.session import get_spark
from go_nats_to_clickhouse_spark.queries import QUERIES
spark = get_spark(EngineConfig(), app_name="ambient-probe")
sf = sys.argv[2]
QUERIES["q6_revenue_forecast"](spark, sf).collect()  # session warmup
for name in sys.argv[3:]:
    t = time.time()
    QUERIES[name](spark, sf).collect()
    print(f"PROBE {name} {time.time()-t:.2f}s", flush=True)
"""


def probe_tree(root: str, sf_dir: str, queries: list[str]) -> list[str]:
    out = subprocess.run(
        [sys.executable, "-c", _PROBE, root, sf_dir, *queries],
        capture_output=True,
        text=True,
        check=False,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("PROBE ")]
    if not lines:
        sys.stderr.write(out.stderr[-2000:] + "\n")
    return lines


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    commit = sys.argv[1]
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2 and os.path.isdir(sys.argv[2])
        else "/root/testdata/sf0.1"
    )
    queries = [a for a in sys.argv[2:] if not os.path.isdir(a)] or list(
        DEFAULT_QUERIES
    )
    wt = tempfile.mkdtemp(prefix="ambient-probe-")
    os.rmdir(wt)
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", wt, commit],
        check=True,
        capture_output=True,
    )
    try:
        print(f"== record tree ({commit}) ==")
        for line in probe_tree(wt, sf_dir, queries):
            print(line)
        print("== HEAD tree ==")
        for line in probe_tree(REPO, sf_dir, queries):
            print(line)
        print(
            "verdict: record-tree times ~= HEAD times -> ambient (host); "
            "record fast + HEAD slow -> repo regression, bisect."
        )
    finally:
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", wt],
            check=False,
            capture_output=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
