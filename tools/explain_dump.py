"""Dump .explain('formatted') for every registered query to a directory.

Usage: python tools/explain_dump.py OUTDIR [sf_dir] [query ...]

Used by the optimization rounds to commit before/after plan evidence
(plans/r12/<query>_{before,after}.txt). Plan construction only — nothing
is executed (materialized-table families may build their ingest-time
fixtures on first touch, same contract as bench.py's prebuild).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    os.makedirs(outdir, exist_ok=True)

    from go_nats_to_clickhouse_spark.queries import QUERIES
    from go_nats_to_clickhouse_spark.session import get_spark

    names = sys.argv[3:] or list(QUERIES)
    spark = get_spark(app_name="gntcs-explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - record, keep dumping
            text = f"EXPLAIN FAILED: {exc!r}\n"
        with open(os.path.join(outdir, f"{name}.txt"), "w", encoding="utf-8") as fh:
            fh.write(text)
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
