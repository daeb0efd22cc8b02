"""Stale-green governance for the driver's 50-row sample window.

The correctness driver samples the FIRST 50 entries of
``__spark_entry__.queries()`` per round; the other ~126 registry queries
rely on older driver rows plus the local selfcheck. That is sound only
under an invariant the repo used to maintain BY HAND: any query whose
engine function or oracle SQL changes after its last driver sample must
be re-fronted into the window. This module mechanizes it (VERDICT r4 #4).

Model:

* ``STALENESS.json`` (repo root, committed) maps every registered query to
  {"round": <last driver round with a green row>, "hash": <md5 of the
  engine function's source + the oracle SQL at the time that baseline was
  taken>}.
* ``tests/test_staleness.py`` recomputes the hashes at test time: a query
  whose current hash differs from its baseline (or which has no baseline
  entry — i.e. is new) MUST sit inside the first 50 of ``_PRIORITY``,
  else the test fails with the exact list to front.
* At round start (when the driver publishes ``CORRECTNESS_r{N}.json``),
  run ``python tools/staleness.py --update`` to fold the new green rows
  into the baseline at the current source state.

Scope note: the hash covers the query function's own source and its
oracle string — the direct-edit case the hand-maintained invariant
existed for. Edits to shared operators are covered by their unit tests
and by whichever queries ARE in the window; fronting every transitive
dependent would blow the 50-slot budget.

Usage:
    python tools/staleness.py            # report stale-green queries
    python tools/staleness.py --update   # refresh baseline from the
                                         # newest CORRECTNESS_r*.json +
                                         # current source
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_PATH = os.path.join(REPO, "STALENESS.json")
WINDOW = 50


_HINT_RE = re.compile(r"(?:\b(?:F\.)?broadcast|\bbounded)\(")


def _strip_broadcast(src: str) -> str:
    """Remove every ``F.broadcast( expr )`` / ``bounded( expr, reason )``
    wrapper, keeping ``expr`` (the first top-level argument).

    Join hints and boundedness markers are PLAN-ONLY: adding or removing
    one cannot change a deterministic query's result set (``bounded`` is
    an alias node — operators/hints.py), so the gate compares a second,
    hint-normalized hash — a hint-only edit (e.g. VERDICT r9 #2's removal
    of forced broadcasts on sf-scaling dimensions) does not force the row
    back into the 50-slot driver window, while any edit that touches an
    expression, filter, or the oracle still trips the raw hash AND this
    one. The reverse direction (sneaking a NEW bad hint in without a
    driver re-sample) is closed by the planaudit forbidden-hint rule, not
    by this gate. On any paren-scan failure the raw source is returned,
    which degrades to the strict behavior."""
    out: list[str] = []
    i = 0
    while True:
        m = _HINT_RE.search(src, i)
        if not m:
            out.append(src[i:])
            return "".join(out)
        out.append(src[i : m.start()])
        depth, j = 1, m.end()
        arg_end = None  # first top-level comma = end of the frame arg
        try:
            while depth:
                c = src[j]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                elif c == "," and depth == 1 and arg_end is None:
                    arg_end = j
                j += 1
        except IndexError:  # unbalanced (string literal with parens) —
            return src  # fall back to strict raw-source comparison
        inner = src[m.end() : arg_end if arg_end is not None else j - 1]
        out.append(_strip_broadcast(inner))
        i = j


def _source_of(fn) -> str:
    try:
        return inspect.getsource(fn)
    except (OSError, TypeError):  # dynamically-defined fallback
        return repr(fn)


def current_hashes() -> dict[str, str]:
    sys.path.insert(0, REPO)
    from go_nats_to_clickhouse_spark.queries import ORACLES, QUERIES

    out = {}
    for name, fn in QUERIES.items():
        key = _source_of(fn) + "\n---oracle---\n" + ORACLES.get(name, "")
        out[name] = hashlib.md5(key.encode()).hexdigest()[:16]
    return out


def current_nhashes() -> dict[str, str]:
    """Hint-normalized variant of current_hashes (see _strip_broadcast)."""
    sys.path.insert(0, REPO)
    from go_nats_to_clickhouse_spark.queries import ORACLES, QUERIES

    out = {}
    for name, fn in QUERIES.items():
        key = (
            _strip_broadcast(_source_of(fn))
            + "\n---oracle---\n"
            + ORACLES.get(name, "")
        )
        out[name] = hashlib.md5(key.encode()).hexdigest()[:16]
    return out


def last_green_rounds() -> dict[str, int]:
    """query -> newest round whose driver CORRECTNESS file has an
    all-green row for it."""
    rounds: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rno = int(m.group(1))
        with open(path, encoding="utf-8") as fh:
            data = json.load(fh)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            if green:
                rounds[name] = max(rounds.get(name, 0), rno)
    return rounds


def load_baseline() -> dict[str, dict]:
    if not os.path.exists(BASELINE_PATH):
        return {}
    with open(BASELINE_PATH, encoding="utf-8") as fh:
        return json.load(fh)


def priority_window() -> list[str]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    return list(entry.queries())[:WINDOW]


def stale_outside_window() -> list[str]:
    """Queries that changed since their baseline (or are new) but are NOT
    in the driver's next sample window — the governance violation."""
    baseline = load_baseline()
    hashes = current_hashes()
    nhashes = current_nhashes()
    window = set(priority_window())
    bad = []
    for name, h in hashes.items():
        entry = baseline.get(name)
        unchanged = entry is not None and (
            entry.get("hash") == h
            # hint-only edit: raw hash moved but the hint-normalized
            # source is bit-identical to what the driver sampled
            or (
                entry.get("nhash") is not None
                and entry.get("nhash") == nhashes[name]
            )
        )
        if not unchanged and name not in window:
            bad.append(name)
    return sorted(bad)


def update_baseline() -> dict[str, dict]:
    """Fold the newest driver rounds into the baseline at current source.

    Run this FIRST THING at round start, when ``CORRECTNESS_r{N}.json``
    lands and the source still equals what the driver sampled. A query's
    stored hash advances ONLY when a strictly newer green driver round
    exists (``rno > prev.round``) — advancing on ``rno == prev.round``
    would launder a post-sample edit past the gate (the hash would be
    recorded against a round that never saw it). Never-sampled queries
    enter with ``{round: 0, hash: None}`` so they stay flagged as changed
    until a driver round covers them — being in the window satisfies the
    test meanwhile.
    """
    baseline = load_baseline()
    hashes = current_hashes()
    nhashes = current_nhashes()
    rounds = last_green_rounds()
    for name, h in hashes.items():
        rno = rounds.get(name, 0)
        prev = baseline.get(name)
        if prev is None:
            baseline[name] = {
                "round": rno,
                "hash": h if rno > 0 else None,
                "nhash": nhashes[name] if rno > 0 else None,
            }
        elif rno > prev.get("round", 0):
            baseline[name] = {"round": rno, "hash": h, "nhash": nhashes[name]}
        elif prev.get("hash") == h and prev.get("nhash") != nhashes[name]:
            # backfill/refresh: source is bit-identical to the sampled
            # state (raw hash matches), so the normalized hash of the
            # CURRENT source equals the normalized hash of the sampled
            # source under the CURRENT normalizer — no laundering; this
            # also migrates entries across normalizer revisions
            baseline[name] = {**prev, "nhash": nhashes[name]}
        # rno == prev.round with a moved hash: keep the recorded hash
    # drop unregistered leftovers
    baseline = {k: v for k, v in baseline.items() if k in hashes}
    with open(BASELINE_PATH, "w", encoding="utf-8") as fh:
        json.dump(baseline, fh, indent=1, sort_keys=True)
        fh.write("\n")
    return baseline


if __name__ == "__main__":
    if "--update" in sys.argv:
        b = update_baseline()
        print(f"baseline updated: {len(b)} queries -> {BASELINE_PATH}")
    else:
        bad = stale_outside_window()
        if bad:
            print("STALE-GREEN VIOLATIONS (changed but not in the next "
                  f"driver window of {WINDOW}):")
            for name in bad:
                print(f"  {name}")
            sys.exit(1)
        print("ok: every changed/new query sits inside the driver window")
