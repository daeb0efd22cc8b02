"""Mechanized stale-green governance (VERDICT r4 #4): any query whose
engine function or oracle SQL differs from the committed STALENESS.json
baseline must sit inside the driver's next 50-row sample window."""

from __future__ import annotations


def test_changed_queries_are_in_driver_window():
    from tools.staleness import stale_outside_window

    bad = stale_outside_window()
    assert not bad, (
        "queries changed since their last driver sample but NOT fronted "
        f"into the first 50 of __spark_entry__._PRIORITY: {bad} — either "
        "front them or run `python tools/staleness.py --update` after the "
        "driver re-samples them"
    )


def test_detects_an_edit(monkeypatch):
    """The gate actually fires: poison one baseline hash for a query that
    is outside the window and assert it is reported."""
    import tools.staleness as st

    baseline = st.load_baseline()
    window = set(st.priority_window())
    victim = next(n for n in sorted(baseline) if n not in window)
    poisoned = {
        **baseline,
        victim: {**baseline[victim], "hash": "0" * 16, "nhash": "0" * 16},
    }
    monkeypatch.setattr(st, "load_baseline", lambda: poisoned)
    assert victim in st.stale_outside_window()


def test_hint_only_edit_is_exempt(monkeypatch):
    """A raw-hash move with a MATCHING hint-normalized hash (= an
    F.broadcast add/remove, plan-only by construction) must not demand a
    window slot; a moved nhash must."""
    import tools.staleness as st

    baseline = st.load_baseline()
    window = set(st.priority_window())
    victim = next(
        n
        for n in sorted(baseline)
        if n not in window and baseline[n].get("nhash")
    )
    hint_only = {**baseline, victim: {**baseline[victim], "hash": "0" * 16}}
    monkeypatch.setattr(st, "load_baseline", lambda: hint_only)
    assert victim not in st.stale_outside_window()


def test_strip_broadcast_normalization():
    from tools.staleness import _strip_broadcast

    src = 'l.join(F.broadcast(o.join(F.broadcast(c), o.k == c.k)), "k")'
    assert _strip_broadcast(src) == 'l.join(o.join(c, o.k == c.k), "k")'
    # expression edits inside a hint still change the normalized form
    assert _strip_broadcast('F.broadcast(x.filter(a > 1))') != _strip_broadcast(
        'F.broadcast(x.filter(a > 2))'
    )
    # unbalanced parens (pathological string literal) degrade to strict
    assert _strip_broadcast("F.broadcast(x") == "F.broadcast(x"


def test_baseline_covers_registry():
    import tools.staleness as st

    baseline = st.load_baseline()
    hashes = st.current_hashes()
    missing = set(hashes) - set(baseline)
    assert not missing, f"run tools/staleness.py --update: {sorted(missing)}"
