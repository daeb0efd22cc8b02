"""The tier-1 add-a-query gate as a plain pytest (no SparkSession) —
``tools/precommit.py`` is the authoritative spelling and the installed
git hook runs it on every commit; this test makes the same checks fire
under ``pytest tests/`` so the gate holds even where the hook was never
installed (fresh clone, driver harness). VERDICT r7 #2."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_static_gate_passes():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import precommit

    changed = precommit.static_gate(verbose=False)
    # the gate itself passing is the assertion (it SystemExits with the
    # violation list otherwise); changed-or-new entries are allowed as
    # long as they sit in the window — tier 2 covers their execution.
    assert isinstance(changed, list)


def test_hook_installed_or_installable():
    """The hook file must exist in a git checkout (committed installs
    don't survive clone — so accept either an installed hook or a clean
    ``--install`` run)."""
    hook = os.path.join(REPO, ".git", "hooks", "pre-commit")
    if os.path.exists(hook):
        with open(hook, encoding="utf-8") as fh:
            assert "tools/precommit.py" in fh.read()
        return
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "precommit.py"), "--install"],
        capture_output=True,
        text=True,
        check=False,
    )
    assert r.returncode == 0, r.stderr
