"""Machine-checkable join-hint contracts.

A broadcast HINT is honored regardless of runtime size — AQE never
demotes a hinted side — so at the 100 TB posture a hint is only legal on
a frame whose row count is bounded BY CONSTRUCTION (fixed dims, global
aggregates, LIMIT results) or BY CONTRACT (an ANN probe batch, a held-out
eval set). Structural bounds are visible in the logical plan; contractual
bounds are not — ``bounded`` makes them visible, so the planaudit
forbidden-hint rule (tools/planaudit.audit_hints) can verify that every
surviving ``F.broadcast`` sits on a provably- or declaredly-bounded frame
and flag everything else.

The marker is a plain ``SubqueryAlias`` (``__bounded__<reason>``): alias
nodes are plan-only — they affect name resolution, never the result set —
and survive analysis, unlike unknown ``df.hint(...)`` names, which Spark
silently drops. Every call site is greppable (``grep -rn "bounded("``)
and carries its justification inline, so a reviewer can audit each claim
the way they would audit an ``unsafe`` block.

Use it ONLY where the bound is a real deployment contract that admission
enforces upstream (e.g. probe batches arrive <= a few thousand rows; an
eval set is curated, not corpus-sized). A frame that merely HAPPENS to be
small at today's sf must not be marked — drop the hint instead and let
AQE pick broadcast from its runtime size estimate.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: audit-recognized alias prefix (tools/planaudit treats the subtree as
#: bounded); keep in sync with planaudit.BOUNDED_ALIAS_PREFIX
BOUNDED_ALIAS_PREFIX = "__bounded__"


def bounded(df: DataFrame, reason: str) -> DataFrame:
    """Declare ``df`` bounded-by-contract for the forbidden-hint audit.

    ``reason`` states the bound and who enforces it, e.g.
    ``"probe_batch<=4096_admission"``. Alias names must be identifier-ish
    for safe reference; non-word characters are folded to ``_``.
    """
    slug = re.sub(r"\W+", "_", reason.strip())
    if not slug:
        raise ValueError("bounded() requires a non-empty reason")
    return df.alias(f"{BOUNDED_ALIAS_PREFIX}{slug}")
