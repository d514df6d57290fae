"""Physical-plan hygiene audit — the plan is part of the contract at 100TB.

Shared by tools/plan_sweep.py and tests/test_plan_sweep.py (VERDICT r4
item 5: a registry-wide sweep, not just hand-picked operators).

Rules:

- ``CartesianProduct`` anywhere is a violation — an unconditioned
  all-pairs join never survives a 100x scale-up.
- ``BatchEvalPython`` anywhere is a violation — row-at-a-time Python
  UDFs are the slow path; Arrow nodes (``ArrowEvalPython``,
  ``MapInPandas``, ``FlatMapGroupsInPandas``, ``FlatMapGroupsInPandasWithState``)
  are the sanctioned Python escape hatch and are NOT flagged.
- ``BroadcastNestedLoopJoin`` is allowed ONLY when its detail block
  shows ``Join condition: None`` — the documented idiom of
  cross-joining ONE broadcast row (a global total / scalar aggregate)
  onto a table, which is bounded by definition.  A BNLJ *with* a
  condition is a band/theta join that re-scans the broadcast side per
  row and must be rewritten as an explode+equi-join (the stickiness /
  interval_counts idiom) or explicitly allowlisted with a reason.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

__all__ = ["formatted_plan", "plan_violations"]

_BNLJ_BLOCK = re.compile(
    r"^\(\d+\) BroadcastNestedLoopJoin.*?(?=^\(\d+\) |\Z)",
    re.MULTILINE | re.DOTALL,
)


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_violations(plan: str) -> list[str]:
    """Return a list of human-readable violations found in a formatted
    plan (empty list = clean)."""
    out: list[str] = []
    if "CartesianProduct" in plan:
        out.append("CartesianProduct")
    if "BatchEvalPython" in plan:
        out.append("BatchEvalPython (row-at-a-time Python UDF)")
    if "BroadcastNestedLoopJoin" in plan:
        blocks = _BNLJ_BLOCK.findall(plan)
        # The tree section mentions the node without a detail block;
        # detail blocks carry "Join condition:".  If we found none,
        # fall back to flagging (formatted output changed?).
        conditioned = [
            b for b in blocks
            if "Join condition:" in b and "Join condition: None" not in b
        ]
        if conditioned or not blocks:
            out.append("BroadcastNestedLoopJoin with a join condition "
                       "(band/theta join — rewrite as explode+equi-join)")
    return out
