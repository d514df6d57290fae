"""Registry-wide physical-plan sweep (VERDICT r4 item 5): every
registered query's plan at sf0.001 must be free of CartesianProduct,
conditioned BroadcastNestedLoopJoin (band/theta joins), and
row-at-a-time BatchEvalPython nodes — rules in
plato_spark/engine/plan_audit.py, exceptions in tests/plan_allowlist.py.

Building a query's DataFrame executes any driver-side fixpoint loops it
contains, so the full sweep costs roughly one registry pass at sf0.001
(~20 min on local[4]).  Set PLAN_SWEEP=0 to skip while iterating on
unrelated code; CI/full runs keep it on.
"""

import os

import pytest

import __spark_entry__ as entrymod
from plato_spark.engine.plan_audit import formatted_plan, plan_violations
from tests.plan_allowlist import ALLOW

SF_DIR = "/root/testdata/sf0.001"

_names = list(entrymod.queries().keys())


@pytest.mark.skipif(os.environ.get("PLAN_SWEEP", "1") == "0",
                    reason="PLAN_SWEEP=0")
@pytest.mark.parametrize("name", _names)
def test_plan_is_clean(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    found = plan_violations(formatted_plan(df))
    if name in ALLOW:
        # the allowlist covers ONLY the bounded/fenced BNLJ; a
        # CartesianProduct or row-Python UDF still fails here
        hard = [v for v in found if "BroadcastNestedLoopJoin" not in v]
        assert not hard, f"{name} (allowlisted for BNLJ only): {hard}"
        pytest.skip(f"allowlisted: {ALLOW[name]}")
    assert not found, f"{name}: {found}"
