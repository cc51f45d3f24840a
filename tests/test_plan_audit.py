"""Plan audit: no query may plan a CartesianProduct, and nested-loop
joins are forbidden except where a broadcast cross join against a
literal 1-row dimension is the intended plan.  This is the scale guard —
a cartesian that is invisible at sf0.001 is fatal at 100 TB.
"""

from __future__ import annotations

import pytest

from atd_data_lake_spark.queries import QUERIES

# Intentional BroadcastNestedLoopJoin: publish_agg attaches a 1-row
# (atd_device_id, primary_st, cross_st) device dim via
# crossJoin(broadcast(...)) — an O(n) pass-through, the right plan for a
# single-row dimension (pipelines/gs.py publish_agg).
BNLJ_ALLOWED = {"pipe_gs_publish"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_or_nested_loop(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a nested-loop join"
        )
