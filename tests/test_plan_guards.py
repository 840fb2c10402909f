"""Plan-shape guards across EVERY declared query: no accidental
cartesian products or nested-loop joins may enter any plan (the
classic silent 100 TB killer when a join condition is dropped or a
non-equi predicate sneaks in)."""

from __future__ import annotations

import pytest

from etl_cpc_schema_spark import queries as Q

#: streaming queries execute a stream to produce their result; their
#: returned plan is a memory-sink scan, so there is nothing to guard.
_SKIP = tuple(
    n for n in Q.SPARK_QUERIES if n.startswith("stream_")
)

#: Round 5 moved IVF cell assignment to an Arrow/BLAS map pass, so the
#: one former documented exception (its bounded broadcast-NLJ centroid
#: scoring) no longer exists in ANY plan — the ban is now absolute.
BANNED = ("CartesianProduct", "BroadcastNestedLoopJoin")


@pytest.mark.parametrize(
    "name", sorted(n for n in Q.SPARK_QUERIES if n not in _SKIP)
)
def test_no_cartesian_or_nested_loop(spark, sf_dir, name):
    df = Q.SPARK_QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = [b for b in BANNED if b in plan]
    assert not bad, f"{name}: {bad} in physical plan"
