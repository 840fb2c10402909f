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

BANNED = ("CartesianProduct", "BroadcastNestedLoopJoin")

#: queries whose plan DELIBERATELY contains a bounded broadcast
#: nested-loop: IVF cell assignment scores the corpus against the
#: broadcast centroid set (build side capped at n_centroids rows —
#: dimension-sized by construction, not a dropped join condition).
#: Everything else stays banned.
_INTENTIONAL_BNLJ = {"ann_ivf_topk"}


@pytest.mark.parametrize(
    "name", sorted(n for n in Q.SPARK_QUERIES if n not in _SKIP)
)
def test_no_cartesian_or_nested_loop(spark, sf_dir, name):
    df = Q.SPARK_QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    banned = BANNED
    if name in _INTENTIONAL_BNLJ:
        banned = ("CartesianProduct",)  # BNLJ allowed, must be broadcast
        assert "BroadcastNestedLoopJoin" in plan, (
            f"{name}: expected the bounded broadcast NLJ build — if the "
            "centroid side stopped broadcasting this became a real "
            "cartesian"
        )
    bad = [b for b in banned if b in plan]
    assert not bad, f"{name}: {bad} in physical plan"
