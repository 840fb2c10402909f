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

#: NB: IVF's cell-assignment pass deliberately scores the corpus
#: against the BROADCAST centroid set (a bounded nested-loop — build
#: side capped at n_centroids rows).  It no longer appears here
#: because the shared ranked-assignment DataFrame is checkpointed, so
#: the guarded final plan starts at the checkpoint scan; the interior
#: pass is pinned by tests/test_dedup_similarity.py instead.
BANNED = ("CartesianProduct", "BroadcastNestedLoopJoin")


@pytest.mark.parametrize(
    "name", sorted(n for n in Q.SPARK_QUERIES if n not in _SKIP)
)
def test_no_cartesian_or_nested_loop(spark, sf_dir, name):
    df = Q.SPARK_QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = [b for b in BANNED if b in plan]
    assert not bad, f"{name}: {bad} in physical plan"
