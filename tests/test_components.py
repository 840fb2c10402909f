"""Connected-components operator: chains, cliques, isolated pairs."""

from __future__ import annotations

from etl_cpc_schema_spark.operators.components import connected_components


def test_chain_and_separate_pair(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "d1 bigint, d2 bigint"
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cycle_converges(spark):
    edges = spark.createDataFrame(
        [(5, 6), (6, 7), (7, 5)], "d1 bigint, d2 bigint"
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {5: 5, 6: 5, 7: 5}


def test_reversed_edge_order(spark):
    # edges listed high->low must yield the same min labels
    edges = spark.createDataFrame([(9, 2), (2, 1)], "d1 bigint, d2 bigint")
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 9: 1}


def test_components_raises_when_not_converged(spark):
    import pytest

    # a 6-node path needs ~5 propagation rounds; cap at 2 -> must raise
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6, 0, -1)], "d1 bigint, d2 bigint"
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=2)
