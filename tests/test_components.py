"""Connected-components operator: chains, cliques, isolated pairs."""

from __future__ import annotations

from etl_cpc_schema_spark.operators.components import (
    connected_components,
    connected_components_star,
)


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


def test_exhausted_hashmin_falls_back_to_star(spark):
    # a 6-node path needs ~5 propagation rounds; cap at 2 -> hash-min
    # cannot finish and must hand off to star contraction, not raise
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6, 0, -1)], "d1 bigint, d2 bigint"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, max_iter=2).collect()
    }
    assert got == {i: 1 for i in range(1, 8)}


def test_star_long_chain_converges(spark):
    # VERDICT r3 #4: 50-node chain (diameter 49) — hash-min would need
    # 49 rounds; star contraction must close it in O(log n)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 50)], "d1 bigint, d2 bigint"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(edges).collect()
    }
    assert got == {i: 1 for i in range(1, 51)}


def test_star_matches_hashmin_on_mixed_graph(spark):
    # chains + cliques + isolated pair: both strategies, same labels
    pairs = (
        [(1, 2), (2, 3), (3, 4), (10, 11)]
        + [(20, 21), (21, 22), (20, 22)]
        + [(30 + i, 31 + i) for i in range(8)]
    )
    edges = spark.createDataFrame(pairs, "d1 bigint, d2 bigint")
    hm = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    st = {
        r["node"]: r["component"]
        for r in connected_components_star(edges).collect()
    }
    assert hm == st


def test_star_reversed_and_selfloop_edges(spark):
    edges = spark.createDataFrame(
        [(9, 2), (2, 1), (5, 5)], "d1 bigint, d2 bigint"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(edges).collect()
    }
    # self-loop (5,5) is dropped; 9-2-1 collapses to min 1
    assert got == {1: 1, 2: 1, 9: 1}


def test_star_matches_hashmin_on_random_graph(spark):
    """Randomized (but deterministic) parity: 150 nodes, ~200 md5-derived
    edges — star contraction and hash-min must produce identical labels
    on a graph with mixed component shapes."""
    import hashlib

    def h(i, salt):
        return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)

    pairs = [
        (h(i, "a") % 150, h(i, "b") % 150) for i in range(200)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = spark.createDataFrame(pairs, "d1 bigint, d2 bigint")
    hm = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    st = {
        r["node"]: r["component"]
        for r in connected_components_star(edges).collect()
    }
    assert hm == st and len(hm) > 100


def test_default_budget_quotient_fallback_long_chain(spark):
    """A chain deeper than the default hash-min budget takes the
    quotient-graph star fallback (round 13) and still produces the
    exact min-label components, including a separate shallow clique
    that the hash-min prefix already finished (all-self-loop in the
    quotient -> absent from the star result -> coalesce path)."""
    chain = [(i, i + 1) for i in range(1, 40)]  # diameter 39 >> budget 6
    clique = [(100, 101), (101, 102), (100, 102)]
    edges = spark.createDataFrame(chain + clique, "d1 bigint, d2 bigint")
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    want = {i: 1 for i in range(1, 41)}
    want.update({100: 100, 101: 100, 102: 100})
    assert got == want


def test_union_find_min_label_semantics():
    """Driver-side quotient finisher: exact min-label components,
    order-independent (round 14)."""
    from etl_cpc_schema_spark.operators.components import (
        _union_find_components,
    )

    rows = [(5, 3), (3, 9), (20, 21), (9, 1), (7, 7)]
    got = dict(_union_find_components(rows))
    assert got == {1: 1, 3: 1, 5: 1, 9: 1, 7: 7, 20: 20, 21: 20}
    # reversed processing order: identical result
    got_rev = dict(_union_find_components(list(reversed(rows))))
    assert got_rev == got


def test_quotient_local_vs_star_paths_agree(spark, monkeypatch):
    """The round-14 driver-side quotient closure and the star fallback
    must label identically; forcing the bound to 0 exercises the star
    path on the same deep graph the local path closes by default."""
    from etl_cpc_schema_spark.operators import components as C

    chain = [(i, i + 1) for i in range(1, 30)]
    clique = [(100, 101), (101, 102), (100, 102)]
    edges = spark.createDataFrame(chain + clique, "d1 bigint, d2 bigint")

    local = {
        r["node"]: r["component"]
        for r in C.connected_components(edges).collect()
    }
    monkeypatch.setattr(C, "QUOTIENT_LOCAL_MAX_EDGES", 0)
    star = {
        r["node"]: r["component"]
        for r in C.connected_components(edges).collect()
    }
    assert local == star
    want = {i: 1 for i in range(1, 31)}
    want.update({100: 100, 101: 100, 102: 100})
    assert local == want
