"""Connected components over a pair graph — dedup clustering.

Near-dup pair emitters (``operators.dedup``) produce edges; keeping
one document per duplicate CLUSTER requires the transitive closure of
those pairs.  Spark-native hash-min label propagation (no GraphX/
GraphFrames dependency):

  label(v) ← min(label(v), min over neighbors' labels)

iterated to fixpoint.  Converges in O(graph diameter) rounds — near-dup
graphs are overwhelmingly tiny cliques/chains, so 3-5 rounds in
practice.  Each round is one join + one groupBy (shuffle-bounded by
edge count), and each round's result is eagerly ``localCheckpoint``-ed
so the next round and the convergence probe read materialized state
instead of re-running the whole chain (the same discipline as
``hierarchy.ancestor_paths``).

At 100 TB: rounds stay the same; the per-round shuffle is by node id
(well-distributed).  For adversarial long-chain graphs switch to the
large-star/small-star variant (alternating, provably O(log n) rounds)
— same primitive ops, different edge rewrite per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a_col: str = "d1",
    b_col: str = "d2",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component): component = min node id reachable from node.

    ``edges`` is undirected (each pair listed once in either order).
    Isolated nodes absent from ``edges`` are absent from the output —
    left-join the full node set afterwards if singleton clusters are
    needed.
    """
    # checkpoint the symmetrized edge list ONCE: every propagation round
    # joins against it, and without this each round would re-execute the
    # whole upstream pair-generation pipeline (e.g. LSH candidate
    # emission) from scratch
    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nb_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nb_label"))
        )
        new_labels = (
            labels.join(nb_min, labels.node == nb_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nb_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "the graph has a longer path than max_iter; raise max_iter or "
            "switch to the large-star/small-star variant"
        )
    return labels.select("node", F.col("label").alias("component"))
