"""Connected components over a pair graph — dedup clustering.

Near-dup pair emitters (``operators.dedup``) produce edges; keeping
one document per duplicate CLUSTER requires the transitive closure of
those pairs.  Two Spark-native strategies (no GraphX/GraphFrames
dependency):

* **hash-min label propagation** (:func:`connected_components`) —
  ``label(v) ← min(label(v), min over neighbors' labels)`` iterated to
  fixpoint.  O(graph diameter) rounds; near-dup graphs are
  overwhelmingly tiny cliques/chains, so 3-5 rounds in practice.  Each
  round is one join + one groupBy (shuffle-bounded by edge count).
* **large-star/small-star contraction**
  (:func:`connected_components_star`) — the alternating edge-rewrite
  algorithm of Kiveris et al., "Connected Components in MapReduce and
  Beyond" (SoCC'14).  O(log n) rounds REGARDLESS of diameter, so it
  handles the adversarial long-chain graphs where hash-min would need
  a round per hop.  Per round: two groupBy-min + two joins.

``connected_components`` runs the cheap hash-min path and falls back
to star contraction automatically if the diameter exceeds its round
budget, so callers always converge.

Every round's state goes through ``iterutils.iter_checkpoint`` (the
reliable tier on a cluster with a checkpoint dir, localCheckpoint in
tests) so the next round and the convergence probe read materialized
blocks instead of re-running the whole chain, and superseded rounds
are ``release``-d once the probe no longer needs them.

At 100 TB: the per-round shuffle is by node id (well-distributed);
star contraction strictly shrinks the edge set toward one star per
component, so late rounds are cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .iterutils import checkpoint_with_probe, iter_checkpoint, release


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: connect every neighbor LARGER than u to
    the minimum of u's closed neighborhood.  ``edges`` is an
    undirected pair list (u, v); output likewise, always (larger,
    smaller)."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", "u").alias("m"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient every edge large→small, then
    connect each of u's smaller neighbors (and u itself) to the
    minimum neighbor."""
    d = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    nbr = (
        d.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    own = mins.select("u", F.col("m").alias("v"))
    return nbr.union(own).distinct()


def connected_components_star(
    edges: DataFrame,
    a_col: str = "d1",
    b_col: str = "d2",
    max_rounds: int = 30,
) -> DataFrame:
    """(node, component) via alternating large-star/small-star rounds.

    Converges in O(log n) rounds on ANY graph shape (Kiveris et al.
    SoCC'14, Theorem 4.1) — the path a 20-round hash-min budget cannot
    close is handled here.  Same output contract as
    :func:`connected_components`: component = min node id, isolated
    nodes absent.
    """
    e = iter_checkpoint(
        edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")).filter(
            F.col("u") != F.col("v")
        )
    )
    n_prev: int | None = None
    for _ in range(max_rounds):
        # the count that materializes the round IS the first half of
        # the fixpoint probe (checkpoint_with_probe, round 13), and
        # the previous round's count is carried forward instead of
        # re-counted — one action per round on the converging path
        new_e, n_new = checkpoint_with_probe(
            _small_star(_large_star(e)), lambda d: d.count()
        )
        if n_prev is None:
            n_prev = e.count()
        # counts first (cheap) short-circuits exceptAll
        stable = (
            n_new == n_prev and new_e.exceptAll(e).limit(1).count() == 0
        )
        release(e)
        e = new_e
        n_prev = n_new
        if stable:
            break
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds — "
            "theoretical bound is O(log n); raise max_rounds"
        )
    # at the fixpoint every edge is a star spoke (node, component-min);
    # roots appear only on the small side, so add their self-labels
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(e.select(F.col("v").alias("node"), F.col("v").alias("component")))
        .distinct()
    )


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

    Runs hash-min propagation (cheapest per round, O(diameter)
    rounds); if the graph's diameter exceeds ``max_iter`` the call
    falls back to :func:`connected_components_star` instead of
    failing, so adversarial long chains still converge.
    """
    # checkpoint the symmetrized edge list ONCE: every propagation round
    # joins against it, and without this each round would re-execute the
    # whole upstream pair-generation pipeline (e.g. LSH candidate
    # emission) from scratch
    sym = iter_checkpoint(
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst")).union(
            edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
    )
    ckpt = iter_checkpoint(
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    labels = ckpt
    for _ in range(max_iter):
        nb_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nb_label"))
        )
        # the convergence flag is computed DURING the update (labels
        # only ever decrease, so changed ⟺ a neighbor label was
        # smaller), and the probe aggregation is the SAME action that
        # materializes the round (checkpoint_with_probe, round 13):
        # one driver round-trip per round instead of two
        new_ckpt, changed = checkpoint_with_probe(
            labels.join(nb_min, labels.node == nb_min.src, "left").select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nb_label"), F.col("label"))
                ).alias("label"),
                (F.col("nb_label") < F.col("label")).alias("changed"),
            ),
            lambda d: d.agg(
                F.count(F.when(F.col("changed"), True))
            ).collect()[0][0],
        )
        release(ckpt)  # release the materialized round, not a projection
        ckpt = new_ckpt
        labels = new_ckpt.select("node", "label")
        if changed == 0:
            break
    else:
        # diameter > max_iter: fall back to the O(log n) star-contraction
        # path, feeding it the already-checkpointed symmetrized edges so
        # the full upstream pair-generation lineage (e.g. LSH candidate
        # emission) is not re-executed.  Star's first iter_checkpoint is
        # eager and the convergence loop runs entirely inside the call,
        # so sym is safe to release once it returns.
        release(ckpt)
        result = connected_components_star(sym, "src", "dst")
        release(sym)
        return result
    return labels.select("node", F.col("label").alias("component"))
