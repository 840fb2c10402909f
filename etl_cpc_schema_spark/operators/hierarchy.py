"""Hierarchy (parent-pointer tree) operators.

The reference keeps the CPC scheme as a symbol→parent dict and only
ever asks one question of it: "who is my parent?"
(reference validator.py:53, 202-207).  The engine generalizes the
abstraction (SURVEY.md §1.1): the tree is an edge DataFrame, parent
lookup is a broadcast join (plans.cpc_pipeline), and ancestor paths
come from iterative broadcast self-joins — depth-bounded, so the plan
is a fixed pipeline of ``max_depth`` joins rather than unbounded
recursion.  CPC's hierarchy is ≤ ~15 levels; at 100 TB the edge table
is still dimension-sized, so every hop broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .iterutils import iter_checkpoint


def ancestor_paths(edges: DataFrame, max_depth: int = 16) -> DataFrame:
    """(symbol, ancestor, depth) for every ancestor within max_depth.

    depth 1 = parent, 2 = grandparent, …  Stops early when a level
    produces no rows.

    Each level is eagerly checkpointed (``iterutils.iter_checkpoint`` —
    reliable tier on a cluster, local in tests): the per-depth
    emptiness probe and the next hop's join read the materialized
    level instead of re-running the whole join chain (round 1 this was
    up to ``max_depth`` blocking mini-jobs each recomputing every
    prior hop), and the returned union is a flat scan of checkpointed
    levels — no join re-execution at action time.  Levels are
    dimension-sized (they live on the edge table), so the checkpoint
    storage is trivial.
    """
    level = iter_checkpoint(
        edges.filter(F.col("parent").isNotNull())
        .select("symbol", F.col("parent").alias("ancestor"))
        .withColumn("depth", F.lit(1))
    )
    out = level
    parent_of = edges.filter(F.col("parent").isNotNull()).select(
        F.col("symbol").alias("ancestor"), F.col("parent").alias("next_ancestor")
    )
    for depth in range(2, max_depth + 1):
        level = iter_checkpoint(
            level.join(F.broadcast(parent_of), "ancestor")
            .select(
                "symbol",
                F.col("next_ancestor").alias("ancestor"),
                F.lit(depth).alias("depth"),
            )
        )
        if level.isEmpty():
            break
        out = out.unionByName(level)
    return out


def root_of(edges: DataFrame, max_depth: int = 16) -> DataFrame:
    """(symbol, root): each symbol's top-most ancestor (itself if none)."""
    paths = ancestor_paths(edges, max_depth)
    deepest = paths.groupBy("symbol").agg(F.max("depth").alias("depth"))
    roots = paths.join(deepest, ["symbol", "depth"]).select(
        "symbol", F.col("ancestor").alias("root")
    )
    all_syms = edges.select("symbol").distinct()
    return (
        all_syms.join(roots, "symbol", "left")
        .select("symbol", F.coalesce(F.col("root"), F.col("symbol")).alias("root"))
    )
