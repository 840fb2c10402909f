"""Shared iteration utilities for the iterative operators.

The iterative operators (connected components, ancestor paths, LSH
signature reuse) need each round's state MATERIALIZED so the next
round and any convergence probe read stored blocks instead of
replaying the whole lineage.  ``localCheckpoint`` does that, but its
blocks live only in executor storage — on a real cluster a single
executor loss (preemption, OOM kill) discards the progress of every
round so far and the job cannot recompute the truncated lineage.

``iter_checkpoint`` picks the durability tier at call time:

- if the session has a RELIABLE checkpoint directory configured
  (``spark.sparkContext.setCheckpointDir(...)`` — HDFS/S3/any Hadoop
  FS), use ``DataFrame.checkpoint``: blocks are written to that
  filesystem and survive executor loss, which is what a 20-round
  connected-components job over 100 TB of near-dup edges needs;
- otherwise fall back to ``localCheckpoint`` — correct and fast for
  local mode / tests, with the documented single-process durability.

Callers opt in to durability purely through session configuration;
operator signatures stay unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def iter_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` for iterative reuse (reliable if configured).

    Uses a cluster-durable ``checkpoint`` when the session has a
    checkpoint dir (survives executor loss), else ``localCheckpoint``.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def release(df: DataFrame) -> None:
    """Drop a superseded checkpoint's storage, ignoring failures.

    Each propagation round produces a new materialized state; without
    an explicit unpersist the superseded blocks accumulate in the
    block manager for the lifetime of the session (ADVICE round 2).
    Reliable checkpoints clean up via ``spark.cleaner.referenceTracking``;
    local ones are unpersisted here.
    """
    try:
        df.unpersist()
    except Exception:  # pragma: no cover - best-effort storage release
        pass
