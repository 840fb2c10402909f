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

Checkpoint-file hygiene: reliable checkpoint files are deleted by the
context cleaner only when ``spark.cleaner.referenceTracking
.cleanCheckpoints`` is ``true`` — Spark's DEFAULT IS FALSE, so
``session.get_spark`` sets it; a session built elsewhere should do the
same or a multi-round cluster job leaks checkpoint-dir files for its
whole lifetime.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)


def iter_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` for iterative reuse (reliable if configured).

    Uses a cluster-durable ``checkpoint`` when the session has a
    checkpoint dir (survives executor loss), else ``localCheckpoint``.
    The sparkContext probe is wrapped because Spark Connect sessions
    raise ``PySparkNotImplementedError`` on ``sparkContext`` access —
    there the local tier is the only one reachable from the client.
    """
    try:
        checkpoint_dir = df.sparkSession.sparkContext.getCheckpointDir()
    except Exception:  # Spark Connect: no sparkContext on the client
        checkpoint_dir = None
    if checkpoint_dir is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def release(df: DataFrame) -> None:
    """Drop a superseded checkpoint's storage.

    Each propagation round produces a new materialized state; without
    an explicit unpersist the superseded blocks accumulate in the
    block manager for the lifetime of the session (ADVICE round 2).

    MUST be called only after the LAST action that touches the
    superseded state (e.g. after the convergence probe comparing old
    vs new labels has run): a localCheckpoint-ed DataFrame has no
    replayable lineage, so any later action on a released handle
    recomputes nothing — it fails or silently rescans empty blocks.
    Failures are logged, not raised — a missed unpersist degrades
    memory, not correctness.
    """
    try:
        df.unpersist()
    except Exception as exc:  # pragma: no cover - best-effort storage release
        _log.debug("release(): unpersist failed (ignored): %s", exc)
