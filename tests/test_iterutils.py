"""iter_checkpoint tier selection: local by default, reliable when the
session has a checkpoint directory (VERDICT r3 #5 wired it into the
iterative operators — this pins the selection logic itself)."""

from __future__ import annotations

import os

from etl_cpc_schema_spark.operators.components import connected_components
from etl_cpc_schema_spark.operators.iterutils import iter_checkpoint, release


def test_local_tier_without_checkpoint_dir(spark):
    assert spark.sparkContext.getCheckpointDir() is None
    df = iter_checkpoint(spark.range(10))
    assert df.count() == 10
    release(df)  # no-op beyond unpersist; must not raise


def test_reliable_tier_with_checkpoint_dir(spark, tmp_path):
    sc = spark.sparkContext
    ckpt = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt)
    try:
        df = iter_checkpoint(spark.range(10))
        assert df.count() == 10
        # a reliable checkpoint writes RDD blocks under the dir
        found = [
            os.path.join(r, f) for r, _, fs in os.walk(ckpt) for f in fs
        ]
        assert found, "no checkpoint files written in reliable tier"
        # iterative operators run unchanged through the reliable tier
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "d1 bigint, d2 bigint"
        )
        got = {
            r["node"]: r["component"]
            for r in connected_components(edges).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    finally:
        # reset to the local tier for the rest of the suite (the shared
        # session outlives this test); None maps to null -> Option.empty
        sc._jsc.sc().setCheckpointDir(None)
    assert sc.getCheckpointDir() is None
