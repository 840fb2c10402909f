"""Scheduled-run entry point e2e (reference etl_function.py analog):
first tick processes the new version, second tick is a
watermark-verified no-op, failures raise."""

from __future__ import annotations

import zipfile

import pytest

from etl_cpc_schema_spark import jobs

def test_scheduled_run_processes_then_noops(spark, raw_zone, tmp_path):  # noqa: F811
    raw, v = raw_zone
    out = tmp_path / "out"
    wm = str(tmp_path / "versions")

    got = jobs.scheduled_run(str(raw), str(out), wm, spark=spark)
    assert got == v
    assert (out / "cpc_schema_final.parquet").exists()
    assert [r["version"] for r in spark.read.parquet(wm).collect()] == [v]

    # second tick: no new version → no-op (output untouched, watermark stable)
    (out / "cpc_schema_final.csv").rename(out / "tombstone.csv")
    assert jobs.scheduled_run(str(raw), str(out), wm, spark=spark) is None
    assert not (out / "cpc_schema_final.csv").exists()  # pipeline did NOT re-run
    assert spark.read.parquet(wm).count() == 1


def test_scheduled_run_picks_up_new_version(spark, raw_zone, tmp_path):  # noqa: F811
    raw, v = raw_zone
    out = tmp_path / "out"
    wm = str(tmp_path / "versions")
    assert jobs.scheduled_run(str(raw), str(out), wm, spark=spark) == v

    # a newer version lands in the raw zone → next tick processes it
    v2 = "202508"
    for stem in ("CPCTitleList", "CPCSymbolList", "CPCValidityFile", "CPCSchemeXML"):
        old = raw / f"{stem}{v}.zip"
        new = raw / f"{stem}{v2}.zip"
        new.write_bytes(old.read_bytes())
    # rename the inner members that embed the version where required
    with zipfile.ZipFile(raw / f"CPCSymbolList{v2}.zip", "w") as zf:
        zf.writestr(
            f"CPCSymbolList{v2}.csv",
            "symbol,c1,c2,c3,c4,c5,status\n"
            "A,x,x,x,x,x,published\n"
            "A01,x,x,x,x,x,published\n"
            "A01B,x,x,x,x,x,published\n",
        )
    with zipfile.ZipFile(raw / f"CPCValidityFile{v2}.zip", "w") as zf:
        zf.writestr(
            f"CPCValidityFile{v2}.txt",
            "symbol\tvalid_from\tvalid_to\nA\t2020-01-01\t\nA01\t2020-01-01\t\nA01B\t2020-01-01\t\n",
        )
    assert jobs.scheduled_run(str(raw), str(out), wm, spark=spark) == v2
    assert {r["version"] for r in spark.read.parquet(wm).collect()} == {v, v2}


def test_scheduled_run_raises_on_pipeline_failure(spark, raw_zone, tmp_path):  # noqa: F811
    raw, v = raw_zone
    # poison the symbol list so strict validation fails (as in test_cli)
    (raw / f"CPCSymbolList{v}.zip").unlink()
    with zipfile.ZipFile(raw / f"CPCSymbolList{v}.zip", "w") as zf:
        zf.writestr(
            f"CPCSymbolList{v}.csv",
            "symbol,c1,c2,c3,c4,c5,status\nA,x,x,x,x,x,published\nA01,x,x,x,x,x,published\n",
        )
    wm = str(tmp_path / "versions")
    with pytest.raises(RuntimeError, match="failed for version"):
        jobs.scheduled_run(str(raw), str(tmp_path / "out"), wm, spark=spark)
    # failed runs must NOT advance the watermark (table never created)
    import os

    assert not os.path.exists(wm)


def test_scheduled_run_catches_up_oldest_first(spark, raw_zone, tmp_path):  # noqa: F811
    """Two versions pending at once: BOTH process in one tick, oldest
    first, so the fixed output path ends holding the NEWEST version
    (newest-first would leave stale output after catch-up)."""
    raw, v = raw_zone
    v2 = "202508"
    for stem in ("CPCTitleList", "CPCSchemeXML"):
        (raw / f"{stem}{v2}.zip").write_bytes((raw / f"{stem}{v}.zip").read_bytes())
    with zipfile.ZipFile(raw / f"CPCSymbolList{v2}.zip", "w") as zf:
        zf.writestr(
            f"CPCSymbolList{v2}.csv",
            "symbol,c1,c2,c3,c4,c5,status\n"
            "A,x,x,x,x,x,published\nA01,x,x,x,x,x,published\nA01B,x,x,x,x,x,published\n",
        )
    with zipfile.ZipFile(raw / f"CPCValidityFile{v2}.zip", "w") as zf:
        zf.writestr(
            f"CPCValidityFile{v2}.txt",
            "symbol\tvalid_from\tvalid_to\nA\t2020-01-01\t\nA01\t2020-01-01\t\nA01B\t2020-01-01\t\n",
        )
    out = tmp_path / "out"
    wm = str(tmp_path / "versions")
    assert jobs.scheduled_run(str(raw), str(out), wm, spark=spark) == v2
    assert {r["version"] for r in spark.read.parquet(wm).collect()} == {v, v2}
    final = spark.read.parquet(str(out / "cpc_schema_final.parquet"))
    # output holds the NEWEST version's stamp
    assert {r["cpc_schema_date"] for r in final.collect()} == {v2}
