"""End-to-end CPC pipeline test through the CLI surface, on synthetic
zip fixtures shaped per FIXTURES.md (the reference's missing
integration fixture, reconstructed)."""

from __future__ import annotations

import zipfile

import pytest

from etl_cpc_schema_spark import cli


@pytest.fixture()
def raw_zone(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    v = "202505"

    with zipfile.ZipFile(raw / f"CPCTitleList{v}.zip", "w") as zf:
        zf.writestr(
            "cpc-section-A.txt",
            "A HUMAN NECESSITIES\n"
            "A01 1 AGRICULTURE\n"
            "A01B 1 SOIL WORKING\n"
            "\n"
            "lowercase junk line\n",
        )
        zf.writestr("readme.txt", "not a section file\n")

    with zipfile.ZipFile(raw / f"CPCSymbolList{v}.zip", "w") as zf:
        zf.writestr(
            f"CPCSymbolList{v}.csv",
            "symbol,c1,c2,c3,c4,c5,status\n"
            "A,x,x,x,x,x,published\n"
            "A01,x,x,x,x,x,published\n"
            "A01B,x,x,x,x,x,published\n",
        )

    with zipfile.ZipFile(raw / f"CPCValidityFile{v}.zip", "w") as zf:
        zf.writestr(
            f"CPCValidityFile{v}.txt",
            "symbol\tvalid_from\tvalid_to\n"
            "A\t2020-01-01\t\n"
            "A01\t2020-01-01\t\n"
            "A01B\t2020-01-01\t\n",
        )

    with zipfile.ZipFile(raw / f"CPCSchemeXML{v}.zip", "w") as zf:
        zf.writestr(
            f"cpc-scheme-{v}.xml",
            "<classification-item><classification-symbol>A</classification-symbol>"
            "<classification-item><classification-symbol>A01</classification-symbol>"
            "<classification-item><classification-symbol>A01B</classification-symbol>"
            "</classification-item></classification-item></classification-item>",
        )
    return raw, v


def test_cli_run_clean_pipeline(spark, raw_zone, tmp_path):
    raw, v = raw_zone
    out = tmp_path / "out"
    rc = cli.main(
        ["run", "--data-dir", str(raw), "--out-dir", str(out), "--version", v]
    )
    assert rc == 0
    final = spark.read.parquet(str(out / "cpc_schema_final.parquet"))
    rows = {r["symbol"]: r.asDict() for r in final.collect()}
    # 'A' section row + A01 + A01B parse; junk/blank lines dropped.
    assert set(rows) == {"A", "A01", "A01B"}
    assert rows["A01B"]["cpc_schema_date"] == v
    assert rows["A01B"]["section"] == "A"
    assert rows["A01B"]["class"] == "A01"
    assert rows["A01B"]["subclass"] == "A01B"
    assert rows["A"]["level"] is None and rows["A01"]["level"] == 1


def test_cli_strict_gate_blocks_dirty_data(spark, raw_zone, tmp_path):
    raw, v = raw_zone
    # Poison the symbol list: drop A01B membership -> validation fails.
    (raw / f"CPCSymbolList{v}.zip").unlink()
    with zipfile.ZipFile(raw / f"CPCSymbolList{v}.zip", "w") as zf:
        zf.writestr(
            f"CPCSymbolList{v}.csv",
            "symbol,c1,c2,c3,c4,c5,status\nA,x,x,x,x,x,published\nA01,x,x,x,x,x,published\n",
        )
    out = tmp_path / "out2"
    rc = cli.main(
        ["run", "--data-dir", str(raw), "--out-dir", str(out), "--version", v]
    )
    assert rc == 1  # strict gate: no output written (reference main.py:101)
    assert not (out / "cpc_schema_final.parquet").exists()

    # --force (the reference's broken flag, working here) writes anyway.
    rc = cli.main(
        ["run", "--data-dir", str(raw), "--out-dir", str(out), "--version", v, "--force"]
    )
    assert rc == 0
    assert spark.read.parquet(str(out / "cpc_schema_final.parquet")).count() == 3
