"""Command-line entry point (reference cli/commands.py analog).

``python -m etl_cpc_schema_spark.cli run --data-dir DIR --version V``
runs the CPC pipeline over an extracted raw zone; ``--force`` actually
works here (the reference's ``--force`` path raised TypeError,
orchestrator.py:65).  Exit code 1 on validation failure, mirroring
cli/commands.py:54-58.

argparse instead of typer: no third-party CLI dependency.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from .plans.cpc_pipeline import run_pipeline
from .session import get_spark
from .sources import readers as R
from .sources.xml_scheme import read_scheme_edges
from .functions.parsing import parse_title_lines


def run(data_dir: str, version: str, out_dir: str, strict: bool = True) -> int:
    spark = get_spark(app_name="cpc_etl_run")
    raw = Path(data_dir)

    title_lines = R.read_zip_members(
        spark, str(raw / f"CPCTitleList{version}.zip"), member_prefix="cpc-section-"
    )
    titles = parse_title_lines(title_lines)

    sym_lines = R.drop_header_per_file(
        R.read_zip_members(
            spark,
            str(raw / f"CPCSymbolList{version}.zip"),
            member_suffix=".csv",
        )
    )
    symbol_list = R.parse_symbol_list_lines(sym_lines)

    val_lines = R.drop_header_per_file(
        R.read_zip_members(
            spark,
            str(raw / f"CPCValidityFile{version}.zip"),
            member_suffix=".txt",
        )
    )
    validity = R.parse_validity_lines(val_lines)

    edges = read_scheme_edges(
        spark, str(raw / f"CPCSchemeXML{version}.zip"), from_zip=True
    )

    # `bad` arrives persisted from run_pipeline (the gate probe and the
    # report below share one materialization); `final` is persisted here
    # across its two sink writes + row count.
    final, bad = run_pipeline(titles, symbol_list, validity, edges, version, strict)
    n_bad = bad.count()
    if n_bad:
        print(f"{n_bad} invalid symbols; first 10:")
        for row in bad.select("symbol", "validation_warnings").limit(10).collect():
            print(f"  {row['symbol']}: {row['validation_warnings']}")
    if final is None:
        bad.unpersist()
        print("validation failed; no output written")
        return 1
    final = final.persist()
    out = Path(out_dir)
    R.write_parquet(final, str(out / "cpc_schema_final.parquet"))
    R.write_csv(final, str(out / "cpc_schema_final.csv"))
    print(f"wrote {final.count()} rows to {out}")
    final.unpersist()
    bad.unpersist()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl-cpc-spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser("run", help="run the CPC ETL pipeline")
    runp.add_argument("--data-dir", default="data/raw")
    runp.add_argument("--out-dir", default="data/processed")
    runp.add_argument("--version", required=True)
    runp.add_argument(
        "--force", action="store_true",
        help="write output even when validation finds invalid symbols",
    )
    args = p.parse_args(argv)
    if args.cmd == "run":
        return run(args.data_dir, args.version, args.out_dir, strict=not args.force)
    return 2


if __name__ == "__main__":
    sys.exit(main())
