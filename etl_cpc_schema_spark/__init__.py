"""etl_cpc_schema_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference ETL
pipeline ``CompanyGenomics/etl-cpc-schema`` (CPC bulk-data extract /
transform / validate / load) as an idiomatic Apache Spark engine:

* one lazy DataFrame plan per pipeline (no eager per-row loops),
* explicit ``StructType`` contracts for every table,
* native Column expressions for all parse/validate logic (no Python
  UDFs in the parity path),
* broadcast hash joins for every dimension lookup,
* scale extensions (dedup, similarity search, text analysis,
  multimodal plumbing) built for 100 TB inputs.

Package layout::

    session.py    SparkSession factory (AQE, UTC, Arrow enabled)
    schemas.py    StructType contracts (SURVEY.md §1.4)
    functions/    pure Column-expression libraries (parsing, validation,
                  hashing, text, vectors)
    sources/      readers (parquet/csv/tsv/text/xml), manifest control plane
    operators/    lookup joins, dedup, similarity, multimodal
    plans/        end-to-end pipeline assemblies
    streaming/    Structured Streaming ingest + windowed aggregation
    queries.py    declared correctness queries + DuckDB oracle SQL
"""

__version__ = "0.1.0"
