"""aquiles_etl_pipeline_spark — a PySpark-native analytics/ETL engine with the
capability surface of JulianSalinas/aquiles-etl-pipeline, re-expressed
Spark-first (DataFrame/Catalyst, Structured Streaming, Arrow UDF escapes).

Layout:
  functions/   scalar transform library (SURVEY.md §2.3)
  pipeline/    canonicalize + wide-record transform chain (§1.2, §3.1)
  staging/     normalization split into batch-stamped staging tables (§2.4)
  merge/       upsert (MERGE) jobs owning the reference's stored procs (§2.6)
  sources/     CSV / binary / extractor ingestion + validation gates (§2.1)
  relational/  general query surface over the star schema
  streaming/   Structured Streaming ingestion + event-time operators (§2.5)
  llmdata/     dedup / similarity / text-analysis / multimodal operators
"""

__version__ = "0.1.0"
