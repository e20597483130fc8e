"""sbs_suptech_etl_v2_spark — PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of
the reference document-ETL service ``henrymedina447/sbs-suptech-etl-v2``
(see SURVEY.md for the operator inventory with file:line citations),
re-expressed as idiomatic Spark DataFrame / SQL / Structured Streaming
plans, plus LLM-data-pipeline extension operators (dedup, similarity
search, text analysis, multimodal columns) designed for 100 TB scale.

Layout:
  session    — SparkSession builder (AQE, Arrow, UTC)
  io         — parquet readers / view registration for the test tables
  registry   — QUERIES/ORACLE: the driver-checked query surface
  functions/ — scalar column functions (SURVEY §2.8 C1-C12), skew salting
  operators/ — relational, dedup, similarity, textops, documents,
               extraction, blocks, jsonops, multimodal
  ports/     — transform (LLM) and extract (OCR) ports: retry/backoff,
               bounded concurrency, deterministic fakes
  plans/     — end-to-end ETL plan (route → stages → merge → notify)
  sources/   — HTTP-batch entry, binaryFile prefix-listing scan
  sinks/     — text artifacts, metadata MERGE, notification chunking, lake
  streaming/ — readStream ingress, foreachBatch, stateful dedup
"""

__version__ = "0.1.0"
