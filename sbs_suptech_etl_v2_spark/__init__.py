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
  schemas    — StructTypes for the document-pipeline data model
  functions/ — scalar column functions (SURVEY §2.8 C1-C12), text, vectors
  operators/ — relational, dedup, similarity, text-analysis, documents
  plans/     — end-to-end ETL plans (route → stages → merge → notify)
  sources/   — request decode (Kafka/HTTP shape), fake OCR block source
  sinks/     — metadata merge-upsert, notification sink
  streaming/ — Structured Streaming ingress (foreachBatch into the plan)
"""

__version__ = "0.1.0"
