"""Streaming ingress — S1 + §2.10 (SURVEY).

The reference's primary entry point is a hand-rolled micro-batch loop:
poll Kafka ≤10 records / 1 s, JSON-decode, validate the camelCase DTO,
fan out to the per-type pipeline (kafka_event_controller.py:57-81).
Structured Streaming restatement:

- **source** — ``readStream`` + ``from_json`` under the explicit
  request schema. Production uses the Kafka source
  (``kafka_request_stream``); tests and local runs use a file source
  (``file_request_stream``) with ``maxFilesPerTrigger`` playing the
  role of ``max_records`` — the rest of the pipeline is identical.
- **processing** — ``foreach_batch_pipeline`` routes every micro-batch
  through the *batch* engine (the same DataFrame plans the oracle
  checks), so streaming adds delivery semantics, not new operator
  code.
- **delivery** — checkpointed at-least-once into idempotent sinks
  (the metadata MERGE of sinks/writers.py is a natural idempotent
  target), an upgrade over the reference's auto-commit at-most-once
  (§2.10).
- **shutdown/backpressure** — ``stop_quietly`` mirrors the SIGTERM →
  consumer-stop path (main.py:22-43); ``maxOffsetsPerTrigger`` /
  ``maxFilesPerTrigger`` bound a trigger like the reference's
  semaphore(8) + batch cap.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from sbs_suptech_etl_v2_spark.operators.jsonops import REQUEST_SCHEMA

SNAKE_CASE = {
    "recordId": "record_id",
    "parentId": "parent_id",
    "key": "key",
    "sessionId": "session_id",
    "documentType": "document_type",
    "periodMonth": "period_month",
    "periodYear": "period_year",
}


def _decode(raw: DataFrame, value_col: str) -> DataFrame:
    """JSON value → snake_case DocumentContractState columns (C8)."""
    parsed = raw.select(F.from_json(F.col(value_col), REQUEST_SCHEMA).alias("r"))
    return parsed.select(
        *[F.col(f"r.{camel}").alias(snake) for camel, snake in SNAKE_CASE.items()]
    )


def file_request_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-source request stream (the test/local stand-in for Kafka).

    One JSON document per line per file; ``maxFilesPerTrigger`` bounds
    a micro-batch the way ``max_records=10`` bounds the reference's
    poll (kafka_event_controller.py:61).
    """
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(input_dir)
    )
    return _decode(raw, "value")


def kafka_request_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    max_offsets_per_trigger: int = 10,
) -> DataFrame:
    """Kafka request stream (production path; needs the spark-sql-kafka
    connector on the classpath — not bundled in this repo).

    ``maxOffsetsPerTrigger`` is the reference's poll cap; decode is the
    same ``from_json`` as the file source.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("maxOffsetsPerTrigger", max_offsets_per_trigger)
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )
    return _decode(raw, "value")


def foreach_batch_pipeline(
    stream: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Run the batch engine over every micro-batch with checkpointing.

    ``batch_fn(batch_df, batch_id)`` receives a plain DataFrame — the
    same relational/document operators the oracle checks run unchanged
    inside the stream. ``availableNow`` drains the backlog and stops
    (the pytest mode); production drops it for a continuous trigger.
    """
    writer = stream.writeStream.option("checkpointLocation", checkpoint_dir).foreachBatch(
        batch_fn
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stop_quietly(query: StreamingQuery, timeout_s: float = 60.0) -> None:
    """Graceful shutdown — the SIGTERM → stop path (main.py:22-43)."""
    try:
        query.awaitTermination(timeout_s)
    finally:
        if query.isActive:
            query.stop()
