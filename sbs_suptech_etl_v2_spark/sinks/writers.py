"""Sink layer — K1/K2/K3/K4 (SURVEY §2.2).

The reference's three load targets, restated as lake/batch writers with
the same observable semantics:

- **K1 S3 text-object sink** — one ``txt/{record_id}.txt`` object per
  row (s3_loader_document.py:17-18; key format workflow_polizas.py:85).
  ``write_text_artifacts`` writes one file per row from the executors
  via ``foreachPartition`` — no driver collect; against S3 the same
  code runs with an s3:// filesystem or a boto3 client per partition.
- **K2 DynamoDB merge-upsert** — read-modify-write of a string map
  (dynamo_loader_document.py:33-58). ``merge_metadata`` is the
  set-oriented MERGE: existing ⟕ updates on record_id, stringify-all
  (C10) + map merge new-wins (C11), atomic table swap. Idempotent —
  re-running a batch converges, which is what makes the streaming
  at-least-once delivery exactly-once in effect (§2.10).
- **K3 SQS notification sink** — ``send_message_batch`` chunked by 10
  (sqs_notification.py:29-39 sends unchunked **[B]** — SQS rejects >10;
  we implement the intended chunking). ``NotificationBatchWriter`` is a
  ``foreachBatch``-shaped callable around any client with
  ``send_message_batch(entries)``.
- **K4 put_item full-row overwrite** — the notebook backfill's
  whole-item write (etl_tasaciones.ipynb cells 15-16).
  ``overwrite_rows`` replaces matched rows wholesale instead of
  merging maps.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable, Iterator, Sequence
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from sbs_suptech_etl_v2_spark.functions.scalars import (
    format_text_key,
    map_merge_new_wins,
    stringify_map_values,
)

SQS_BATCH_MAX = 10


def write_text_artifacts(df: DataFrame, out_dir: str) -> None:
    """K1 — one text object per row, written from the executors.

    ``df`` must carry ``record_id`` and ``content`` columns; each row
    becomes ``{out_dir}/txt/{record_id}.txt`` (the reference's key
    format, C5). ``foreachPartition`` keeps the write distributed —
    the driver never sees row data; with S3 the open() becomes a
    put_object on a per-partition client.
    """
    target = os.path.join(out_dir, "txt")
    os.makedirs(target, exist_ok=True)
    rows = df.select("record_id", "content")

    def write_partition(it: Iterator[Row]) -> None:
        for row in it:
            path = os.path.join(target, f"{row['record_id']}.txt")
            with open(path, "w", encoding="utf-8") as fh:
                fh.write(row["content"] if row["content"] is not None else "")

    rows.foreachPartition(write_partition)


def _atomic_swap(spark: SparkSession, df: DataFrame, table_path: str) -> None:
    """Write ``df`` to a temp dir, then swap it in place of the table.

    Parquet-lake stand-in for a transactional MERGE target (Delta/
    Iceberg give this atomically; the observable state transition is
    identical).
    """
    tmp = f"{table_path}__tmp_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    # materialize before dropping the source (df may read table_path)
    if os.path.exists(table_path):
        shutil.rmtree(table_path)
    os.rename(tmp, table_path)


def merge_metadata(spark: SparkSession, table_path: str, updates: DataFrame) -> None:
    """K2 — MERGE-style metadata upsert with map merge, new wins.

    ``updates``: ``(record_id string, metadata map<string,string>)``.
    Semantics of dynamo_loader_document.py:33-58 set-oriented:
    unmatched rows insert; matched rows get ``old.update(new)`` (C11)
    after stringify-all (C10). The join is a full outer on record_id —
    at scale both sides shuffle once on the merge key; with Delta this
    is ``MERGE INTO ... WHEN MATCHED UPDATE / WHEN NOT MATCHED
    INSERT``.
    """
    new = updates.select(
        F.col("record_id"), stringify_map_values(F.col("metadata")).alias("new_meta")
    )
    if os.path.exists(table_path):
        existing = spark.read.parquet(table_path)
    else:
        existing = new.sparkSession.createDataFrame(
            [], "record_id string, metadata map<string,string>"
        )
    merged = (
        existing.withColumnRenamed("metadata", "old_meta")
        .join(new, "record_id", "full_outer")
        .select(
            "record_id",
            map_merge_new_wins(F.col("old_meta"), F.col("new_meta")).alias("metadata"),
        )
    )
    _atomic_swap(spark, merged, table_path)


def overwrite_rows(spark: SparkSession, table_path: str, replacements: DataFrame) -> None:
    """K4 — put_item semantics: replace whole rows by key, insert new.

    Matched record_ids take the replacement row verbatim (no merge);
    unmatched existing rows survive. One anti-join + union — single
    shuffle on the key.
    """
    if os.path.exists(table_path):
        existing = spark.read.parquet(table_path)
        keep = existing.join(replacements, "record_id", "left_anti")
        out = keep.unionByName(replacements)
    else:
        out = replacements
    _atomic_swap(spark, out, table_path)


class NotificationBatchWriter:
    """K3 — SQS-shaped notification sink, chunked by {SQS_BATCH_MAX}.

    Callable as ``foreachBatch(writer)``: serializes each micro-batch's
    rows to ``{Id, MessageBody}`` entries (the reference's
    sqs_notification.py:29-39 shape) and hands them to the injected
    client in chunks of ≤10 — the intended semantics behind the
    reference's unchunked send **[B]**. The default client records
    batches in memory (test double); production injects boto3 SQS.
    """

    def __init__(
        self,
        client_send: Callable[[list[dict[str, Any]]], None] | None = None,
        body_col: str = "body",
        id_col: str = "recordId",
    ):
        self.sent_batches: list[list[dict[str, Any]]] = []
        self._send = client_send if client_send is not None else self.sent_batches.append
        self._body_col = body_col
        self._id_col = id_col

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.select(self._id_col, self._body_col).collect()
        entries = [
            {"Id": r[self._id_col], "MessageBody": r[self._body_col]} for r in rows
        ]
        for chunk in self._chunks(entries):
            self._send(chunk)

    @staticmethod
    def _chunks(entries: Sequence[dict[str, Any]]) -> Iterator[list[dict[str, Any]]]:
        for i in range(0, len(entries), SQS_BATCH_MAX):
            yield list(entries[i : i + SQS_BATCH_MAX])


def stage_text_artifacts(df: DataFrame, record_id_col: str, content_col: str) -> DataFrame:
    """Project a DataFrame into the K1 sink contract (record_id, key,
    content) using the C5 key format — the pre-write projection of
    workflow_polizas.py:85-90."""
    return df.select(
        F.col(record_id_col).alias("record_id"),
        format_text_key(F.col(record_id_col)).alias("s3_key"),
        F.col(content_col).alias("content"),
    )
