"""§2.10 — real Structured Streaming event-time aggregation.

The reference has no event-time processing (SURVEY §2.10); the engine
demonstrates the Spark upgrade path: ``readStream`` over event files →
``withWatermark`` + tumbling ``window()`` aggregation → append-mode
sink. Late rows beyond the watermark are dropped; closed windows match
the batch-computed equivalent exactly (the same plan q13 checks against
the DuckDB oracle).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_events(path, rows):
    with open(path, "w") as fh:
        for ts, etype, value in rows:
            fh.write(json.dumps({"ts": ts, "event_type": etype, "value": value}) + "\n")


def test_watermarked_tumbling_window_matches_batch(spark, tmp_path):
    in_dir = tmp_path / "events"
    ckpt = tmp_path / "ckpt"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    rows = [
        ("2024-01-01 10:05:00", "click", 1.0),
        ("2024-01-01 10:20:00", "click", 2.0),
        ("2024-01-01 10:40:00", "view", 3.0),
        ("2024-01-01 11:10:00", "click", 4.0),
        ("2024-01-01 12:30:00", "view", 5.0),  # advances watermark past 11:xx
    ]
    _write_events(in_dir / "batch0.json", rows)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .json(str(in_dir))
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total")
    )
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", str(out_dir))
        .start()
    )
    q.awaitTermination(120)

    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total"])
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    # append mode emits only windows CLOSED by the watermark (12:30 event
    # -> watermark 12:00 -> the 10:00 and 11:00 windows are final; the
    # 12:00 window stays open and is NOT emitted)
    assert got == {
        ("2024-01-01 10:00:00", "click"): (2, 3.0),
        ("2024-01-01 10:00:00", "view"): (1, 3.0),
        ("2024-01-01 11:00:00", "click"): (1, 4.0),
    }

    # batch equivalent (the q13-shaped plan) agrees on the closed windows
    batch = (
        spark.read.schema(EVENT_SCHEMA)
        .json(str(in_dir))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total")
    )
    batch_rows = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total"])
        for r in batch.collect()
    }
    for key, val in got.items():
        assert batch_rows[key] == val


def test_late_event_beyond_watermark_is_dropped(spark, tmp_path):
    in_dir = tmp_path / "events"
    ckpt = tmp_path / "ckpt"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    # batch 1 advances the watermark to 12:00; batch 2's 10:50 event is
    # > 30 min late -> dropped from the (already emitted) 10:00 window
    _write_events(
        in_dir / "b0.json",
        [("2024-01-01 10:05:00", "click", 1.0), ("2024-01-01 12:30:00", "view", 2.0)],
    )

    def run_stream():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .json(str(in_dir))
            .withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("w.start").alias("window_start"), "n_events")
        )
        q = (
            stream.writeStream.outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", str(out_dir))
            .start()
        )
        q.awaitTermination(120)

    run_stream()
    _write_events(in_dir / "b1.json", [("2024-01-01 10:50:00", "late", 9.0)])
    run_stream()  # resumes from checkpoint, sees only the new file

    got = {
        str(r["window_start"]): r["n_events"]
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    # the 10:00 window was finalized with 1 event; the late row never
    # re-opens it (no duplicate/updated emission)
    assert got.get("2024-01-01 10:00:00") == 1
