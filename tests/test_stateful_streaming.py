"""applyInPandasWithState: cross-micro-batch streaming dedup.

Two input files + maxFilesPerTrigger=1 force two micro-batches inside
one availableNow run — the second batch sees the first batch's state
through the state store, so replayed keys are suppressed exactly.
(A query restart reads the same state from the checkpoint; the restart
path costs minutes of state-store churn per run, so the suite
exercises cross-batch state, which is the same store read/write path.)
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

from sbs_suptech_etl_v2_spark.streaming.stateful import streaming_dedup

SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.StringType()),
        T.StructField("payload", T.StringType()),
    ]
)


def _write(path, rows):
    with open(path, "w") as fh:
        for rid, payload in rows:
            fh.write(json.dumps({"record_id": rid, "payload": payload}) + "\n")


def test_streaming_dedup_cross_batch(spark, tmp_path):
    in_dir = tmp_path / "in"
    ckpt = tmp_path / "ckpt"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    # one file per micro-batch: in-batch dup (r1), cross-batch replays
    # (r1, r2), and a fresh key per batch (r2, r3)
    _write(in_dir / "b0.json", [("r1", "a"), ("r1", "dup-in-batch"), ("r2", "b")])
    _write(in_dir / "b1.json", [("r1", "replay"), ("r2", "replay"), ("r3", "c")])

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        q = (
            streaming_dedup(stream, "record_id")
            .writeStream.outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", str(out_dir))
            .start()
        )
        q.awaitTermination(240)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    rows = spark.read.parquet(str(out_dir)).collect()
    by_key: dict[str, list[str]] = {}
    for r in rows:
        by_key.setdefault(r["record_id"], []).append(r["payload"])
    # exactly one emission per key, regardless of in-batch or
    # cross-batch duplication (file processing order is not guaranteed,
    # so only the per-key cardinality is asserted)
    assert sorted(by_key) == ["r1", "r2", "r3"]
    assert all(len(v) == 1 for v in by_key.values())


def test_dedup_within_watermark_drops_in_window_duplicates(spark, tmp_path):
    import json as _json

    from sbs_suptech_etl_v2_spark.streaming.stateful import (
        streaming_dedup_within_watermark,
    )

    src = tmp_path / "wmdedup_src"
    ckpt = tmp_path / "wmdedup_ckpt"
    out = tmp_path / "wmdedup_out"
    src.mkdir()
    rows = [
        {"ts": "2024-01-01 10:00:00", "k": "a", "n": 1},
        {"ts": "2024-01-01 10:00:30", "k": "a", "n": 2},  # dup within window
        {"ts": "2024-01-01 10:01:00", "k": "b", "n": 3},
        {"ts": "2024-01-01 10:01:30", "k": "b", "n": 4},  # dup within window
        {"ts": "2024-01-01 10:02:00", "k": "c", "n": 5},
    ]
    with open(src / "batch0.json", "w") as fh:
        for r in rows:
            fh.write(_json.dumps(r) + "\n")

    stream = spark.readStream.schema("ts timestamp, k string, n long").json(str(src))
    deduped = streaming_dedup_within_watermark(stream, ["k"], lateness="5 minutes")
    q = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", str(out))
        .start()
    )
    q.awaitTermination(120)
    got = sorted((r["k"], r["n"]) for r in spark.read.parquet(str(out)).collect())
    # first occurrence of each key survives, in-window duplicates drop
    assert got == [("a", 1), ("b", 3), ("c", 5)]
