"""§2.10 — watermarked stream-stream interval join (streaming as-of).

Two file-source streams (purchases, clicks) joined on user within a
bounded look-back interval; the emitted pairs must equal the batch
join of the same data under the same predicate, and a downstream
max-by(click_ts) recovers exactly the batch as-of pick of q54's
operator shape.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from sbs_suptech_etl_v2_spark.streaming.joins import clicks_before_purchase

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
    ]
)


def _write(path, rows):
    with open(path, "w") as fh:
        for ts, user_id, event_id in rows:
            fh.write(json.dumps({"ts": ts, "user_id": user_id, "event_id": event_id}) + "\n")


def test_interval_join_matches_batch_and_recovers_asof(spark, tmp_path):
    clicks_dir = tmp_path / "clicks"
    purch_dir = tmp_path / "purchases"
    ckpt = tmp_path / "ckpt"
    out_dir = tmp_path / "out"
    clicks_dir.mkdir()
    purch_dir.mkdir()

    _write(
        clicks_dir / "c0.json",
        [
            ("2024-01-01 10:00:00", 1, 100),
            ("2024-01-01 10:30:00", 1, 101),  # latest prior for purchase 900
            ("2024-01-01 09:00:00", 2, 102),  # outside the 1h look-back of 901
            ("2024-01-01 10:59:00", 3, 103),  # after user 3's purchase -> no match
        ],
    )
    _write(
        purch_dir / "p0.json",
        [
            ("2024-01-01 10:45:00", 1, 900),
            ("2024-01-01 10:30:00", 2, 901),
            ("2024-01-01 10:58:00", 3, 902),
        ],
    )

    def read_stream(d):
        return spark.readStream.schema(SCHEMA).json(str(d))

    joined = clicks_before_purchase(
        read_stream(purch_dir), read_stream(clicks_dir), max_gap="1 hour"
    )
    q = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", str(out_dir))
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        (r["purchase_event_id"], r["click_event_id"])
        for r in spark.read.parquet(str(out_dir)).collect()
    )
    # purchase 900 matches both in-window clicks of user 1; 901/902 none
    assert got == [(900, 100), (900, 101)]

    # batch equivalent under the same predicate agrees
    batch = clicks_before_purchase(
        spark.read.schema(SCHEMA).json(str(purch_dir)),
        spark.read.schema(SCHEMA).json(str(clicks_dir)),
        max_gap="1 hour",
    )
    assert got == sorted(
        (r["purchase_event_id"], r["click_event_id"]) for r in batch.collect()
    )

    # downstream max-by(click_ts) per purchase == the as-of pick (q54 shape)
    asof = (
        spark.read.parquet(str(out_dir))
        .groupBy("purchase_event_id")
        .agg(F.max_by("click_event_id", "click_ts").alias("click_event_id"))
    )
    assert {(r["purchase_event_id"], r["click_event_id"]) for r in asof.collect()} == {
        (900, 101)
    }


def test_left_outer_interval_join_emits_unmatched_after_watermark(spark, tmp_path):
    clicks_dir = tmp_path / "clicks"
    purch_dir = tmp_path / "purchases"
    ckpt = tmp_path / "ckpt_outer"
    out_dir = tmp_path / "out_outer"
    clicks_dir.mkdir()
    purch_dir.mkdir()

    _write(
        clicks_dir / "c0.json",
        [
            ("2024-01-01 10:30:00", 1, 101),  # in-window for purchase 900
            ("2024-01-01 09:00:00", 2, 102),  # outside 901's 1h look-back
        ],
    )
    _write(
        purch_dir / "p0.json",
        [
            ("2024-01-01 10:45:00", 1, 900),  # matched
            ("2024-01-01 10:30:00", 2, 901),  # unmatched -> null-extended
        ],
    )
    # flush batch: far-future rows push BOTH watermarks past 901's whole
    # look-back interval so its outer row can be declared click-less
    _write(clicks_dir / "c1.json", [("2024-01-02 12:00:00", 9, 199)])
    _write(purch_dir / "p1.json", [("2024-01-02 12:00:00", 9, 999)])

    def read_stream(d):
        # one file per micro-batch: the outer row flushes on the trigger
        # AFTER the flush rows advance the watermark, so there must BE
        # a later trigger — availableNow alone would fold everything
        # into one batch and the unmatched row would stay in state
        return (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(d))
        )

    joined = clicks_before_purchase(
        read_stream(purch_dir),
        read_stream(clicks_dir),
        max_gap="1 hour",
        lateness="1 minute",
        how="left_outer",
    )
    q = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", str(out_dir))
        .start()
    )
    q.awaitTermination(180)

    rows = spark.read.parquet(str(out_dir)).collect()
    got = sorted(
        ((r["purchase_event_id"], r["click_event_id"]) for r in rows), key=str
    )
    # 900 matched; 901 emitted null-extended; the flush purchase 999 may
    # still sit in state (its own interval has not aged out) — accept
    # either, but 900 and 901 MUST both be present
    pairs = dict(got)
    assert pairs.get(900) == 101
    assert 901 in pairs and pairs[901] is None
