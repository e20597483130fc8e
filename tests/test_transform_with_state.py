"""transformWithStateInPandas: per-key running totals across micro-batches.

Same two-file/maxFilesPerTrigger=1 harness as the applyInPandasWithState
dedup test — the second micro-batch must see the first batch's totals
through the ValueState store, and Update mode emits one refreshed row
per key per batch.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from sbs_suptech_etl_v2_spark.streaming.stateful import running_totals

# the transformWithState Python runner serializes state over protobuf;
# without the package the streaming runner crashes at init. Same
# optional-dependency posture as the Kafka connector smoke test.
pytest.importorskip(
    "google.protobuf", reason="transformWithStateInPandas needs protobuf"
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(path, rows):
    with open(path, "w") as fh:
        for uid, value in rows:
            fh.write(json.dumps({"user_id": uid, "value": value}) + "\n")


def test_running_totals_cross_batch(spark, tmp_path):
    in_dir = tmp_path / "in"
    ckpt = tmp_path / "ckpt"
    in_dir.mkdir()
    _write(in_dir / "b0.json", [(1, 10.0), (1, 5.0), (2, 1.0)])
    _write(in_dir / "b1.json", [(1, 2.5), (3, 7.0)])

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        q = (
            running_totals(stream)
            .writeStream.outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .format("memory")
            .queryName("running_totals_out")
            .start()
        )
        q.awaitTermination(240)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    rows = spark.sql("SELECT * FROM running_totals_out").collect()
    # final state per user must reflect BOTH batches for user 1; rows
    # arrive in no guaranteed order, and n_events strictly grows, so the
    # max-n row IS the final state
    final = {}
    for r in rows:
        cand = (r["n_events"], r["total_value"])
        final[r["user_id"]] = max(final.get(r["user_id"], cand), cand)
    assert final[1] == (3, 17.5)
    assert final[2] == (1, 1.0)
    assert final[3] == (1, 7.0)
    # user 1 appeared in both batches -> two Update emissions
    assert sum(1 for r in rows if r["user_id"] == 1) == 2
