"""Bucketed co-located join: pre-bucketing both fact tables on the join
key eliminates the per-query shuffle entirely (SURVEY §4 partitioning).

At 100 TB the lineitem⋈orders shuffle dominates q06-shaped queries;
bucketing both sides by orderkey at write time moves that cost to
ingest, and every subsequent join plans with zero Exchange on the join
key. The test writes small bucketed copies and asserts the plan shape
plus result parity with the shuffled join.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from sbs_suptech_etl_v2_spark.io import table

N_BUCKETS = 4


@pytest.fixture()
def bucketed(spark, sf_dir, tmp_path):
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    db = "buckets_test"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    try:
        for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
            (
                table(spark, sf_dir, name)
                .write.bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .mode("overwrite")
                .saveAsTable(f"{db}.{name}_b")
            )
        yield db
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    _ = warehouse  # cleanup is via DROP DATABASE; warehouse dir is session-scoped


def test_bucketed_join_has_no_exchange_and_matches(spark, sf_dir, bucketed):
    db = bucketed
    li = spark.table(f"{db}.lineitem_b")
    orders = spark.table(f"{db}.orders_b")
    # disable broadcast so the plan shows the bucketed shuffle-free
    # merge path (at real scale neither fact side broadcasts anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
                .cast("double")
                .alias("total"),
            )
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        got = {r["o_orderstatus"]: (r["n"], r["total"]) for r in joined.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the join itself needs no shuffle: both sides are bucketed on the
    # key, so the only Exchange in the plan belongs to the final
    # aggregation, not the join inputs
    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange" not in join_section, join_section

    # parity with the plain shuffled join on the raw parquet
    expect = {
        r["o_orderstatus"]: (r["n"], r["total"])
        for r in (
            table(spark, sf_dir, "lineitem")
            .join(
                table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
                .cast("double")
                .alias("total"),
            )
            .collect()
        )
    }
    assert got == expect
