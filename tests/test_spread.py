"""io.spread — the conditional redistribution must be exactly that:
widen narrow scans, leave production-width frames untouched (no
shuffle added at scale), and never change data."""

from __future__ import annotations

from pyspark.sql import functions as F

from sbs_suptech_etl_v2_spark.io import spread, table


def test_spread_widens_narrow_scan(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    assert docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    wide = spread(docs)
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # same rows, only placement changed
    assert sorted(r["doc_id"] for r in wide.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )


def test_spread_is_noop_on_already_wide_frames(spark, sf_dir):
    target = spark.sparkContext.defaultParallelism
    wide = table(spark, sf_dir, "documents").repartition(target + 2)
    # already >= parallelism: spread must return the SAME frame, not a
    # narrower repartition of it
    assert spread(wide) is wide


def test_spread_respects_explicit_partition_count(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    assert spread(docs, partitions=7).rdd.getNumPartitions() == 7


def test_spread_keeps_kernel_results_content_stable(spark, sf_dir):
    # order-insensitive consumers see identical results either way —
    # the contract every spread call site relies on
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    direct = {
        r["doc_id"]: r["h"]
        for r in docs.select("doc_id", F.md5("text").alias("h")).collect()
    }
    via_spread = {
        r["doc_id"]: r["h"]
        for r in spread(docs).select("doc_id", F.md5("text").alias("h")).collect()
    }
    assert direct == via_spread
