"""Parquet table readers for the driver test tables (TESTDATA.md).

At 100 TB these reads become partitioned-lake scans; everything here is
a plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown,
column pruning, and partition pruning (SURVEY §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table as a DataFrame.

    ``events.parquet`` carries TIMESTAMP(NANOS). Depending on the Spark
    build, the scan either rejects it unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is set (ts arrives as a
    nanosecond ``long``) or reads it natively as ``timestamp_ntz``
    (micro-truncated). Branch on the schema actually read so both
    behaviors land on the same micro-truncated TIMESTAMP_NTZ column —
    the truncation DuckDB applies, so oracle comparisons stay exact.
    The conf set is an idempotent fallback for driver-built vanilla
    sessions (the driver harness constructs its own SparkSession).
    """
    if name == "events":
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Ensure ``df`` is partitioned at least ``defaultParallelism``-wide
    before a CPU-heavy stage (Python kernel, interpreted HOF chain,
    external-call fan-out).

    The test parquet files are single-row-group, so Spark's scan yields
    ONE partition per file and everything downstream of the scan runs on
    one core of 32 unless a shuffle intervenes. On a production lake the
    input arrives with >= cores partitions and this is a no-op — the
    partition-count probe makes the repartition conditional, so no
    shuffle is ever added at scale. When it does fire, the shuffled
    frame is the narrow kernel input (ids + text / vectors), never wide
    intermediate state.
    """
    target = partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Read several tables at once: ``li, ords = load(spark, d, "lineitem", "orders")``."""
    return tuple(table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
