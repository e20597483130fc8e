"""Partitioned-lake layout — the 100 TB storage posture (SURVEY §4).

The reference scopes work by S3 prefix (``Polizas/Mayo 2023/`` —
static partition pruning by hand, s3_poller_document.py:22). The lake
equivalent: tables partitioned by
``document_type / period_year / period_month`` so Catalyst prunes
whole directories at plan time (and dynamically for join-derived
predicates). A backfill for one month touches 1/N of the data without
reading a byte of the rest.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

DEFAULT_PARTITIONING = ("document_type", "period_year", "period_month")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = DEFAULT_PARTITIONING,
    mode: str = "overwrite",
) -> None:
    """Write a lake table partitioned by the reference's scoping keys.

    Partition columns become directory levels; scans with equality/IN
    predicates on them list only matching directories. Keep partition
    cardinality bounded (type × year × month ≈ hundreds) — per-key
    directories with millions of tiny files are the anti-pattern.
    """
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = DEFAULT_PARTITIONING,
) -> None:
    """Replace ONLY the partitions present in ``df`` — the backfill op.

    ``write_partitioned(..., mode="overwrite")`` uses Spark's STATIC
    partition-overwrite: it truncates the WHOLE table before writing,
    so "re-run May 2023" would delete every other month — at 100 TB
    that is the difference between rewriting gigabytes and rewriting
    the lake. This form sets ``partitionOverwriteMode=dynamic`` as a
    per-write option (session conf untouched): Spark computes the
    distinct partition tuples in ``df`` and replaces exactly those
    directories, leaving the rest byte-identical. This is the op the
    module docstring's backfill claim refers to; semantics are pinned
    by tests/test_lake.py::test_dynamic_partition_overwrite_replaces_
    only_touched_partitions.

    Idempotent per partition (re-running the same backfill converges);
    not snapshot-isolated against concurrent readers of the touched
    partitions — same single-writer regime as writers.merge_metadata.
    """
    (
        df.write.partitionBy(*partition_cols)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )


def read_partition(
    spark: SparkSession, path: str, **equals: str
) -> DataFrame:
    """Read with partition predicates (pruned at the source listing).

    Values are passed as strings; Spark casts the literal to the
    inferred partition type (``period_year=2023`` directories infer
    INT), keeping the predicate a plain partition-column equality so
    the listing prunes at plan time (PartitionFilters on the scan).
    """
    df = spark.read.parquet(path)
    for col, val in equals.items():
        df = df.filter(df[col] == val)
    return df
