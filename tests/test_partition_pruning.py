"""Partition pruning — static and dynamic (DPP) — over a date-partitioned
lake layout (SURVEY §4 scale posture).

At 100 TB the events table is laid out partitioned by day; a query that
filters on day (directly, or through a join to a filtered dimension)
must scan only the matching partition directories. Static pruning shows
up as a partition-filter on the scan; dynamic partition pruning (DPP)
injects the join side's keys into the scan as a runtime subquery filter
so the big fact side never reads the pruned days. Both behaviors are
free in Spark *if* the layout and the plan are declared right — this
test pins that the engine's session/IO defaults don't break them.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from sbs_suptech_etl_v2_spark.io import table


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lake") / "events_by_day")
    ev = table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    ev.write.partitionBy("day").mode("overwrite").parquet(path)
    return path


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_static_partition_pruning(spark, partitioned_events):
    ev = spark.read.parquet(partitioned_events)
    days = [r["day"] for r in ev.select("day").distinct().orderBy("day").collect()]
    one_day = ev.filter(F.col("day") == F.lit(days[0]))
    plan = _plan_of(one_day.groupBy("event_type").count())
    # the day predicate must land in PartitionFilters, not a post-scan Filter
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "day" in pf_line
    n = one_day.count()
    assert 0 < n < ev.count()


def test_dynamic_partition_pruning_through_join(spark, partitioned_events):
    ev = spark.read.parquet(partitioned_events)
    days = [r["day"] for r in ev.select("day").distinct().orderBy("day").collect()]
    # a small "interesting days" dimension, filtered at runtime — the
    # fact scan learns the surviving day keys only after the dim is
    # evaluated, which is exactly what DPP handles. The dim filter must
    # be one Spark's isLikelySelective recognizes (equality-to-literal
    # here); a bare boolean-attribute filter does NOT trigger DPP —
    # that near-miss is exactly why this guard exists.
    dim = spark.createDataFrame(
        [(d, "hot" if i % 2 == 0 else "cold") for i, d in enumerate(days)],
        "day date, grade string",
    )
    joined = (
        ev.join(dim.filter(F.col("grade") == "hot"), "day")
        .groupBy("event_type")
        .count()
    )
    plan = _plan_of(joined)
    assert "dynamicpruning" in plan.lower(), plan
    # results match the statically-pruned equivalent
    keep_days = {d for i, d in enumerate(days) if i % 2 == 0}
    expect = (
        ev.filter(F.col("day").isin(list(keep_days)))
        .groupBy("event_type")
        .count()
        .collect()
    )
    got = joined.collect()
    assert sorted((r["event_type"], r["count"]) for r in got) == sorted(
        (r["event_type"], r["count"]) for r in expect
    )
