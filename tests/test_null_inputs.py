"""NULL-value robustness — every query must survive NULL attribute rows.

The driver-generated testdata contains zero NULLs, but a 100 TB lake
will not: dead embedding rows, documents whose extraction produced no
text, events with missing props/user/timestamp are all routine. This
sweep plants one NULL per "interesting" column across 5-row table
slices and requires every registry query to complete a ``count()``
(the maximally column-pruned plan — see test_adversarial_inputs.py for
why count, not collect). Parity vs the oracle is NOT asserted here;
the contract is narrower: a NULL attribute must never kill a stage.

Spark-side NULL hazards this is designed to catch:
  * Python kernels (mapInPandas / applyInPandas) indexing a None
    (e.g. ``t.split(...)`` on a None text, ``len(None)`` on a NULL
    embedding list);
  * ANSI-mode expressions where a NULL feeds an argument that is
    checked before NULL-propagation (invalid array index paths);
  * sequence()/explode() bounds built from NULL aggregates.

Keys (doc_id / vec_id / TPC-H PKs) stay non-NULL: a NULL key is data
corruption upstream of the engine, and the reference's loaders
(dynamo_loader_document.py) treat the id as required.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sbs_suptech_etl_v2_spark.io import TABLES
from sbs_suptech_etl_v2_spark.registry import QUERIES

# table -> list of (row_index, column) to NULL out. One NULL per
# column keeps the other rows intact so joins/aggregates still have
# non-degenerate input.
NULL_PLAN = {
    "documents": [(0, "text"), (1, "lang"), (2, "source"), (3, "n_chars")],
    "embeddings": [(0, "embedding"), (1, "label")],
    "events": [
        (0, "props"),
        (1, "value"),
        (2, "user_id"),
        (3, "event_type"),
        (4, "ts"),
    ],
    "orders": [(0, "o_orderstatus"), (1, "o_totalprice"), (2, "o_orderdate")],
    "lineitem": [
        (0, "l_returnflag"),
        (1, "l_extendedprice"),
        (2, "l_shipdate"),
        (3, "l_tax"),
    ],
    "customer": [(0, "c_name"), (1, "c_acctbal"), (2, "c_mktsegment")],
    "part": [(0, "p_name"), (1, "p_brand"), (2, "p_type")],
    "supplier": [(0, "s_name"), (1, "s_acctbal")],
}


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory, sf_dir):
    dst = tmp_path_factory.mktemp("sf_nulls")
    for t in TABLES:
        tbl = pq.read_table(f"{sf_dir}/{t}.parquet")
        head = tbl.slice(0, min(5, tbl.num_rows)).to_pylist()
        for row_idx, col in NULL_PLAN.get(t, []):
            # loud on a plan/schema mismatch: a silently skipped column
            # would shrink the sweep's coverage without failing anything
            assert col in head[row_idx], f"{t}.{col} not in schema"
            head[row_idx][col] = None
        pq.write_table(
            pa.Table.from_pylist(head, schema=tbl.schema),
            str(dst / f"{t}.parquet"),
        )
    return str(dst)


def test_every_query_survives_null_attributes(spark, null_sf_dir):
    failures = {}
    for name in sorted(QUERIES):
        try:
            QUERIES[name](spark, null_sf_dir).count()
        except Exception as exc:  # noqa: BLE001 - collecting the full sweep
            first_line = (str(exc).splitlines() or [""])[0]
            failures[name] = f"{type(exc).__name__}: {first_line[:200]}"
    assert not failures, f"{len(failures)} queries crashed on NULL rows: {failures}"


def test_nan_metric_value_becomes_null_at_the_quantization_boundary(spark):
    """NaN in a metric double is absorbed as NULL, not a job kill.

    Every hash-checked metric sum quantizes through decimal(18,6)
    (order-free accumulation); Spark's double→decimal cast maps NaN to
    NULL even under ANSI — measured here, not assumed — so a stray NaN
    telemetry value degrades to 'missing' (dropped by SUM/AVG) instead
    of killing a 1000-executor job or poisoning a total with NaN.

    Pinned because the ORACLE side is asymmetric: DuckDB's
    CAST(NaN AS DECIMAL) raises. Driver data contains no NaN, so
    parity is unaffected — but if NaN-bearing columns ever enter a
    checked query, the oracle needs an explicit
    CASE WHEN isnan(v) THEN NULL guard to reproduce the engine's
    absorb-as-NULL semantics. This test is the tripwire that keeps
    that rule visible.
    """
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(float("nan"),), (2.5,)], "value double"
    )
    rows = df.select(
        F.col("value").cast("decimal(18,6)").alias("v")
    ).collect()
    assert sorted([r.v for r in rows], key=str) == sorted(
        [None, __import__("decimal").Decimal("2.500000")], key=str
    )
