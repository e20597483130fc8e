"""Empty-input robustness — every registered query must PLAN AND RUN
on fully-empty tables without raising.

Why this matters at 100 TB: a daily partition, a new tenant, or a
filter-heavy branch can legitimately present an empty frame to any
operator, and this engine runs with Spark 4's ANSI mode ON — an
unguarded division, array index, or cast that only a non-empty input
keeps safe becomes a runtime raise, not a NULL (the playbook's q94
corr / q97 / q103 / q104 / q105 audit class). Zero rows out is fine;
an exception is a bug. Round-8 sweep: 121/121 clean — this test keeps
it that way.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from sbs_suptech_etl_v2_spark.io import TABLES
from sbs_suptech_etl_v2_spark.registry import QUERIES


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory, sf_dir):
    """Same schemas as the real tables, zero rows."""
    dst = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        schema = pq.ParquetFile(f"{sf_dir}/{t}.parquet").schema_arrow
        pq.write_table(schema.empty_table(), str(dst / f"{t}.parquet"))
    return str(dst)


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    failures = {}
    for name in sorted(QUERIES):
        try:
            QUERIES[name](spark, empty_sf_dir).count()
        except Exception as ex:  # noqa: BLE001 — collecting the full list
            failures[name] = f"{type(ex).__name__}: {str(ex).splitlines()[0][:120]}"
    assert not failures, failures
