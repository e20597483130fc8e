"""Multi-format round-trips: parquet/ORC/CSV/JSON through sources.formats.

Every format must reproduce the source rows EXACTLY (schema + values),
including timestamps (orders) and nullable strings — the interchange
guarantee external producers rely on.
"""

from __future__ import annotations

import pytest

from sbs_suptech_etl_v2_spark.io import table
from sbs_suptech_etl_v2_spark.sources.formats import FORMATS, read_table, write_table


def _canon(df):
    return sorted(tuple(str(v) for v in row) for row in df.collect())


@pytest.mark.parametrize("fmt", FORMATS)
def test_orders_round_trip(spark, sf_dir, tmp_path, fmt):
    src = table(spark, sf_dir, "orders")
    path = str(tmp_path / f"orders_{fmt}")
    write_table(src, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=src.schema)
    assert back.schema == src.schema
    assert _canon(back) == _canon(src)


def test_csv_requires_schema(spark, sf_dir, tmp_path):
    src = table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    write_table(src, path, fmt="csv")
    with pytest.raises(ValueError, match="no embedded schema"):
        read_table(spark, path, fmt="csv")


def test_write_refuses_accidental_overwrite(spark, sf_dir, tmp_path):
    src = table(spark, sf_dir, "region")
    path = str(tmp_path / "region_parquet")
    write_table(src, path)
    with pytest.raises(Exception):
        write_table(src, path)  # mode defaults to error-if-exists


def test_unknown_format_rejected(spark, sf_dir, tmp_path):
    src = table(spark, sf_dir, "region")
    with pytest.raises(ValueError, match="unknown format"):
        write_table(src, str(tmp_path / "x"), fmt="avro")
