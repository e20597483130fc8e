"""Multi-format lake IO — parquet is the engine's primary format (S5);
CSV / JSON / ORC cover interchange with external producers/consumers.

Scale rules encoded here rather than left to callers:

- **Never infer schemas at scale.** CSV/JSON inference is an extra full
  scan of the data (and JSON inference widens types per file); readers
  here REQUIRE an explicit schema for the text formats. Parquet/ORC
  carry their own schema.
- **Timestamps cross text formats as ISO-8601** — the default
  ``timestampFormat`` on both writer and reader, so a round-trip is
  lossless to the microsecond regardless of session timezone.
- **Compression**: splittable-friendly defaults (snappy for columnar,
  gzip left OFF for CSV/JSON so a 100 TB export stays
  partition-parallel on read; callers opt into codecs explicitly).
- Writers emit one directory per table (the lake layout every other
  operator expects) — ``mode`` defaults to error-if-exists so an
  accidental double-run cannot clobber a table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "csv", "json")
_SELF_DESCRIBING = ("parquet", "orc")


def write_table(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "error") -> None:
    """Write ``df`` as a ``fmt`` table directory at ``path``."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; use one of {FORMATS}")
    writer = df.write.mode(mode)
    if fmt == "csv":
        # header row carries the column names; values quoted as needed
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: StructType | str | None = None
) -> DataFrame:
    """Read a ``fmt`` table directory written by :func:`write_table`.

    Text formats (csv/json) demand an explicit ``schema``: schema
    inference re-scans the whole dataset before the real read — at
    100 TB that doubles the job, and inferred types drift with the
    sampled files. Self-describing formats ignore ``schema``.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; use one of {FORMATS}")
    if fmt in _SELF_DESCRIBING:
        return spark.read.format(fmt).load(path)
    if schema is None:
        raise ValueError(
            f"{fmt} has no embedded schema — pass the table schema explicitly "
            "(inference is a second full scan and type-unstable at scale)"
        )
    reader = spark.read.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.format(fmt).load(path)
