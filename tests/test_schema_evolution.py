"""Schema evolution on the lake — additive columns across parquet
generations (SURVEY §4: at 100 TB the corpus is written by many
pipeline versions; readers must reconcile them without a rewrite).

Spark's parquet reader keys fields by NAME, so an appended generation
with an extra column back-fills nulls for older files when the read
requests the merged schema. ``mergeSchema`` discovers that union
automatically; an explicit read schema pins it (the production posture:
schema lives in the catalog, not inferred per read).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sbs_suptech_etl_v2_spark.io import table


@pytest.fixture(scope="module")
def evolved_lake(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lake") / "docs_evolved")
    docs = table(spark, sf_dir, "documents")
    gen1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text", "lang")
    gen2 = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "text", "lang")
        .withColumn("quality_score", (F.col("doc_id") % 100) / 100.0)
    )
    gen1.write.mode("overwrite").parquet(path)
    gen2.write.mode("append").parquet(path)
    return path


def test_merge_schema_unions_generations(spark, evolved_lake):
    df = spark.read.option("mergeSchema", "true").parquet(evolved_lake)
    assert "quality_score" in df.columns
    # old-generation rows null-extend; new-generation rows keep values
    nulls = df.filter(F.col("quality_score").isNull()).count()
    vals = df.filter(F.col("quality_score").isNotNull()).count()
    assert nulls > 0 and vals > 0
    assert df.count() == nulls + vals


def test_explicit_schema_reads_both_generations(spark, evolved_lake):
    # catalog-pinned schema: no footer merging pass at all — the read
    # requests the superset and parquet name-matching does the rest
    df = spark.read.schema(
        "doc_id long, text string, lang string, quality_score double"
    ).parquet(evolved_lake)
    assert df.filter(F.col("quality_score").isNotNull()).count() > 0
    # and a subset projection still prunes to the requested columns
    slim = spark.read.schema("doc_id long, lang string").parquet(evolved_lake)
    assert slim.columns == ["doc_id", "lang"]
    assert slim.count() == df.count()
