"""Batch sources — S2 (HTTP entry) and S3 (prefix-listing scan).

- **S2** — the HTTP ``POST /start-etl`` handler validates a list of
  camelCase request DTOs and feeds the same pipeline as Kafka
  (fast_api_controller.py:31-56). Spark-first that is simply
  ``spark.createDataFrame(rows, REQUEST_SCHEMA)`` + snake_case rename:
  no Spark-native HTTP source needed, the web layer stays outside the
  engine.
- **S3** — the poller lists ``bucket/prefix``, skips directory keys,
  keeps ``*.{ext}`` case-insensitively, and parses the
  ``"{Month} {Year}"`` folder into period columns with a positional
  pick option (s3_poller_document.py:14-55). Spark-first: a
  ``binaryFile`` scan with ``pathGlobFilter`` (partition-pruned listing
  at the source, F1/F2 pushed into the scan) + ``input_file_name()``
  path decomposition (F7) + C2/C3 refinements. Works identically over
  ``s3a://bucket/prefix`` and local paths.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sbs_suptech_etl_v2_spark.functions.scalars import refine_month, refine_year
from sbs_suptech_etl_v2_spark.operators.jsonops import REQUEST_SCHEMA
from sbs_suptech_etl_v2_spark.streaming.ingress import SNAKE_CASE


def requests_dataframe(
    spark: SparkSession, payloads: Sequence[Mapping[str, Any]]
) -> DataFrame:
    """S2 — batch-entry DataFrame from validated request payloads.

    ``payloads`` are camelCase dicts (the wire DTO); schema enforcement
    by ``createDataFrame`` replaces pydantic ``model_validate`` —
    unknown keys are dropped, missing keys become NULL.
    """
    rows = [tuple(p.get(f.name) for f in REQUEST_SCHEMA.fields) for p in payloads]
    df = spark.createDataFrame(rows, REQUEST_SCHEMA)
    return df.select(
        *[F.col(camel).alias(snake) for camel, snake in SNAKE_CASE.items()]
    )


def listing_scan(
    spark: SparkSession,
    root: str,
    prefix: str,
    extension: str = "pdf",
    position: int | None = None,
) -> DataFrame:
    """S3 — prefix-listing document scan with path decomposition.

    ``binaryFile`` lists ``{root}/{prefix}`` recursively with the
    extension filter pushed into the listing (``pathGlobFilter`` —
    F2 at the source, cheaper than a post-scan filter); directory
    keys never appear (F1 is structural in a file listing). The
    relative path decomposes as ``{prefix}/{Month Year}/{basename}``
    → ``period_month``/``period_year`` via C2/C3 (NULL on parse
    failure, s3_poller_document.py:29-41). ``position`` reproduces F9:
    a deterministic key-ordered positional pick via global sort+limit
    (TakeOrderedAndProject — parallel, no single-partition window).

    On AWS, ``root`` is ``s3a://bucket`` — the same plan runs
    unchanged; binary content rides along as ``content`` for the
    extractor port (the multimodal column of SURVEY §2.11 [EXT-3]).
    """
    # case-insensitive extension match, like the reference's
    # key.lower().endswith (s3_poller_document.py:27): pathGlobFilter
    # is case-sensitive, so build a per-letter case-class glob
    # ("*.[pP][dD][fF]") — '.PDF' keys must not be silently dropped
    glob = "*." + "".join(
        f"[{c.lower()}{c.upper()}]" if c.isalpha() else c for c in extension
    )
    scan = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(f"{root}/{prefix}")
    )
    # input_file_name() is URL-encoded ("Mayo%202023") — decode before parsing
    key = F.url_decode(F.regexp_replace(F.input_file_name(), "^file:/*|^s3a://", ""))
    rel = F.substring_index(key, f"/{prefix}/", -1)
    parts = F.split(rel, "/")
    folder = F.when(F.size(parts) >= 2, F.get(parts, F.size(parts) - 2))
    folder_parts = F.split(folder, " ")
    month_tok = F.when(F.size(folder_parts) == 2, F.get(folder_parts, 0))
    year_tok = F.when(F.size(folder_parts) == 2, F.get(folder_parts, 1))
    listed = scan.select(
        rel.alias("key"),
        F.lit(prefix).alias("prefix"),
        F.get(parts, F.size(parts) - 1).alias("basename"),
        refine_month(month_tok).alias("period_month"),
        refine_year(year_tok).alias("period_year"),
        F.col("length").alias("content_length"),
        F.col("content"),
    )
    if position is not None:
        picked = listed.orderBy("key").limit(position + 1).orderBy(F.col("key").desc()).limit(1)
        return picked
    return listed.orderBy("key")
