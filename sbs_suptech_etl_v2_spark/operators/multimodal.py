"""Multimodal-column operators — SURVEY §2.11 [EXT-3].

A training-data lake stores images/audio/video as opaque ``binary``
columns with typed struct metadata beside the text — the reference's
S3-PDF + extracted-text + metadata triple normalized into one table
(the PDF bytes are exactly such an opaque binary: S4 feeds them to an
external decoder). This module provides:

- ``build_multimodal`` — the table layout: ``binary`` payloads +
  ``struct`` metadata + text in one row, synthesized deterministically
  (the container has no image/audio codecs, so payloads are fake but
  the schema, partitioning and batch plumbing are real).
- ``image_features`` (q38) — decode/feature-extract via Arrow-batched
  ``mapInPandas``: parses the payload HEADER BYTES (not the metadata
  column), so the UDF boundary is exercised end-to-end; emits width/
  height/bytes/sha features. The DuckDB oracle re-derives the same
  features from the synthesis rule — an independent computation.
- ``frame_sample`` (q39) — video-style frame sampler: fixed-size
  frames inside one binary, every 2nd frame emitted as its own row
  (1 binary → N rows, the UDTF shape of S4's page fan-out).
- ``image_resize`` (q55) — binary→binary transform: parse, halve,
  re-emit; the resize verb of the brief with the production codec slot.
- ``audio_features`` (q56) — fake-PCM decode: duration/energy/peak via
  vectorized NumPy over the Arrow batch.
- ``decode_image_production`` — the real-codec path, stubbed: tries
  Pillow and raises ``NotImplementedError`` when absent. The Spark
  plumbing around it (schema, batching, fan-out) is identical to the
  fake's, which is the point of the fake.

Scale notes: binaries ride the scan as a single column — keep them
OUT of shuffles (extract features first, drop the payload — the F8
pattern); Arrow moves them zero-copy into pandas. Partition the lake
by modality/source so a feature backfill prunes to one modality.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sbs_suptech_etl_v2_spark.io import table

if TYPE_CHECKING:
    import pandas as pd

FRAME_BYTES = 32
FRAME_STRIDE = 2  # keep every 2nd frame
AUDIO_SAMPLE_RATE = 8000  # fake-PCM stand-in: 1 byte == 1 sample

IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, width int, height int, n_bytes bigint, sha256 string"
)
FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_no int, frame_md5 string"
IMAGE_RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, n_bytes bigint, sha256 string"
)
AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, n_samples bigint, duration_ms double, "
    "byte_sum bigint, peak_byte int"
)


def build_multimodal(docs: DataFrame) -> DataFrame:
    """[EXT-3] one-table multimodal layout: text + binaries + metadata.

    ``image`` = ``IMG:{w}x{h}:`` header + utf-8 text payload;
    ``video`` = raw utf-8 text bytes (a stand-in frame container);
    metadata is a typed struct per modality. Binary columns are opaque
    to the engine — only the decode UDFs look inside.
    """
    did = F.col("doc_id")
    width = (did % 640 + 16).cast("int")
    height = (did % 480 + 16).cast("int")
    image_str = F.concat(
        F.lit("IMG:"), width.cast("string"), F.lit("x"), height.cast("string"),
        F.lit(":"), F.col("text"),
    )
    return docs.select(
        "doc_id",
        "text",
        F.encode(image_str, "utf-8").alias("image"),
        F.struct(
            width.alias("width"),
            height.alias("height"),
            F.lit("fake/raw").alias("format"),
        ).alias("image_meta"),
        F.encode(F.col("text"), "utf-8").alias("video"),
        F.struct(
            F.lit(FRAME_BYTES).alias("frame_bytes"),
            F.lit("fake/frames").alias("codec"),
        ).alias("video_meta"),
        F.encode(F.col("text"), "utf-8").alias("audio"),
        F.struct(
            F.lit(AUDIO_SAMPLE_RATE).alias("sample_rate"),
            F.lit(1).alias("sample_width"),
            F.lit("fake/pcm8").alias("codec"),
        ).alias("audio_meta"),
    )


def image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT-3] image decode/feature-extract over the binary column.

    The ``mapInPandas`` fake decoder parses ``IMG:{w}x{h}:`` from the
    payload bytes and hashes the full binary — the same signature a
    Pillow-backed decoder has (bytes in → features out), so swapping
    ``decode_image_production`` in changes no plan. Payload is dropped
    after feature extraction (never shuffled).
    """
    mm = build_multimodal(table(spark, sf_dir, "documents")).select("doc_id", "image")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["image"]):
                if payload is None:
                    # NULL binary -> NULL decode outputs, row preserved
                    # (SQL NULL propagation; a real decoder has no bytes
                    # to open). The oracle mirrors this with CASE WHEN
                    # text IS NULL guards on width/height (round-9
                    # ADVICE: both engines now agree on NULL-payload
                    # rows, so a robustness fixture can enter a parity
                    # run safely).
                    out.append(
                        {
                            "doc_id": int(doc_id),
                            "width": None,
                            "height": None,
                            "n_bytes": None,
                            "sha256": None,
                        }
                    )
                    continue
                blob = bytes(payload)
                # parse "IMG:{w}x{h}:" from the bytes themselves
                parts = blob.split(b":", 2)
                w, h = parts[1].split(b"x")
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "width": int(w),
                        "height": int(h),
                        "n_bytes": len(blob),
                        "sha256": hashlib.sha256(blob).hexdigest(),
                    }
                )
            yield pd.DataFrame(out)

    return mm.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


IMAGE_FEATURES_SQL = """
SELECT doc_id,
       CAST(CASE WHEN text IS NULL THEN NULL
                 ELSE doc_id % 640 + 16 END AS INTEGER) AS width,
       CAST(CASE WHEN text IS NULL THEN NULL
                 ELSE doc_id % 480 + 16 END AS INTEGER) AS height,
       octet_length(encode('IMG:' || (doc_id % 640 + 16) || 'x' || (doc_id % 480 + 16)
                           || ':' || text)) AS n_bytes,
       sha256('IMG:' || (doc_id % 640 + 16) || 'x' || (doc_id % 480 + 16)
              || ':' || text) AS sha256
FROM documents
"""


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT-3] frame sampling — 1 binary → N frame rows (UDTF shape).

    Chunks the video payload into {FRAME_BYTES}-byte frames and emits
    every {FRAME_STRIDE}nd one (frame_no is 1-based over the kept
    frames' original positions). The fan-out happens inside
    ``mapInPandas`` — one Arrow batch in, a longer batch out — exactly
    how S4 turns one PDF into N page rows.
    """
    mm = build_multimodal(table(spark, sf_dir, "documents")).select("doc_id", "video")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["video"]):
                if payload is None:
                    # NULL container -> zero frames: matches the oracle's
                    # generate_series(1, NULL) unnest drop.
                    continue
                blob = bytes(payload)
                n_frames = (len(blob) + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, FRAME_STRIDE):
                    frame = blob[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    out.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_no": i + 1,
                            "frame_md5": hashlib.md5(frame).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out)

    return mm.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


FRAME_SAMPLE_SQL = f"""
WITH frames AS (
  SELECT doc_id, CAST(i AS INTEGER) AS frame_no,
         substr(text, (i - 1) * {FRAME_BYTES} + 1, {FRAME_BYTES}) AS frame
  FROM documents,
       unnest(generate_series(
         1, CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT),
         {FRAME_STRIDE})) AS t(i)
)
SELECT doc_id, frame_no, md5(frame) AS frame_md5
FROM frames
"""


def decode_image_production(payload: bytes) -> dict:
    """Real-codec image decode — STUB (no imaging libs in this env).

    The production path: Pillow opens the bytes, returns
    width/height/mode + pixel features. Import-gated so environments
    with codecs get the real decoder and this repo stays
    dependency-free; callers inject it in place of the fake decoder —
    the mapInPandas plumbing is unchanged.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires Pillow, which is not available in this "
            "environment; use the deterministic fake decoder (image_features)"
        ) from exc
    import io

    img = Image.open(io.BytesIO(payload))
    return {"width": img.width, "height": img.height, "format": img.format}


def image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT-3] image resize — binary→binary transform in the executor.

    The fake half-resize parses ``IMG:{w}x{h}:`` from the payload,
    halves the dimensions (floor) and keeps every 2nd body byte — the
    same bytes-in/bytes-out signature a Pillow ``Image.resize`` has,
    so the production codec drops into the identical ``mapInPandas``
    slot. Output features of the RESIZED binary prove the transform
    ran in the UDF (the oracle recomputes them from the synthesis
    rule); the resized payload itself is dropped before any shuffle
    (F8 pattern) — at scale the resized bytes would be written
    straight to a lake column, never shuffled.
    """
    mm = build_multimodal(table(spark, sf_dir, "documents")).select("doc_id", "image")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["image"]):
                if payload is None:
                    # NULL binary -> NULL resize outputs, row preserved
                    # (see image_features: same decoder-has-no-bytes
                    # rule; oracle mirrors via CASE WHEN payload IS NULL).
                    out.append(
                        {
                            "doc_id": int(doc_id),
                            "width": None,
                            "height": None,
                            "n_bytes": None,
                            "sha256": None,
                        }
                    )
                    continue
                blob = bytes(payload)
                header, dims, body = blob.split(b":", 2)
                w, h = (int(t) for t in dims.split(b"x"))
                w2, h2 = w // 2, h // 2
                resized = b"IMG:%dx%d:" % (w2, h2) + body[::2]
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "width": w2,
                        "height": h2,
                        "n_bytes": len(resized),
                        "sha256": hashlib.sha256(resized).hexdigest(),
                    }
                )
            yield pd.DataFrame(out)

    return mm.mapInPandas(run, IMAGE_RESIZE_SCHEMA)


IMAGE_RESIZE_SQL = """
WITH src AS (
  SELECT doc_id,
         (doc_id % 640 + 16) // 2 AS w2,
         (doc_id % 480 + 16) // 2 AS h2,
         array_to_string(
           list_transform(generate_series(1, length(text), 2),
                          i -> substr(text, i, 1)), '') AS body2
  FROM documents
),
resized AS (
  SELECT doc_id, w2, h2,
         'IMG:' || w2 || 'x' || h2 || ':' || body2 AS payload
  FROM src
)
SELECT doc_id,
       CAST(CASE WHEN payload IS NULL THEN NULL ELSE w2 END AS INTEGER) AS width,
       CAST(CASE WHEN payload IS NULL THEN NULL ELSE h2 END AS INTEGER) AS height,
       CAST(octet_length(encode(payload)) AS BIGINT) AS n_bytes,
       sha256(payload) AS sha256
FROM resized
"""


def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT-3] audio decode/feature-extract over the binary column.

    The fake treats the payload as 8-bit PCM at {AUDIO_SAMPLE_RATE} Hz
    (1 byte = 1 sample): duration, an exact integer energy sum and the
    peak sample — the same bytes-in/features-out signature a
    soundfile/librosa decoder has. NumPy folds the whole Arrow batch
    vectorized (no per-sample Python). The DuckDB oracle re-derives
    the features character-by-character from the synthesis rule —
    byte == char because the corpus is ASCII.
    """
    mm = build_multimodal(table(spark, sf_dir, "documents")).select("doc_id", "audio")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["audio"]):
                if payload is None:
                    # NULL PCM stream: the oracle's codes list is NULL, so
                    # n_samples/duration/byte_sum are NULL and peak_byte
                    # falls through coalesce(list_max(NULL), 0) = 0 —
                    # reproduce exactly.
                    out.append(
                        {
                            "doc_id": int(doc_id),
                            "n_samples": None,
                            "duration_ms": None,
                            "byte_sum": None,
                            "peak_byte": 0,
                        }
                    )
                    continue
                samples = np.frombuffer(bytes(payload), dtype=np.uint8)
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "n_samples": int(samples.size),
                        "duration_ms": samples.size * 1000.0 / AUDIO_SAMPLE_RATE,
                        "byte_sum": int(samples.sum(dtype=np.int64)),
                        "peak_byte": int(samples.max()) if samples.size else 0,
                    }
                )
            yield pd.DataFrame(out)

    return mm.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


AUDIO_FEATURES_SQL = f"""
WITH codes AS (
  SELECT doc_id,
         list_transform(range(1, length(text) + 1),
                        i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)) AS c
  FROM documents
)
SELECT doc_id,
       CAST(len(c) AS BIGINT) AS n_samples,
       len(c) * 1000.0 / {AUDIO_SAMPLE_RATE} AS duration_ms,
       -- prepend a 0 seed: bare list_reduce errors on an empty list,
       -- where the Spark kernel returns byte_sum=0 / peak_byte=0
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), c), (a, b) -> a + b)
            AS BIGINT) AS byte_sum,
       CAST(coalesce(list_max(c), 0) AS INTEGER) AS peak_byte
FROM codes
"""


# -- q88 scene segmentation ------------------------------------------------
SCENE_HASH_MOD = 1000  # per-frame fake feature range
SCENE_CUT = 800  # |feature delta| above this starts a new scene


def scene_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT-3] video scene segmentation — frame deltas → shot boundaries
    → per-scene rollup.

    The video-pipeline verb after frame sampling (q39): a per-frame
    feature (here the portable md5-derived int of the frame bytes — the
    production codec would emit a perceptual hash or embedding through
    the same column), successive-frame delta via ``lag`` over the
    frame order, a boundary flag where the delta exceeds the cut
    threshold, scene ids as the running boundary count, and one rollup
    per (video, scene). Plan: frames fan out map-side (transform +
    substring — the corpus is ASCII so char slicing == byte slicing,
    matching the q39 kernel), then BOTH windows (lag, running sum) and
    the final rollup share the one doc_id exchange — frame counts per
    video are payload-bounded, so the window groups stay small at any
    corpus size.
    """
    docs = table(spark, sf_dir, "documents")
    frames = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.ceil(F.length("text") / float(FRAME_BYTES)).cast("int"),
                    ),
                    lambda i: F.substring(
                        F.col("text"), (i - 1) * FRAME_BYTES + 1, FRAME_BYTES
                    ),
                ),
                lambda fr: fr.isNotNull(),
            )
        ).alias("idx", "frame"),
    ).select(
        "doc_id",
        (F.col("idx") + 1).alias("frame_no"),
        (
            F.conv(F.substring(F.md5("frame"), 1, 8), 16, 10).cast("bigint")
            % SCENE_HASH_MOD
        ).alias("feat"),
    )
    w = W.partitionBy("doc_id").orderBy("frame_no")
    flagged = frames.withColumn(
        "boundary",
        (
            F.abs(F.col("feat") - F.lag("feat").over(w)) > SCENE_CUT
        ).cast("int"),
    ).withColumn(
        "scene_id",
        F.coalesce(
            F.sum("boundary").over(w.rowsBetween(W.unboundedPreceding, 0)), F.lit(0)
        ),
    )
    return flagged.groupBy("doc_id", "scene_id").agg(
        F.min("frame_no").cast("int").alias("first_frame"),
        F.max("frame_no").cast("int").alias("last_frame"),
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum("feat").cast("bigint").alias("feat_sum"),
    )


SCENE_SEGMENTS_SQL = f"""
WITH frames AS (
  -- length(text), not octet_length(encode(text)): the corpus is ASCII
  -- so they agree, but encode()'s VARCHAR->BLOB path was the one
  -- construct here no driver-green oracle had exercised (round-6
  -- driver RED while green locally); length + substr is the proven
  -- q16/q19/q44 pagination idiom and matches the Spark side's
  -- character-based F.length/F.substring exactly
  SELECT doc_id, CAST(i AS INTEGER) AS frame_no,
         CAST(('0x' || substr(md5(
           substr(text, CAST((i - 1) * {FRAME_BYTES} + 1 AS INTEGER),
                  {FRAME_BYTES})), 1, 8))
           AS BIGINT) % {SCENE_HASH_MOD} AS feat
  FROM documents,
       unnest(generate_series(
         1, CAST(ceil(length(text) / {FRAME_BYTES}.0) AS BIGINT)))
         AS t(i)
),
flagged AS (
  SELECT doc_id, frame_no, feat,
         CAST(abs(feat - lag(feat) OVER w) > {SCENE_CUT} AS INTEGER) AS boundary
  FROM frames
  WINDOW w AS (PARTITION BY doc_id ORDER BY frame_no)
),
scened AS (
  SELECT doc_id, frame_no, feat,
         COALESCE(SUM(boundary) OVER (
           PARTITION BY doc_id ORDER BY frame_no
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS scene_id
  FROM flagged
)
SELECT doc_id,
       -- CAST: scene_id is a windowed SUM(INTEGER) → HUGEINT in
       -- DuckDB, which the pandas fetch path renders as float64
       -- ("3.0" vs Spark's int64 "3") — the r06/r07 driver hash-RED
       -- signature.  One of exactly two uncast HUGEINT outputs.
       CAST(scene_id AS BIGINT) AS scene_id,
       CAST(MIN(frame_no) AS INTEGER) AS first_frame,
       CAST(MAX(frame_no) AS INTEGER) AS last_frame,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(feat) AS BIGINT) AS feat_sum
FROM scened
GROUP BY doc_id, scene_id
"""
