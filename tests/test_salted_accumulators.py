"""Transcription test for the round-8 salted/bigint accumulator shape
(q94 / q01 / q06): the two-level form — quantize per-row through the
decimal cast, SUM as BIGINT per salt bucket, merge salt partials as
decimal(28,0), re-cast to the flat form's (precision, scale) — must be
BIT-IDENTICAL to the one-level decimal SUM it replaced, on data that
exercises the awkward cases (values whose doubles are not exactly
representable, negatives, many duplicate rows per group).

This is the local proof of the rewrite's exactness claim, independent
of the TPC-H tables: both forms are exact integer arithmetic after the
per-row quantization, so ANY difference is a quantization bug.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _data(spark, n=5000, seed=8):
    rng = random.Random(seed)
    rows = [
        (
            rng.choice("ABC"),
            # 2-decimal values, many not exactly representable as
            # doubles (x.x1, x.x3 ...), plus negatives
            round(rng.uniform(-50, 50), 2),
            round(rng.uniform(0.01, 105000.0), 2),
        )
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "flag string, x double, y double")


def _flat(df):
    return (
        df.groupBy("flag")
        .agg(
            F.sum(F.col("x").cast("decimal(18,4)")).alias("_sx"),
            F.sum((F.col("x") * F.col("y")).cast("decimal(18,6)")).alias("_sxy"),
        )
        .select(
            "flag",
            F.col("_sx").cast("double").alias("sx"),
            F.col("_sxy").cast("double").alias("sxy"),
        )
    )


def _salted(df, salts):
    x4 = (F.col("x").cast("decimal(18,4)") * 10000).cast("bigint")
    xy6 = ((F.col("x") * F.col("y")).cast("decimal(18,6)") * 1000000).cast(
        "bigint"
    )
    partial = df.groupBy(
        "flag", F.pmod(F.hash("x", "y"), F.lit(salts)).alias("_salt")
    ).agg(F.sum(x4).alias("_px"), F.sum(xy6).alias("_pxy"))
    return partial.groupBy("flag").agg(
        (F.sum(F.col("_px").cast("decimal(28,0)")) / 10000)
        .cast("decimal(28,4)")
        .cast("double")
        .alias("sx"),
        (F.sum(F.col("_pxy").cast("decimal(28,0)")) / 1000000)
        .cast("decimal(28,6)")
        .cast("double")
        .alias("sxy"),
    )


def test_salted_bigint_two_level_equals_flat_decimal(spark):
    df = _data(spark)
    flat = {r["flag"]: (r["sx"], r["sxy"]) for r in _flat(df).collect()}
    for salts in (1, 7, 1024):
        two = {r["flag"]: (r["sx"], r["sxy"]) for r in _salted(df, salts).collect()}
        assert two == flat, f"salts={salts}"  # bit-exact, not approx


def test_salted_form_is_layout_stable(spark):
    df = _data(spark, n=2000, seed=44)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        at3 = sorted(tuple(r) for r in _salted(df, 64).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "11")
        at11 = sorted(tuple(r) for r in _salted(df, 64).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert at3 == at11
