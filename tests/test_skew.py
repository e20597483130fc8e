"""Salting utilities: salted results must equal their unsalted plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sbs_suptech_etl_v2_spark.functions.skew import salted_agg, salted_join
from sbs_suptech_etl_v2_spark.io import table


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    plain = {
        (r["o_orderstatus"],): (r["n"], r["total"], r["mx"])
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("total"),
            F.max("o_totalprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["o_orderstatus"],): (r["n"], r["total"], r["mx"])
        for r in salted_agg(
            orders,
            ["o_orderstatus"],
            [
                ("n", F.lit(1), "count"),
                ("total", F.col("o_totalprice").cast("decimal(18,6)"), "sum"),
                ("mx", "o_totalprice", "max"),
            ],
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_reaggregatable():
    with pytest.raises(ValueError):
        salted_agg(None, ["k"], [("bad", "v", "avg")])


def test_salted_join_rejects_right_and_full():
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError):
            salted_join(None, None, "k", how=how)


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = sorted(
        (r["o_orderkey"], r["c_name"])
        for r in orders.join(customer, "o_custkey").collect()
    )
    salted = sorted(
        (r["o_orderkey"], r["c_name"])
        for r in salted_join(orders, customer, "o_custkey", n_salts=4).collect()
    )
    assert salted == plain


def test_salt_is_repartition_invariant(spark, sf_dir):
    # the salt must derive from row CONTENT, not partition layout: the
    # per-(key, salt) phase-1 partials must be identical no matter how
    # the input was partitioned beforehand
    orders = table(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    aggs = [("n", F.lit(1), "count")]

    def phase1_cells(df):
        from sbs_suptech_etl_v2_spark.functions.skew import SALT_COL, _row_salt

        return sorted(
            map(
                tuple,
                df.withColumn(SALT_COL, _row_salt(df, 8))
                .groupBy("o_orderstatus", SALT_COL)
                .count()
                .collect(),
            )
        )

    assert phase1_cells(orders.repartition(3)) == phase1_cells(
        orders.repartition(17, "o_totalprice")
    )
    # and the end-to-end salted result still matches the plain groupBy
    plain = sorted(map(tuple, orders.groupBy("o_orderstatus").count().collect()))
    salted = sorted(
        map(tuple, salted_agg(orders.repartition(5), ["o_orderstatus"], aggs).collect())
    )
    assert sorted((r[0], r[1]) for r in salted) == plain


def test_salted_agg_skips_map_columns(spark):
    # Spark's hash() rejects MapType; the salt must exclude map columns
    # instead of failing the whole salted plan (metadata tables here are
    # map-typed)
    df = spark.createDataFrame(
        [("a", {"k": "1"}, 10), ("a", {"k": "2"}, 5), ("b", {}, 7)],
        "key string, meta map<string,string>, v int",
    )
    out = salted_agg(df, ["key"], [("total", "v", "sum")], n_salts=4)
    assert sorted(map(tuple, out.collect())) == [("a", 15), ("b", 7)]


def test_row_salt_all_map_columns_needs_explicit_cols(spark):
    import pytest

    from sbs_suptech_etl_v2_spark.functions.skew import _row_salt

    df = spark.createDataFrame([({"k": "1"},)], "meta map<string,string>")
    with pytest.raises(ValueError, match="map-typed"):
        _row_salt(df, 4)
