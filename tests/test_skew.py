"""Salted aggregation/join must be result-identical to the plain forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from hnarchive_spark.operators.skew import salted_aggregate, salted_join
from hnarchive_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_salted_aggregate_matches_plain(spark):
    ev = load(spark, SF, "events")
    plain = {
        (r["user_id"]): (r["n"], round(r["total"], 6), r["mx"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        (r["user_id"]): (r["n"], round(r["total"], 6), r["mx"])
        for r in salted_aggregate(
            ev, "user_id", {"n": ("count", "*"), "total": ("sum", "value"), "mx": ("max", "value")}
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    o = load(spark, SF, "orders").select("o_custkey", "o_orderkey")
    c = load(spark, SF, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = {(r["o_orderkey"], r["c_name"]) for r in o.join(c, "o_custkey").collect()}
    salted = {
        (r["o_orderkey"], r["c_name"])
        for r in salted_join(o, c, "o_custkey", n_salts=8).collect()
    }
    assert salted == plain
    # no duplicate explosion: row count matches exactly
    assert salted_join(o, c, "o_custkey", n_salts=8).count() == o.join(c, "o_custkey").count()
