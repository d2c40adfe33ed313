"""Sketch guarantees: Count-Min estimates are one-sided (>= exact count) and
within the eps*N error bound; HLL approx distinct lands within its rsd."""

from __future__ import annotations

from pyspark.sql import functions as F

from hnarchive_spark.plans.registry import all_queries
from hnarchive_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_cms_one_sided_and_bounded(spark):
    ev = load(spark, SF, "events")
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(exact.values())
    est = {
        r["user_id"]: r["est_count"]
        for r in all_queries()["q_heavy_hitters_cms"](spark, SF).collect()
    }
    assert est, "expected candidate users"
    for k, e in est.items():
        assert e >= exact[k], (k, e, exact[k])  # never undercounts
        assert e <= exact[k] + 0.001 * total + 1, (k, e, exact[k])  # eps*N bound


def test_approx_distinct_within_rsd(spark):
    exact = (
        load(spark, SF, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    )
    exact_map = {r["o_orderstatus"]: r["n"] for r in exact}
    approx = {
        r["o_orderstatus"]: r["n_cust_approx"]
        for r in all_queries()["q_approx_distinct"](spark, SF).collect()
    }
    for k, n in exact_map.items():
        assert abs(approx[k] - n) <= max(3, 0.1 * n), (k, approx[k], n)
