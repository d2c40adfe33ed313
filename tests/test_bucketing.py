"""Bucketed co-located join (SURVEY §4 / mission 'bucketing for co-located
joins'): writing both fact tables bucketed by the join key lets the join
run with ZERO exchanges — the 100 TB pattern for repeated large joins."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hnarchive_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # warehouse dir is a static conf; default ./spark-warehouse is
    # gitignored, so just use it and drop the tables afterwards
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    (
        load(spark, SF, "lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_b")
    )
    (
        load(spark, SF, "orders")
        .withColumnRenamed("o_orderkey", "l_orderkey")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("o_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        j = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:2000]
        # and it computes the right thing
        expected = (
            load(spark, SF, "lineitem")
            .join(
                load(spark, SF, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
                "l_orderkey",
            )
            .count()
        )
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
