"""Null-input behavior of the Arrow pandas UDF surface (ADVICE r8).

The parity corpus has no nulls, so the oracle sweep never exercises
missing inputs — but a real corpus does, and before round 9 a single
NULL text/value/weight raised from inside the Arrow batch (NaN ->
.astype('int64')) and killed every row in the executor batch. These
tests pin SQL-style null semantics: null in -> null out for the scalar
UDF; aggregate ignores null rows and yields NULL on an empty/zero-weight
group."""

from __future__ import annotations

import pyspark.sql.functions as F

from hnarchive_spark.functions.pandas_udfs import (
    readability_score_e4,
    weighted_mean_e4,
)


def test_readability_null_text_yields_null_not_crash(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None), (3, "x")], "id long, text string"
    )
    rows = {
        r["id"]: r["score"]
        for r in df.select(
            "id", readability_score_e4(F.col("text")).alias("score")
        ).collect()
    }
    assert rows[2] is None
    # non-null rows in the same Arrow batch still score exactly
    assert rows[1] == 1_000_000 - (50_000 * 14) // 3 - 3_000
    assert rows[3] == 1_000_000 - 50_000 - 1_000


def test_weighted_mean_ignores_null_rows(spark):
    df = spark.createDataFrame(
        [("g", 100, 1), ("g", None, 7), ("g", 300, None), ("g", 300, 3)],
        "k string, value_cents long, wt long",
    )
    out = df.groupBy("k").agg(
        weighted_mean_e4(F.col("value_cents"), F.col("wt")).alias("wmean_e4")
    )
    # only (100,1) and (300,3) count: (100*1 + 300*3)*100 // 4 = 25000
    assert out.collect()[0]["wmean_e4"] == 25_000


def test_weighted_mean_all_null_group_yields_null(spark):
    df = spark.createDataFrame(
        [("g", None, 1), ("h", 100, 0)], "k string, value_cents long, wt long"
    )
    rows = {
        r["k"]: r["wmean_e4"]
        for r in df.groupBy("k")
        .agg(weighted_mean_e4(F.col("value_cents"), F.col("wt")).alias("wmean_e4"))
        .collect()
    }
    assert rows["g"] is None  # no usable rows
    assert rows["h"] is None  # zero weight sum
