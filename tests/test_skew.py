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


def test_ngram_max_df_drops_stop_shingles_keeps_planted_pairs(spark):
    """The max_df scale knob prunes stop-shingles before the pair join but
    must not lose genuinely near-duplicate pairs (their overlap is spread
    across many distinctive shingles, not a few hot ones)."""
    from hnarchive_spark.operators.dedup import jaccard_pairs, word_shingles
    from hnarchive_spark.tables import load

    docs = load(spark, SF, "documents")
    sh = word_shingles(docs)
    full = {(r["d1"], r["d2"]) for r in jaccard_pairs(sh, 0.5).collect()}
    capped = {(r["d1"], r["d2"]) for r in jaccard_pairs(sh, 0.4, max_df=50).collect()}
    assert full, "expected planted near-dup pairs in the corpus"
    # slightly relaxed threshold under max_df (dropped shingles shrink both
    # intersection and union); every full-threshold pair must survive
    assert full <= capped
