"""Histogram-prune rank selection: exactness vs the window idiom."""

from __future__ import annotations

from pyspark.sql import functions as F

from hnarchive_spark.operators.rankselect import grouped_rank_values
from hnarchive_spark.plans.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_scalable_percentiles_equal_window_idiom(spark):
    a = {tuple(r) for r in all_queries()["q_percentiles"](spark, SF).collect()}
    b = {tuple(r) for r in all_queries()["q_percentiles_scalable"](spark, SF).collect()}
    assert a == b


def test_rank_values_match_sorted_reference(spark):
    """Every rank 1..n on a small group must equal the sorted list —
    including ranks landing on bucket boundaries (width 4 forces many
    buckets and boundary offsets)."""
    vals = [7, 3, 3, 15, 2, 9, 4, 4, 21, 8, 1, 16]
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v long")
    want = sorted(vals)
    ranks = {f"r{i}": f"{i}" for i in range(1, len(vals) + 1)}
    got = grouped_rank_values(df, "k", "v", ranks, bucket_width=4).collect()[0]
    for i in range(1, len(vals) + 1):
        assert got[f"r{i}"] == want[i - 1], i


def test_negative_values_bucket_correctly(spark):
    vals = [-9, -1, 0, 5, -20, 3]
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v long")
    got = grouped_rank_values(
        df, "k", "v", {"lo": "1", "mid": "3", "hi": "6"}, bucket_width=4
    ).collect()[0]
    w = sorted(vals)
    assert (got["lo"], got["mid"], got["hi"]) == (w[0], w[2], w[5])


def test_scalable_shard_assignment_equals_window_idiom(spark):
    a = {tuple(r) for r in all_queries()["q_shard_assignment"](spark, SF).collect()}
    b = {
        tuple(r)
        for r in all_queries()["q_shard_assignment_scalable"](spark, SF).collect()
    }
    assert a == b


def test_grouped_global_rank_is_a_permutation(spark):
    from hnarchive_spark.operators.rankselect import grouped_global_rank

    vals = [(k, v, i) for i, (k, v) in enumerate(
        [("a", 5), ("a", 5), ("a", 9), ("a", 1), ("b", 3), ("b", 3), ("b", 3)]
    )]
    df = spark.createDataFrame(vals, "k string, v long, id long")
    got = grouped_global_rank(df, "k", "v", "id", descending=True, bucket_width=2)
    by_key = {}
    for r in got.collect():
        by_key.setdefault(r.k, []).append((r.rank, r.v, r.id))
    for k, rows in by_key.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        # rank order == (v desc, id asc) order
        assert rows == sorted(rows, key=lambda t: (-t[1], t[2]))


def test_scalable_decile_binning_equals_window_idiom(spark):
    SF01 = "/root/testdata/sf0.01"  # segments with n % 10 != 0 exercise the
    # uneven-bucket branch of the ntile-from-rank formula
    a = {tuple(r) for r in all_queries()["q_decile_binning"](spark, SF01).collect()}
    b = {
        tuple(r)
        for r in all_queries()["q_decile_binning_scalable"](spark, SF01).collect()
    }
    assert a == b


def test_grouped_prefix_sum_equals_window_idiom(spark):
    """Inclusive running sum must match the ANSI window cumsum exactly —
    including ties inside a bucket and runs spanning bucket boundaries
    (width 2 forces both)."""
    from pyspark.sql import Window

    from hnarchive_spark.operators.rankselect import grouped_prefix_sum

    rows = [
        ("a", 9, 1, 10), ("a", 9, 2, 20), ("a", 5, 3, 7), ("a", 2, 4, 1),
        ("a", 2, 5, 2), ("b", 4, 6, 100), ("b", 3, 7, 50), ("b", 1, 8, 25),
    ]
    df = spark.createDataFrame(rows, "k string, v long, id long, x long")
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("v").desc(), F.col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r.k, r.id): r.cum
        for r in df.select("k", "id", F.sum("x").over(w).alias("cum")).collect()
    }
    got = {
        (r.k, r.id): r.cum
        for r in grouped_prefix_sum(df, "k", "v", "id", "x", bucket_width=2).collect()
    }
    assert got == want


def test_grouped_global_rank_with_count_emits_group_totals(spark):
    from hnarchive_spark.operators.rankselect import grouped_global_rank

    rows = [("a", 5, 1), ("a", 9, 2), ("a", 1, 3), ("b", 3, 4), ("b", 3, 5)]
    df = spark.createDataFrame(rows, "k string, v long, id long")
    got = grouped_global_rank(df, "k", "v", "id", bucket_width=2, with_count=True)
    for r in got.collect():
        assert r.nn == {"a": 3, "b": 2}[r.k]


def test_reservoir_result_is_partitioning_invariant(spark):
    """The mapInPandas pre-filter's SURVIVORS depend on the input layout,
    but the reservoir RESULT must not: any global per-source top-k row is
    also a within-partition top-k row, so 1-partition, many-partition and
    shuffled layouts must all yield the identical sample."""
    from pyspark.sql import functions as F

    from hnarchive_spark.plans.registry import all_queries
    from hnarchive_spark.tables import load

    base = {
        tuple(r)
        for r in all_queries()["q_reservoir_per_source"](spark, SF).collect()
    }
    d = load(spark, SF, "documents")
    for layout in (
        d.repartition(1),
        d.repartition(64),
        d.repartition(F.col("doc_id") % 7),
    ):
        import hnarchive_spark.plans.dedup as DP

        # rebuild the same query over the altered layout
        k = DP.RESERVOIR_K
        pre_base = layout.select(
            "source", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
        )

        def _topk(batches, k=k):
            import pandas as pd

            acc = None
            for pdf in batches:
                cur = pdf if acc is None else pd.concat([acc, pdf])
                acc = (
                    cur.sort_values(["source", "h", "doc_id"], kind="mergesort")
                    .groupby("source", sort=False)
                    .head(k)
                )
            if acc is not None and len(acc):
                yield acc

        from pyspark.sql import Window

        pre = pre_base.mapInPandas(_topk, schema=pre_base.schema)
        w = Window.partitionBy("source").orderBy("h", "doc_id")
        got = {
            tuple(r)
            for r in pre.select(
                "source", "doc_id", F.row_number().over(w).alias("rk")
            )
            .filter(F.col("rk") <= k)
            .collect()
        }
        assert got == base
