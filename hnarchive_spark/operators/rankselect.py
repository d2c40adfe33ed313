"""Histogram-prune exact rank selection (grouped order statistics at scale).

The window idiom for exact grouped percentiles —
``row_number() OVER (PARTITION BY key ORDER BY v)`` — sorts EVERY group's
rows inside one partition, so a low-cardinality key (5 event types over a
100 TB fact table) serializes the whole sort onto n_keys tasks.  The
classic fix is histogram pruning (the distributed selection algorithm
behind BlinkDB/Quickselect-style exact quantiles):

1. bucket values by ``v div W`` and count per (key, bucket) — a fully
   parallel partial aggregate; the shuffle carries one row per non-empty
   bucket, never data rows;
2. running-sum the bucket counts per key (a window over the METADATA-sized
   bucket table) and locate, for every requested rank r, the single bucket
   where cum_before < r <= cum_before + c, plus the offset r - cum_before;
3. re-scan with a semi-join on the few (key, target-bucket) pairs — the
   only rows ever sorted are those inside target buckets (~W-dense
   subsets), ranked by a window partitioned by (key, bucket).

Results are EXACT (same values as the full sort — selection is
order-statistic, not approximate) and every rank lands with one extra scan
instead of a per-key total sort.  ``q_percentiles_scalable`` hash-matches
``q_percentiles``'s oracle through this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKET_WIDTH = 1024  # value units per histogram bucket


def grouped_rank_values(
    df: DataFrame,
    key_col: str,
    value_col: str,
    rank_exprs: dict[str, str],
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
) -> DataFrame:
    """Per key: the exact value at each requested 1-based rank.

    ``rank_exprs`` maps output-column name -> SQL expression over ``nn``
    (the group size), e.g. ``{"p50_lo": "(nn - 1) div 2 + 1"}``.  Returns
    one row per key with columns (key_col, nn, <one per rank name>).
    Values must be integral (the repo's cents/e6 convention).  Negatives
    are fine: Spark's ``div`` truncates toward zero (not floor), but
    truncation is still monotone in v, so bucket ids stay order-consistent
    — negative values merely share wider boundary buckets (e.g. widths -3..3
    all land in bucket 0 at W=4).  Don't expect these bucket ids to equal
    DuckDB's flooring ``//``; nothing here compares bucket ids across
    engines, only the selected values.
    """
    v = F.col(value_col)
    base = df.select(F.col(key_col).alias("k"), v.cast("long").alias("v"))
    # (1) parallel histogram: one row per non-empty (key, bucket)
    bcounts = (
        base.select("k", F.expr(f"v div {bucket_width}").alias("b"), "v")
        .groupBy("k", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # (2) metadata-sized running sum + rank -> bucket routing
    wb = Window.partitionBy("k").orderBy("b")
    cum = bcounts.select(
        "k",
        "b",
        "c",
        F.coalesce(F.sum("c").over(wb.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)).alias(
            "cum_before"
        ),
        F.sum("c").over(wb.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).alias(
            "nn"
        ),
    )
    names = list(rank_exprs)
    targets = cum.select(
        "k",
        "b",
        "c",
        "cum_before",
        "nn",
        *[F.expr(e).alias(f"rk_{n}") for n, e in rank_exprs.items()],
    )
    melted = targets.select(
        "k",
        "b",
        "cum_before",
        "nn",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("name"), F.col(f"rk_{n}").alias("rk")
                    )
                    for n in names
                ]
            )
        ).alias("t"),
        F.col("c"),
    ).select("k", "b", "cum_before", "nn", "t.name", "t.rk", "c")
    routed = melted.filter(
        (F.col("cum_before") < F.col("rk")) & (F.col("rk") <= F.col("cum_before") + F.col("c"))
    ).select("k", "b", "name", "nn", (F.col("rk") - F.col("cum_before")).alias("off"))
    # (3) candidate rows: only target buckets are ever ranked
    tb = routed.select("k", "b").distinct()
    cand = base.select("k", F.expr(f"v div {bucket_width}").alias("b"), "v").join(
        F.broadcast(tb), ["k", "b"], "left_semi"
    )
    wr = Window.partitionBy("k", "b").orderBy("v")
    ranked = cand.select("k", "b", "v", F.row_number().over(wr).alias("rn"))
    picked = routed.join(ranked, ["k", "b"]).filter(F.col("rn") == F.col("off"))
    # pivot rank names back to one row per key
    out = picked.groupBy("k").agg(
        F.max("nn").alias("nn"),
        *[F.max(F.when(F.col("name") == n, F.col("v"))).alias(n) for n in names],
    )
    return out.withColumnRenamed("k", key_col)


def grouped_global_rank(
    df: DataFrame,
    key_col: str,
    value_col: str,
    tiebreak_col: str,
    descending: bool = True,
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
    with_count: bool = False,
) -> DataFrame:
    """Per key: the exact 1-based rank of EVERY row under
    (value [desc], tiebreak [asc]) — without a per-key total sort.

    Same two-phase shape as :func:`grouped_rank_values` but materializing
    all ranks instead of selecting a few: rows bucket by value range, the
    window ranking runs per (key, bucket) — parallel — and each bucket's
    exclusive prefix count (a metadata-sized running sum) shifts local
    ranks to global ones.  This is the scalable form of
    ``row_number() OVER (PARTITION BY low_cardinality_key ORDER BY ...)``
    (ntile / round-robin dealing / LPT shard assignment all derive from
    this rank).  Ties across bucket boundaries are impossible: equal
    values share a bucket by construction.

    ``with_count=True`` additionally emits ``nn`` — the key's total row
    count — on every row.  The total falls out of the same metadata-sized
    bucket-count table the rank offsets come from, so consumers that need
    (rank, n) pairs (ntile, percentile-rank, Lorenz shares) never run a
    ``count() OVER (PARTITION BY key)`` window over the ranked fact rows
    (that window funnels every row of a key through one task — exactly the
    anti-pattern this operator exists to remove).
    """
    v = F.col(value_col)
    base = df.withColumn("_b", F.expr(f"{value_col} div {bucket_width}"))
    order = [v.desc() if descending else v.asc(), F.col(tiebreak_col).asc()]
    wb = Window.partitionBy(key_col, "_b").orderBy(*order)
    local = base.withColumn("_rn", F.row_number().over(wb))
    counts = base.groupBy(key_col, "_b").agg(F.count(F.lit(1)).alias("_c"))
    wo = Window.partitionBy(key_col).orderBy(
        F.col("_b").desc() if descending else F.col("_b").asc()
    )
    off_cols = [
        F.coalesce(F.sum("_c").over(wo.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)).alias(
            "_off"
        ),
    ]
    if with_count:
        off_cols.append(
            F.sum("_c")
            .over(wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
            .cast("long")
            .alias("nn")
        )
    offsets = counts.select(key_col, "_b", *off_cols)
    return (
        local.join(F.broadcast(offsets), [key_col, "_b"])
        .withColumn("rank", (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_b", "_rn", "_off")
    )


def grouped_prefix_sum(
    df: DataFrame,
    key_col: str,
    order_col: str,
    tiebreak_col: str,
    sum_col: str,
    descending: bool = True,
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
) -> DataFrame:
    """Per key: the exact inclusive running sum of ``sum_col`` under
    (order_col [desc], tiebreak [asc]) — without a per-key total sort.

    The prefix-sum sibling of :func:`grouped_global_rank`:
    ``sum(x) OVER (PARTITION BY key ORDER BY ... ROWS UNBOUNDED
    PRECEDING)`` with a low-cardinality key serializes each key's whole
    ordered scan onto one task.  Here rows bucket by order-value range,
    the running sum runs per (key, bucket) — parallel — and each bucket's
    exclusive prefix TOTAL (a metadata-sized running sum over one row per
    non-empty bucket) shifts local sums to global ones.  Equal order
    values share a bucket by construction, so no tie ever straddles a
    boundary.  Budget-cutoff selection (take rows until the running total
    passes N) is a filter on the resulting ``cum`` column.

    Returns ``df`` plus a ``cum`` (BIGINT) column; input column set is
    preserved.
    """
    o = F.col(order_col)
    base = df.withColumn("_b", F.expr(f"{order_col} div {bucket_width}"))
    order = [o.desc() if descending else o.asc(), F.col(tiebreak_col).asc()]
    wb = (
        Window.partitionBy(key_col, "_b")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("_ls", F.sum(sum_col).over(wb))
    totals = base.groupBy(key_col, "_b").agg(F.sum(sum_col).alias("_t"))
    wo = Window.partitionBy(key_col).orderBy(
        F.col("_b").desc() if descending else F.col("_b").asc()
    )
    offsets = totals.select(
        key_col,
        "_b",
        F.coalesce(F.sum("_t").over(wo.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)).alias(
            "_off"
        ),
    )
    return (
        local.join(F.broadcast(offsets), [key_col, "_b"])
        .withColumn("cum", (F.col("_off") + F.col("_ls")).cast("long"))
        .drop("_b", "_ls", "_off")
    )
