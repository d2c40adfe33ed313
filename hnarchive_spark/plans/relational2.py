"""Second relational wave: multi-dimensional aggregation (cube / grouping
sets), deterministic sampling, range join, and approximate distinct — the
rest of the SURVEY §2.9 general surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hnarchive_spark.plans.registry import query
from hnarchive_spark.tables import load


@query(
    "q_agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over two dimensions (all 4 grouping combinations in one pass "
    "via Expand — one shuffle, not four queries). Totals as exact integer "
    "cents.",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("total_cents"),
        )
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS (flag-only, status-only, grand total). "
    "Quantities are integral-valued doubles, summed as exact BIGINT units.",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_sample_hash",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
    FROM orders
    WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 100 < 10
    """,
    doc="Deterministic 10% sample by key hash — reproducible across engines "
    "and runs (unlike rng-based sampling), stable under repartitioning, and "
    "exactly what a 100 TB pipeline uses for consistent train/eval splits.",
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    bucket = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    return o.filter(bucket < 10).select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("o_totalprice_cents"),
    )


@query(
    "q_range_join",
    oracle="""
    SELECT o.o_orderkey, count(e.event_id) AS n_events_week_before
    FROM orders o
    LEFT JOIN events e
      ON e.user_id = o.o_custkey
     AND e.ts >  o.o_orderdate - INTERVAL 7 DAY
     AND e.ts <= o.o_orderdate
    GROUP BY o.o_orderkey
    """,
    doc="Range join (events within the 7 days before each order): equi-key "
    "on the user plus a time-band predicate — Spark plans the equi part as "
    "the shuffle key so the band filter runs within key groups, not as a "
    "cartesian.",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    e = load(spark, sf_dir, "events")
    cond = (
        (e.user_id == o.o_custkey)
        & (e.ts > o.o_orderdate - F.expr("INTERVAL 7 DAY"))
        & (e.ts <= o.o_orderdate)
    )
    return (
        o.join(e, cond, "left")
        .groupBy("o_orderkey")
        .agg(F.count("event_id").alias("n_events_week_before"))
    )


INTERVAL_LEN_DAYS = 30  # fulfillment-window length; also the bucket width


@query(
    "q_interval_overlap",
    # Semantic oracle: same-customer order pairs whose 30-day fulfillment
    # windows overlap (equal-length intervals overlap iff |start diff| <
    # length). The Spark plan is the bucketed candidate generation: with
    # bucket width == interval length, a qualifying pair's start buckets
    # differ by at most 1, so the probe side's {b-1, b, b+1} union is
    # complete and hits each pair on exactly one equi-key.
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             epoch_us(o_orderdate) // 86400000000 AS d
      FROM orders
    )
    SELECT a.o_custkey AS custkey, a.o_orderkey AS o1, b.o_orderkey AS o2,
           CAST({INTERVAL_LEN_DAYS} - abs(b.d - a.d) AS BIGINT) AS overlap_days
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND abs(b.d - a.d) < {INTERVAL_LEN_DAYS}
    """,
    doc=f"Interval-overlap self join: same-customer orders whose "
    f"{INTERVAL_LEN_DAYS}-day fulfillment windows overlap, with the "
    "overlap length in whole days. The naive plan is an equi-join on the "
    "customer alone with a quadratic per-customer compare; the registered "
    "plan adds the interval START BUCKET (width = interval length) to the "
    "equi-key with a 3-bucket neighbor union on the probe side — the "
    "standard interval-join blocking that bounds per-key fanout by "
    "orders-per-customer-per-month instead of orders-per-customer-ever. "
    "Day arithmetic is integer microseconds-per-day division on both "
    "engines (timestamps are midnight-exact).",
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        # o_orderdate arrives as TIMESTAMP_NTZ; the session is pinned UTC, so
        # the cast is wall-clock-identical to DuckDB's epoch_us
        F.expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").alias("d"),
    ).withColumn("bkt", F.expr(f"d div {INTERVAL_LEN_DAYS}"))
    probe = o.withColumn(
        "blk", F.explode(F.array(F.col("bkt") - 1, F.col("bkt"), F.col("bkt") + 1))
    )
    a, b = probe.alias("a"), o.alias("b")
    diff = F.abs(F.col("b.d") - F.col("a.d"))
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.blk") == F.col("b.bkt"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (diff < INTERVAL_LEN_DAYS),
        )
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("o1"),
            F.col("b.o_orderkey").alias("o2"),
            (INTERVAL_LEN_DAYS - diff).alias("overlap_days"),
        )
    )


@query(
    "q_window_range_frame",
    # Frame ordered by MICROSECONDS on both engines: every event in the
    # synthetic data has a sub-second component, so Spark's whole-second
    # unix_timestamp vs DuckDB's fractional epoch() would draw different
    # 1-hour frame boundaries (latent r1->r5 divergence, caught by the
    # round-5 rotation).  The rolling sum is emitted as exact integer cents
    # (per-row round(value*100) is integral; integer-valued double sums are
    # order-independent) instead of round(sum(double), 2).
    oracle="""
    SELECT user_id, event_id,
           count(*) OVER w AS n_last_hour,
           CAST(round(sum(round(value * 100)) OVER w) AS BIGINT) AS sum_last_hour_cents
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="RANGE-frame window: rolling 1-hour per-user aggregates ordered by "
    "event time at microsecond precision (value-based frame, not "
    "row-based) — one shuffle on the user key. The rolling sum is exact "
    "integer cents so the hash is order- and engine-independent.",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.round(F.sum(F.round(F.col("value") * 100, 0)).over(w), 0)
        .cast("long")
        .alias("sum_last_hour_cents"),
    )


@query(
    "q_stratified_sample",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 100
          < CASE WHEN c_mktsegment = 'BUILDING' THEN 20 ELSE 5 END
    """,
    doc="Stratified deterministic sampling: per-stratum rates (20% BUILDING, "
    "5% rest) from the same key hash — reproducible class-balanced splits.",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    bucket = F.conv(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8), 16, 10
    ).cast("long") % 100
    rate = F.when(F.col("c_mktsegment") == "BUILDING", 20).otherwise(5)
    return c.filter(bucket < rate).select("c_custkey", "c_mktsegment")


@query(
    "q_filtered_agg",
    # bulk_revenue in exact integer cents (sum of integer-valued doubles is
    # order-independent; a raw double sum would make the hash depend on
    # Spark's partial-aggregation order).
    oracle="""
    SELECT l_returnflag,
           count(*)                                        AS n_all,
           count(*)    FILTER (WHERE l_discount > 0.05)    AS n_discounted,
           CAST(round(sum(round(l_extendedprice * 100)) FILTER (WHERE l_quantity >= 30))
                AS BIGINT)                                 AS bulk_revenue_cents
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="FILTER-clause aggregates: conditional aggregation without CASE "
    "noise, one pass over the scan. Money output is exact integer cents.",
)
def q_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_fa")
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*)                                     AS n_all,
               count(*) FILTER (WHERE l_discount > 0.05)    AS n_discounted,
               CAST(round(sum(round(l_extendedprice * 100, 0)) FILTER (WHERE l_quantity >= 30), 0)
                    AS BIGINT)                              AS bulk_revenue_cents
        FROM lineitem_fa GROUP BY l_returnflag
        """
    )


@query(
    "q_lateral_join",
    oracle="""
    SELECT n.n_name, t.o_orderkey, t.o_totalprice_cents
    FROM nation n,
    LATERAL (
      SELECT o.o_orderkey,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY o_totalprice_cents DESC, o.o_orderkey
      LIMIT 2
    ) t
    """,
    doc="LATERAL correlated subquery join: top-2 orders per nation computed "
    "per outer row (Catalyst plans a DomainJoin/decorrelated limit). Prices "
    "as integer cents (order-identical to the source double).",
)
def q_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_lj")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_lj")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_lj")
    return spark.sql(
        """
        SELECT n.n_name, t.o_orderkey, t.o_totalprice_cents
        FROM nation_lj n,
        LATERAL (
          SELECT o.o_orderkey,
                 CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS o_totalprice_cents
          FROM orders_lj o JOIN customer_lj c ON o.o_custkey = c.c_custkey
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY o_totalprice_cents DESC, o.o_orderkey
          LIMIT 2
        ) t
        """
    )


@query(
    "q_unpivot",
    oracle="""
    WITH piv AS (
      SELECT o_orderpriority,
             count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS cnt_o,
             count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS cnt_f,
             count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS cnt_p
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'O' AS status, cnt_o AS n FROM piv
    UNION ALL SELECT o_orderpriority, 'F', cnt_f FROM piv
    UNION ALL SELECT o_orderpriority, 'P', cnt_p FROM piv
    """,
    doc="Unpivot (wide -> long) via stack(): the inverse of q_pivot_status.",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce(F.col("O"), F.lit(0)).alias("cnt_o"),
            F.coalesce(F.col("F"), F.lit(0)).alias("cnt_f"),
            F.coalesce(F.col("P"), F.lit(0)).alias("cnt_p"),
        )
    )
    return piv.select(
        "o_orderpriority",
        F.expr("stack(3, 'O', cnt_o, 'F', cnt_f, 'P', cnt_p) AS (status, n)"),
    ).select("o_orderpriority", "status", "n")


@query(
    "q_having",
    # Average and HAVING predicate both in exact integer cents: the balance
    # sum as round(x*100) integers is order-independent, the rounded mean is
    # the BIGINT round-half-up recipe (2*sum + n) // (2*n), and the
    # avg > 2400 predicate cross-multiplies to sum_cents > 240000 * n so no
    # float compare can flip row membership at the boundary.
    oracle="""
    SELECT c_mktsegment, count(*) AS n,
           CAST((2 * CAST(sum(round(c_acctbal * 100)) AS BIGINT) + count(*))
                // (2 * count(*)) AS BIGINT) AS avg_bal_cents
    FROM customer
    GROUP BY c_mktsegment
    HAVING CAST(sum(round(c_acctbal * 100)) AS BIGINT) > 240000 * count(*)
       AND count(*) > 10
    """,
    doc="Post-aggregation HAVING filter (predicate over aggregates). Mean "
    "balance and threshold are exact integer cents on both engines.",
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("c_acctbal") * 100, 0)).cast("long").alias("_sum_cents"),
        )
        .filter((F.col("_sum_cents") > 240000 * F.col("n")) & (F.col("n") > 10))
        .select(
            "c_mktsegment",
            "n",
            F.expr("(2 * _sum_cents + n) div (2 * n)").alias("avg_bal_cents"),
        )
    )


@query(
    "q_window_funcs",
    oracle="""
    SELECT event_id, user_id,
           lag(event_id)  OVER w AS prev_event,
           lead(event_id) OVER w AS next_event,
           first_value(event_id) OVER w AS first_event,
           ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS quartile,
           CAST(round(value * 100) - lag(round(value * 100)) OVER w AS BIGINT)
             AS value_delta_cents
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Analytic window battery: lag/lead/first_value/ntile/deltas per user "
    "timeline — one shuffle on the partition key serves all six functions. "
    "The delta is a difference of exact integer cents, not a rounded "
    "double difference.",
)
def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(order).alias("prev_event"),
        F.lead("event_id").over(order).alias("next_event"),
        F.first("event_id").over(w).alias("first_event"),
        F.ntile(4).over(order).alias("quartile"),
        (
            F.round(F.col("value") * 100, 0)
            - F.lag(F.round(F.col("value") * 100, 0)).over(order)
        )
        .cast("long")
        .alias("value_delta_cents"),
    )


@query(
    "q_correlated_subquery",
    # Mean spend fully in BIGINT: per-row round(x*100) cents are exactly
    # integral, their sum is order-independent, and the rounded mean is the
    # round-half-up recipe (2*sum + n) // (2*n) — no double division or
    # round() tie rule anywhere.  A customer with no orders yields
    # sum = NULL, count = 0 and NULL // 0 is NULL on both engines, matching
    # the empty-scalar-subquery semantics of the float original.
    oracle="""
    SELECT c_custkey, c_name,
           (SELECT CAST((2 * CAST(sum(round(o.o_totalprice * 100)) AS BIGINT) + count(*))
                        // (2 * count(*)) AS BIGINT)
            FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS avg_spend_cents
    FROM customer c WHERE c_custkey < 100
    """,
    doc="Correlated scalar subquery — Catalyst decorrelates it into an "
    "aggregate + left join (no per-row re-execution). The mean is exact "
    "integer cents end-to-end (round-half-up rational recipe), so the hash "
    "cannot depend on summation order or either engine's round() ties.",
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_cs")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_cs")
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT (2 * CAST(sum(round(o.o_totalprice * 100, 0)) AS BIGINT) + count(*))
                       div (2 * count(*))
                FROM orders_cs o
                WHERE o.o_custkey = c.c_custkey) AS avg_spend_cents
        FROM customer_cs c WHERE c_custkey < 100
        """
    )


@query(
    "q_percentiles",
    # Exact percentiles WITHOUT quantile_cont/percentile: the engines'
    # internal interpolation formulas are not bit-portable (proven rounds
    # 2/3).  Instead: per-row exact cents, row_number order statistics, and
    # integer-scaled linear interpolation — p = q*(n-1) sits between 1-based
    # ranks lo = floor + 1 and lo + 1 with fractional part r/b, and the
    # b-scaled value v_lo*(b-r) + v_hi*r is a pure BIGINT (b = 2, 10, 100
    # for p50/p90/p99).  Same recipe as q_corpus_datacard's token
    # percentiles.
    oracle="""
    WITH cents AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
      FROM events
    ),
    ranked AS (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY event_type) AS nn
      FROM cents
    )
    SELECT event_type,
           max(CASE WHEN rn = (nn - 1) // 2 + 1 THEN v END)
             + max(CASE WHEN rn = nn // 2 + 1 THEN v END) AS p50_cents_x2,
           max(CASE WHEN rn = (9 * (nn - 1)) // 10 + 1 THEN v END)
               * (10 - max((9 * (nn - 1)) % 10))
             + max(CASE WHEN rn = least((9 * (nn - 1)) // 10 + 2, nn) THEN v END)
               * max((9 * (nn - 1)) % 10) AS p90_cents_x10,
           max(CASE WHEN rn = (99 * (nn - 1)) // 100 + 1 THEN v END)
               * (100 - max((99 * (nn - 1)) % 100))
             + max(CASE WHEN rn = least((99 * (nn - 1)) // 100 + 2, nn) THEN v END)
               * max((99 * (nn - 1)) % 100) AS p99_cents_x100
    FROM ranked GROUP BY event_type
    """,
    doc="Exact interpolated percentiles per group, computed from order "
    "statistics with integer-scaled interpolation over exact cents — "
    "bit-identical on every engine/build, unlike quantile_cont/percentile "
    "whose interpolation arithmetic differs. At 100 TB the "
    "approx_percentile sketch would replace this; the exact form is the "
    "oracle-checkable twin.",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    wt = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
    ).select(
        "event_type",
        "v",
        F.row_number().over(wt.orderBy("v")).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("nn"),
    )
    return ranked.groupBy("event_type").agg(
        (
            F.max(F.when(F.expr("rn = (nn - 1) div 2 + 1"), F.col("v")))
            + F.max(F.when(F.expr("rn = nn div 2 + 1"), F.col("v")))
        ).alias("p50_cents_x2"),
        (
            F.max(F.when(F.expr("rn = (9 * (nn - 1)) div 10 + 1"), F.col("v")))
            * (10 - F.max(F.expr("(9 * (nn - 1)) % 10")))
            + F.max(F.when(F.expr("rn = least((9 * (nn - 1)) div 10 + 2, nn)"), F.col("v")))
            * F.max(F.expr("(9 * (nn - 1)) % 10"))
        ).alias("p90_cents_x10"),
        (
            F.max(F.when(F.expr("rn = (99 * (nn - 1)) div 100 + 1"), F.col("v")))
            * (100 - F.max(F.expr("(99 * (nn - 1)) % 100")))
            + F.max(F.when(F.expr("rn = least((99 * (nn - 1)) div 100 + 2, nn)"), F.col("v")))
            * F.max(F.expr("(99 * (nn - 1)) % 100"))
        ).alias("p99_cents_x100"),
    )


@query(
    "q_topk_per_group",
    oracle="""
    WITH oc AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    best AS (
      SELECT o_custkey, max(cents) AS best_price_cents
      FROM oc GROUP BY o_custkey
    )
    SELECT o.o_custkey, b.best_price_cents, min(o.o_orderkey) AS best_orderkey
    FROM oc o JOIN best b
      ON o.o_custkey = b.o_custkey AND o.cents = b.best_price_cents
    GROUP BY o.o_custkey, b.best_price_cents
    """,
    doc="Top-1 per group via aggregate-then-join-back (the window-free "
    "formulation — cheaper when groups are huge because the partial agg "
    "collapses before any row movement). Prices compared and emitted as "
    "exact integer cents.",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", cents.alias("cents")
    ).alias("o")
    best = (
        load(spark, sf_dir, "orders")
        .select("o_custkey", cents.alias("cents"))
        .groupBy("o_custkey")
        .agg(F.max("cents").alias("best_price_cents"))
        .withColumnRenamed("o_custkey", "b_custkey")
        .alias("b")
    )
    return (
        o.join(
            best,
            (F.col("o.o_custkey") == F.col("b.b_custkey"))
            & (F.col("o.cents") == F.col("b.best_price_cents")),
        )
        .groupBy(F.col("o.o_custkey").alias("o_custkey"), F.col("b.best_price_cents"))
        .agg(F.min(F.col("o.o_orderkey")).alias("best_orderkey"))
    )


@query(
    "q_setops_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    doc="Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL) — multiplicity-"
    "preserving variants of q_setops.",
)
def q_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    c = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.intersectAll(b).exceptAll(c)


@query(
    "q_heavy_hitters_cms",
    oracle=None,  # sketch internals are engine-specific -> rows-only check;
    # tests/test_sketches.py asserts the CMS overcount guarantee vs exact.
    doc="Count-Min sketch heavy hitters: per-partition sketches merged into "
    "one (count_min_sketch agg), then point estimates for the candidate "
    "keys — the O(1)-memory frequency path at 100 TB. Estimates are "
    "guaranteed >= true counts (one-sided error); the hash-checked "
    "companion q_heavy_hitters_exact carries the same candidate keys with "
    "portable exact counts.",
)
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # distributed sketch build: count_min_sketch aggregates per partition and
    # merges (one tiny binary to the driver); lookups are O(1) per key.
    # KNOWN PRIVATE-API DEPENDENCY: the readback goes through
    # spark._jvm (py4j) to org.apache.spark.util.sketch.CountMinSketch —
    # a stable public JVM class, but _jvm itself is not public PySpark API.
    # The alternative (hand-parsing the sketch's serialized layout: version
    # int, totalCount long, depth/width ints, table longs) would couple us
    # to the binary format instead; the JVM readback is the lesser coupling.
    # tests/test_sketches.py asserts the overcount guarantee against exact
    # counts so a readback break is caught loudly.
    raw = bytes(
        ev.agg(
            F.expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").alias("sk")
        ).collect()[0]["sk"]
    )
    jvm = spark.sparkContext._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytearray(raw))
    )
    cands = sorted(
        r["user_id"]
        for r in ev.select("user_id").filter("user_id < 20").distinct().collect()
    )
    # box as java.lang.Long: the sketch hashed LongType values, and
    # estimateCount dispatches on the runtime type
    rows = [
        (int(k), int(sketch.estimateCount(jvm.java.lang.Long(int(k))))) for k in cands
    ]
    return spark.createDataFrame(rows, "user_id long, est_count long")


@query(
    "q_heavy_hitters_exact",
    oracle="""
    SELECT user_id, count(*) AS exact_count
    FROM events WHERE user_id < 20
    GROUP BY user_id
    """,
    doc="Exact-count companion to q_heavy_hitters_cms: the same candidate "
    "key set (user_id < 20) with portable exact counts, hash-checked "
    "against the DuckDB oracle. Together with the rows-only sketch row and "
    "tests/test_sketches.py's overcount-guarantee assertion, this proves "
    "the CMS estimates bound a driver-verified ground truth rather than "
    "merely returning rows. Single partial-agg shuffle; the candidate "
    "filter is pushed to the scan.",
)
def q_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )


@query(
    "q_approx_distinct",
    oracle=None,  # HLL sketches differ across engines -> rows-only check
    doc="approx_count_distinct (HyperLogLog++): the sketch-based cardinality "
    "path for 100 TB-scale distincts. No SQL oracle — DuckDB's HLL gives "
    "different estimates; the companion exact query q_distinct_count is the "
    "hash-checked twin.",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_cust_approx"))
    )


@query(
    "q_skew_salted_agg",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           CAST(round(sum(round(value * 100))) AS BIGINT) AS total_cents
    FROM events GROUP BY user_id
    """,
    doc="Skew-safe two-phase aggregation (operators/skew.py): rows get a "
    "deterministic content-hash salt, phase 1 aggregates on (key, salt) "
    "spreading a hot key across 16 reducers, phase 2 combines the partials "
    "— the explicit form of what AQE's skew handling does for joins, for "
    "the GROUP BY case AQE can't split. The oracle is the plain GROUP BY: "
    "salting must be semantically invisible. Money as exact integer cents "
    "(sum of longs commutes across the two phases).",
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.operators.skew import salted_aggregate

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    return salted_aggregate(
        ev, "user_id", {"n_events": ("count", "*"), "total_cents": ("sum", "cents")}
    )


@query(
    "q_skew_salted_join",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment,
           CAST(round(e.value * 100) AS BIGINT) AS cents
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
    doc="Skew-safe equi-join (operators/skew.py salted_join): the big/skewed "
    "left (events) gets a deterministic full-row-content-hash salt, the "
    "dimension-scale right (customer) is replicated across all 16 salts, "
    "and the join runs on (key, salt) — spreading a hot key over 16 "
    "reducers. This is the explicit fallback for the case AQE skew-split "
    "can't reach (e.g. a forced non-broadcast strategy or pre-Spark-3.2 "
    "clusters); content-hash salting keeps placement stable across task "
    "retries and AQE re-plans. The oracle is the PLAIN join: salting must "
    "be semantically invisible, and the replicated side never changes the "
    "row multiset.",
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.operators.skew import salted_join

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return salted_join(ev, cust, "user_id").select(
        "event_id", "user_id", "c_mktsegment", "cents"
    )


@query(
    "q_funnel",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
    )
    SELECT u.user_id, epoch_us(t1) AS t1_us, epoch_us(t2) AS t2_us,
           epoch_us(t3) AS t3_us,
           CAST(CASE WHEN t1 IS NULL THEN 0 WHEN t2 IS NULL THEN 1
                     WHEN t3 IS NULL THEN 2 ELSE 3 END AS BIGINT) AS reached
    FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
    LEFT JOIN s3 USING (user_id)
    """,
    doc="Ordered funnel analysis (view -> click -> purchase): per user, the "
    "first view, the first click strictly AFTER that view, and the first "
    "purchase strictly after that click — the product-analytics staple. "
    "Three filtered partial-aggregations chained by equi-joins on user_id "
    "(every stage's input is pre-filtered to one event type before its "
    "shuffle, and all shuffles share the user_id key so AQE coalesces "
    "them); deliberately NOT a per-user collect_list fold, which would "
    "materialize unbounded per-user event arrays at 100 TB. Stage times "
    "emitted as epoch microseconds (BIGINT).",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    reached = (
        F.when(F.col("t1").isNull(), 0)
        .when(F.col("t2").isNull(), 1)
        .when(F.col("t3").isNull(), 2)
        .otherwise(3)
        .cast("long")
    )
    return (
        u.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            F.unix_micros("t1").alias("t1_us"),
            F.unix_micros("t2").alias("t2_us"),
            F.unix_micros("t3").alias("t3_us"),
            reached.alias("reached"),
        )
    )


@query(
    "q_retention_cohorts",
    oracle="""
    WITH first_day AS (
      SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    )
    SELECT CAST(f.cohort_day AS TIMESTAMP) AS cohort_day,
           CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
           count(*) AS n_users
    FROM active a JOIN first_day f USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Retention cohort analysis: users grouped by first-active day, "
    "counted on each later active day offset — the (cohort x day) retention "
    "triangle behind every engagement dashboard. Two partial-agg shuffles "
    "(per-user first day; distinct user-days) joined on user_id, then one "
    "small group — the per-user results are corpus-cardinality but carry "
    "two columns each, and nothing is collected. Day offsets as BIGINT, "
    "cohort day as a midnight timestamp.",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    active = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    return (
        active.join(first_day, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").cast("long").alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "q_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr, sn.n_name AS supp_nation,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS volume_e4
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'AMERICA'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    )
    SELECT yr, supp_nation, CAST(volume_e4 AS BIGINT) AS volume_e4,
           CAST(round(CAST(volume_e4 AS DOUBLE)
                      / CAST(sum(volume_e4) OVER (PARTITION BY yr) AS DOUBLE)
                      * 1000000) AS BIGINT) AS share_e6
    FROM vol
    """,
    doc="TPC-H Q8 shape (supplier-nation market share per year for one part "
    "type sold into one region): the deepest star join in the inventory — "
    "lineitem against five broadcast dims plus orders; selective filters "
    "(p_type, r_name, date band) reach the scans so the fact shuffle only "
    "carries qualifying rows, then one partial+final agg and a tiny window "
    "over (year). Money as exact integer e4 units (cents x discount "
    "percent); the share is one exactly-rounded division of two exact "
    "integers, emitted e6-scaled BIGINT.",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    )
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    cn = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(
        load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    )
    s = F.broadcast(load(spark, sf_dir, "supplier"))
    sn = F.broadcast(
        load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_nationkey"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    volume_e4 = F.round(F.col("l_extendedprice") * 100, 0).cast("long") * (
        100 - F.round(F.col("l_discount") * 100, 0).cast("long")
    )
    vol = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cn, c.c_nationkey == cn.n_nationkey)
        .join(r, cn.n_regionkey == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(sn, s.s_nationkey == sn.sn_nationkey)
        .groupBy(
            F.year("o_orderdate").cast("long").alias("yr"), "supp_nation"
        )
        .agg(F.sum(volume_e4).alias("volume_e4"))
    )
    w = Window.partitionBy("yr")
    share_e6 = F.round(
        F.col("volume_e4").cast("double")
        / F.sum("volume_e4").over(w).cast("double")
        * 1_000_000,
        0,
    ).cast("long")
    return vol.select("yr", "supp_nation", "volume_e4", share_e6.alias("share_e6"))


@query(
    "q_percentiles_scalable",
    # Same oracle as q_percentiles — selection is exact, only the physical
    # strategy differs (histogram prune vs per-key window sort).
    oracle="""
    WITH cents AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
      FROM events
    ),
    ranked AS (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY event_type) AS nn
      FROM cents
    )
    SELECT event_type,
           max(CASE WHEN rn = (nn - 1) // 2 + 1 THEN v END)
             + max(CASE WHEN rn = nn // 2 + 1 THEN v END) AS p50_cents_x2,
           max(CASE WHEN rn = (9 * (nn - 1)) // 10 + 1 THEN v END)
               * (10 - max((9 * (nn - 1)) % 10))
             + max(CASE WHEN rn = least((9 * (nn - 1)) // 10 + 2, nn) THEN v END)
               * max((9 * (nn - 1)) % 10) AS p90_cents_x10,
           max(CASE WHEN rn = (99 * (nn - 1)) // 100 + 1 THEN v END)
               * (100 - max((99 * (nn - 1)) % 100))
             + max(CASE WHEN rn = least((99 * (nn - 1)) // 100 + 2, nn) THEN v END)
               * max((99 * (nn - 1)) % 100) AS p99_cents_x100
    FROM ranked GROUP BY event_type
    """,
    doc="Exact grouped percentiles WITHOUT the per-key window sort: "
    "operators/rankselect.py histogram pruning. The q_percentiles window "
    "idiom serializes each group's total sort onto one task — with 5 "
    "event types over a 100 TB fact table that is 5 tasks doing all the "
    "work. Here a parallel (key, v div 1024) histogram routes each "
    "requested rank to its single bucket via a METADATA-sized running "
    "sum, and only the few target buckets' rows are ever ranked (semi-"
    "join + per-bucket window). Identical values — the driver hash-"
    "checks this physical strategy against the same oracle, and "
    "test_rankselect.py locks row equality with q_percentiles.",
)
def q_percentiles_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.operators.rankselect import grouped_rank_values

    ev = load(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("v")
    )
    ranks = {
        "p50_lo": "(nn - 1) div 2 + 1",
        "p50_hi": "nn div 2 + 1",
        "p90_lo": "(9 * (nn - 1)) div 10 + 1",
        "p90_hi": "least((9 * (nn - 1)) div 10 + 2, nn)",
        "p99_lo": "(99 * (nn - 1)) div 100 + 1",
        "p99_hi": "least((99 * (nn - 1)) div 100 + 2, nn)",
    }
    rv = grouped_rank_values(ev, "event_type", "v", ranks)
    f9 = F.expr("(9 * (nn - 1)) % 10")
    f99 = F.expr("(99 * (nn - 1)) % 100")
    return rv.select(
        "event_type",
        (F.col("p50_lo") + F.col("p50_hi")).alias("p50_cents_x2"),
        (F.col("p90_lo") * (10 - f9) + F.col("p90_hi") * f9).alias("p90_cents_x10"),
        (F.col("p99_lo") * (100 - f99) + F.col("p99_hi") * f99).alias("p99_cents_x100"),
    )


@query(
    "q_join_full_outer",
    oracle="""
    WITH cut AS (
      SELECT date_trunc('day', min(ts)) + INTERVAL 3 DAY AS early,
             date_trunc('day', min(ts)) + INTERVAL 27 DAY AS late
      FROM events
    ),
    h1 AS (
      SELECT user_id, count(*) AS n1 FROM events, cut
      WHERE ts < cut.early AND event_type = 'purchase' GROUP BY user_id
    ),
    h2 AS (
      SELECT user_id, count(*) AS n2 FROM events, cut
      WHERE ts >= cut.late AND event_type = 'error' GROUP BY user_id
    )
    SELECT coalesce(h1.user_id, h2.user_id) AS user_id,
           coalesce(h1.n1, 0) AS n_before, coalesce(h2.n2, 0) AS n_after,
           CASE WHEN h1.user_id IS NULL THEN 'new'
                WHEN h2.user_id IS NULL THEN 'churned'
                ELSE 'retained' END AS cohort
    FROM h1 FULL OUTER JOIN h2 ON h2.user_id = h1.user_id
    """,
    doc="FULL OUTER join (the one join mode the battery was missing as a "
    "registered read query — the merge engine uses it internally): "
    "early purchasers vs late error-reporters (narrow data-derived windows, "
    "so each side genuinely misses users and both null-padding paths fire), "
    "null-padded on either "
    "side and classified new / churned / retained. Both inputs are "
    "partial-aggregated per-user counts before the join, so the full-"
    "outer shuffle carries one row per user per side.",
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    cut_df = e.agg(
        (F.date_trunc("day", F.min("ts")) + F.expr("INTERVAL 3 DAYS")).alias("early"),
        (F.date_trunc("day", F.min("ts")) + F.expr("INTERVAL 27 DAYS")).alias("late"),
    )
    e = e.crossJoin(F.broadcast(cut_df))
    h1 = (
        e.filter((F.col("ts") < F.col("early")) & (F.col("event_type") == "purchase"))
        .groupBy(F.col("user_id").alias("u1"))
        .agg(F.count(F.lit(1)).alias("n1"))
    )
    h2 = (
        e.filter((F.col("ts") >= F.col("late")) & (F.col("event_type") == "error"))
        .groupBy(F.col("user_id").alias("u2"))
        .agg(F.count(F.lit(1)).alias("n2"))
    )
    j = h1.join(h2, h1["u1"] == h2["u2"], "full_outer")
    return j.select(
        F.coalesce(F.col("u1"), F.col("u2")).alias("user_id"),
        F.coalesce(F.col("n1"), F.lit(0)).alias("n_before"),
        F.coalesce(F.col("n2"), F.lit(0)).alias("n_after"),
        F.when(F.col("u1").isNull(), "new")
        .when(F.col("u2").isNull(), "churned")
        .otherwise("retained")
        .alias("cohort"),
    )
