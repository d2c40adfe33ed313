"""Relational query library — SURVEY.md §2.4 (Q1-Q6) and §2.9 (the general
relational surface the reference gets "for free" from Spark SQL).

Design rules applied throughout (these are what make the plans scale):

* dimension tables (region/nation/supplier/part) are explicitly
  ``F.broadcast`` — no shuffle for the small side at any scale factor;
* filters sit directly on base scans so parquet pushdown sees them;
* projections are minimal so ReadSchema stays narrow;
* no float ever reaches an output: money is integer cents at the scan and
  every aggregate/ratio is exact BIGINT (see the conversion note below);
* every top-k has a total order (tiebreak on a key column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hnarchive_spark.plans.registry import query
from hnarchive_spark.tables import load

# ---------------------------------------------------------------------------
# §2.4 — the reference's own read patterns
# ---------------------------------------------------------------------------


# Exact-integer money convention (retires the round-2/3 float-parity class):
# every 2-decimal source double becomes CAST(round(x*100) AS BIGINT) cents /
# pct at the scan (the *100 product is within 1e-9 of an integer, so the
# round is unambiguous on both engines), and all downstream arithmetic stays
# BIGINT — discounted price = cents*(100-disc_pct) (cents x100), charge =
# cents*(100-disc_pct)*(100+tax_pct) (cents x10000), averages via integer
# `div` with nonnegative numerators (trunc == floor, so Spark div == DuckDB //).


def _cents(col: str):
    return F.round(F.col(col) * 100, 0).cast("long")


@query(
    "q_point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey = 42
    """,
    doc="Q1 select_item (hnarchive.py:280-283): point equi-filter on the key; "
    "parquet predicate pushdown + min-max file skipping at scale.",
)
def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == 42)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            _cents("o_totalprice").alias("o_totalprice_cents"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


@query(
    "q_fk_filter",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
           CAST(round(l_quantity) AS BIGINT)            AS l_quantity_units,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS l_extendedprice_cents,
           CAST(round(l_discount * 100) AS BIGINT)      AS l_discount_pct,
           CAST(round(l_tax * 100) AS BIGINT)           AS l_tax_pct,
           l_returnflag, l_linestatus, l_shipdate
    FROM lineitem WHERE l_orderkey = 100
    """,
    doc="Q2 select_child_items (hnarchive.py:264-270): FK equi-filter "
    "(children-of-parent pattern).",
)
def q_fk_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") == 100)
        .select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            F.round(F.col("l_quantity"), 0).cast("long").alias("l_quantity_units"),
            _cents("l_extendedprice").alias("l_extendedprice_cents"),
            _cents("l_discount").alias("l_discount_pct"),
            _cents("l_tax").alias("l_tax_pct"),
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )
    )


@query(
    "q_fk_filter_2",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
    FROM orders WHERE o_custkey = 42 AND o_custkey IS NOT NULL
    """,
    doc="Q3 select_poll_options (hnarchive.py:272-278): second edge type with "
    "the partial-index IS NOT NULL pre-filter semantics.",
)
def q_fk_filter_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isNotNull() & (F.col("o_custkey") == 42))
        .select(
            "o_orderkey", "o_orderstatus", _cents("o_totalprice").alias("o_totalprice_cents")
        )
    )


@query(
    "q_max_key",
    oracle="SELECT max(o_orderkey) AS max_key FROM orders",
    doc="Q4 select_latest_id (hnarchive.py:285-290): ORDER BY key DESC LIMIT 1 "
    "== max() for a NOT NULL key; Spark plans a partial+final agg, no sort.",
)
def q_max_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").agg(F.max("o_orderkey").alias("max_key"))


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
    FROM orders
    ORDER BY o_totalprice_cents DESC, o_orderkey
    LIMIT 10
    """,
    doc="Q4 generalized top-k: Spark plans TakeOrderedAndProject — "
    "per-partition heap + driver merge, no global sort. Ordering by integer "
    "cents is identical to ordering by the source double (x -> round(100x) "
    "is monotone on 2-decimal data).",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", _cents("o_totalprice").alias("o_totalprice_cents"))
        .orderBy(F.col("o_totalprice_cents").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q_derived_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_extendedprice * (1 - l_discount) <= 2000
      AND l_shipdate < TIMESTAMP '2000-01-01'
    """,
    doc="Q5 staleness scan shape (hnarchive.py:540-551): arithmetic predicate "
    "over two columns + conjunction + column pruning to the key.",
)
def q_derived_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) <= 2000)
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber")


@query(
    "q_staleness",
    oracle="""
    SELECT event_id
    FROM events
    WHERE epoch(TIMESTAMP '2024-02-01 00:00:00') - epoch(ts) <= 7 * 86400
    """,
    doc="Q5 update_items staleness scan (hnarchive.py:543-546): "
    "(now - time) <= seconds, projected to the id only. 'now' is bound as a "
    "literal exactly like the reference binds time.time().",
)
def q_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    now = F.unix_timestamp(F.lit("2024-02-01 00:00:00").cast("timestamp"))
    ev = load(spark, sf_dir, "events")
    return ev.filter((now - F.unix_timestamp(F.col("ts"))) <= 7 * 86400).select("event_id")


@query(
    "q_window_sort",
    oracle="""
    SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
    FROM events
    """,
    doc="Q6 per-parent time sort (hnarchive.py:350): "
    "Window.partitionBy(parent).orderBy(time) — one shuffle on the group key.",
)
def q_window_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .select("user_id", "event_id", F.row_number().over(w).alias("seq"))
    )


# ---------------------------------------------------------------------------
# §2.9 — joins
# ---------------------------------------------------------------------------


@query(
    "q_join_fk",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(round(l.l_extendedprice * 100) AS BIGINT) AS l_extendedprice_cents,
           o.o_orderdate, o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F' AND l.l_quantity > 45
    """,
    doc="Fact-to-fact FK join; both sides filtered before the shuffle so the "
    "exchange moves only qualifying rows (AQE may still broadcast the small side).",
)
def q_join_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        _cents("l_extendedprice").alias("l_extendedprice_cents"),
        "o_orderdate",
        "o_orderpriority",
    )


@query(
    "q_self_join",
    oracle="""
    SELECT a.n_name AS n1_name, b.n_name AS n2_name, r.r_name
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    JOIN region r ON r.r_regionkey = a.n_regionkey
    """,
    doc="Self-join (the items.parent -> items.id pattern, hnarchive.py:264-270 "
    "generalized): nation pairs within a region, dims broadcast.",
)
def q_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    a, b = n.alias("a"), n.alias("b")
    r = load(spark, sf_dir, "region").alias("r")
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .join(F.broadcast(r), F.col("r.r_regionkey") == F.col("a.n_regionkey"))
        .select(
            F.col("a.n_name").alias("n1_name"),
            F.col("b.n_name").alias("n2_name"),
            F.col("r.r_name").alias("r_name"),
        )
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
    """,
    doc="Left-semi join (EXISTS): ships only the join key of the probe side.",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS): customers with no orders.",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_join_broadcast",
    oracle="""
    SELECT p.p_brand,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
             AS revenue_c100,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 20
    GROUP BY p.p_brand
    """,
    doc="Broadcast hash join with a dimension table: the 100 TB-critical "
    "pattern — no shuffle of the fact side for the join itself. Revenue is "
    "exact integer cents x100 (cents * (100 - disc_pct)), summation-order "
    "and engine independent.",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(rev).alias("revenue_c100"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# §2.9 — aggregation
# ---------------------------------------------------------------------------


@query(
    "q_groupby_agg",
    oracle="""
    WITH li AS (
      SELECT l_returnflag, l_linestatus,
             CAST(round(l_quantity) AS BIGINT)            AS qty,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(round(l_discount * 100) AS BIGINT)      AS dp,
             CAST(round(l_tax * 100) AS BIGINT)           AS tp
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(sum(qty) AS BIGINT)                        AS sum_qty,
           CAST(sum(cents) AS BIGINT)                      AS sum_base_price_cents,
           CAST(sum(cents * (100 - dp)) AS BIGINT)         AS sum_disc_price_c100,
           CAST(sum(cents * (100 - dp) * (100 + tp)) AS BIGINT) AS sum_charge_c10000,
           CAST((sum(qty) * 10000) // count(*) AS BIGINT)  AS avg_qty_e4,
           CAST((sum(cents) * 100) // count(*) AS BIGINT)  AS avg_price_e4,
           CAST((sum(dp) * 10000) // count(*) AS BIGINT)   AS avg_disc_e6,
           count(*)                                        AS count_order
    FROM li GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: map-side partial aggregation then a tiny exchange — "
    "the canonical scale-friendly aggregate. All measures exact BIGINT: "
    "cents / cents-x100 / cents-x10000 sums, averages as floor-divided "
    "e4/e6 integers (nonnegative numerators, so Spark div == DuckDB //).",
)
def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    cents = _cents("l_extendedprice")
    dp = _cents("l_discount")
    tp = _cents("l_tax")
    sums = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).alias("sum_qty"),
        F.sum(cents).alias("sum_base_price_cents"),
        F.sum(cents * (100 - dp)).alias("sum_disc_price_c100"),
        F.sum(cents * (100 - dp) * (100 + tp)).alias("sum_charge_c10000"),
        F.sum(dp).alias("_sum_dp"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return sums.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price_cents",
        "sum_disc_price_c100",
        "sum_charge_c10000",
        F.expr("(sum_qty * 10000) div count_order").alias("avg_qty_e4"),
        F.expr("(sum_base_price_cents * 100) div count_order").alias("avg_price_e4"),
        F.expr("(_sum_dp * 10000) div count_order").alias("avg_disc_e6"),
        "count_order",
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS total_bal_cents,
           count(*) AS n_cust
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    doc="Hierarchical rollup (region -> nation -> grand total) over a "
    "broadcast-dim star join. Balances summed as exact signed integer cents.",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.sum(_cents("c_acctbal")).alias("total_bal_cents"),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )


@query(
    "q_distinct_count",
    oracle="""
    SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Exact distinct aggregation (Spark plans a two-phase expand+agg).",
)
def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "q_pivot_status",
    oracle="""
    SELECT o_orderpriority,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS cnt_o,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS cnt_f,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS cnt_p
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot with an explicit value list (explicit list avoids the extra "
    "distinct-values job Spark otherwise runs).",
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    piv = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("cnt_o"),
        F.coalesce(F.col("F"), F.lit(0)).alias("cnt_f"),
        F.coalesce(F.col("P"), F.lit(0)).alias("cnt_p"),
    )


# ---------------------------------------------------------------------------
# §2.9 — windows
# ---------------------------------------------------------------------------


@query(
    "q_window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice_cents DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
    doc="Top-N per group via ranked window — the scalable 'largest order per "
    "customer' pattern (no driver collect). Ranking on integer cents is "
    "order-identical to the source double.",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = _cents("o_totalprice").alias("o_totalprice_cents")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice_cents").desc(), F.col("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", cents)
        .select("*", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


@query(
    "q_running_sum",
    oracle="""
    SELECT user_id, event_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS running_value_cents
    FROM events WHERE event_type = 'purchase'
    """,
    doc="Cumulative window frame per user (running spend) in exact integer "
    "cents — the prefix sum is summation-order independent.",
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id", "event_id", F.sum(_cents("value")).over(w).alias("running_value_cents")
        )
    )


# ---------------------------------------------------------------------------
# §2.9 — set ops, JSON
# ---------------------------------------------------------------------------


@query(
    "q_setops",
    oracle="""
    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
     UNION
     SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_nationkey = 3
    """,
    doc="UNION / INTERSECT / EXCEPT (distinct semantics on all three).",
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    positive = c.filter(F.col("c_acctbal") > 0).select("c_custkey")
    nation3 = c.filter(F.col("c_nationkey") == 3).select("c_custkey")
    return building.union(auto).distinct().intersect(positive).subtract(nation3)


@query(
    "q_json_extract",
    oracle="""
    SELECT CAST(props->>'$.k' AS INTEGER) // 10 AS k_bucket,
           count(*) AS n_events,
           CAST(round(sum(round(value * 100))) AS BIGINT) AS sum_value_cents
    FROM events
    GROUP BY 1
    """,
    doc="JSON extraction from a string column (the reference parses whole API "
    "documents; this is the queryable version via get_json_object). Money "
    "summed as exact integer cents so the hash is summation-order and "
    "engine independent.",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select(F.floor(k / 10).cast("int").alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0)).cast("long").alias("sum_value_cents"),
        )
    )


# ---------------------------------------------------------------------------
# flagship multi-join analytics (entry() runs q_flagship)
# ---------------------------------------------------------------------------


@query(
    "q_flagship",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
             AS revenue_c100
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape (local-supplier revenue by nation): the flagship "
    "star-join — dims broadcast, facts shuffle once on the join key, "
    "partial agg before the final exchange. Revenue is exact integer "
    "cents x100.",
)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = F.broadcast(load(spark, sf_dir, "supplier"))
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias("revenue_c100")
        )
    )


@query(
    "q_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
             AS revenue_c100,
           o.o_orderdate
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
      AND l.l_shipdate  > TIMESTAMP '1999-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue_c100 DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: filtered 3-way join + grouped revenue + "
    "deterministic top-10 (tiebreak on the key). Revenue is exact integer "
    "cents x100 so the ordering itself is engine-independent.",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias("revenue_c100")
        )
        .orderBy(F.col("revenue_c100").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue_c100", "o_orderdate")
    )
