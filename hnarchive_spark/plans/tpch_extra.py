"""Third relational wave: the remaining classic TPC-H query shapes the
schema supports (no partsupp table in the testdata, so Q2/Q9/Q11/Q16/Q20
have no direct analog; Q4/Q12 are adapted to the columns that exist).

Every output follows the repo-wide exact-integer convention: money as
cents (round(x*100) at the scan), discounted revenue as cents x100
(cents * (100 - disc_pct)), ratios as floor-divided e4 integers with
nonnegative numerators (Spark `div` == DuckDB `//`), and correlated
average conditions cross-multiplied into pure-integer comparisons so no
float ever reaches either engine's plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hnarchive_spark.plans.registry import query
from hnarchive_spark.tables import load


def _cents(col: str):
    return F.round(F.col(col) * 100, 0).cast("long")


_REV = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


@query(
    "q_priority_pipeline",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_late_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape (order priority checking), adapted to the columns "
    "present: orders in a 1-year window with at least one line item "
    "shipped more than 60 days after the order date, counted per "
    "priority. Left-semi join carries only the order key + date through "
    "the exchange; the date-lag predicate rides as a join residual.",
)
def q_priority_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
    )


@query(
    "q_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST(sum({_REV}) AS BIGINT) AS revenue_c100
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
    doc="TPC-H Q7 shape (volume shipping): revenue flowing between a "
    "nation pair in both directions, by shipment year. Supplier and "
    "nation dims broadcast; the disjunctive nation-pair filter runs "
    "after the broadcast joins so the fact side shuffles once for the "
    "orders join only.",
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("sn_key"))
        .join(n2, F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(rev).alias("revenue_c100"))
    )


@query(
    "q_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(sum({_REV}) AS BIGINT) AS revenue_c100,
           CAST(round(c.c_acctbal * 100) AS BIGINT) AS c_acctbal_cents,
           n.n_name
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c_acctbal_cents, n.n_name
    ORDER BY revenue_c100 DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned item reporting): top-20 customers by "
    "revenue lost to returns in a quarter-pair window. Returnflag filter "
    "pushes to the lineitem scan; nation broadcast; deterministic top-k "
    "via TakeOrdered with the key tiebreak.",
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            _cents("c_acctbal").alias("c_acctbal_cents"),
            "n_name",
        )
        .agg(F.sum(rev).alias("revenue_c100"))
        .orderBy(F.col("revenue_c100").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue_c100", "c_acctbal_cents", "n_name")
    )


@query(
    "q_shipmode_priority",
    oracle="""
    SELECT l.l_linestatus,
           count(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_priority_lines,
           count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_priority_lines
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape (shipping priority dispatch), adapted: per line "
    "status (the dispatch dimension the schema has in place of shipmode), "
    "conditional counts of high- vs low-priority order lines in a "
    "1-year shipment window — the join + CASE-partitioned aggregation "
    "pattern.",
)
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_priority_lines"),
            F.count(F.when(~high, 1)).alias("low_priority_lines"),
        )
    )


@query(
    "q_promo_revenue",
    oracle=f"""
    WITH r AS (
      SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {_REV} ELSE 0 END)
                  AS BIGINT) AS promo_c100,
             CAST(sum({_REV}) AS BIGINT) AS total_c100
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
        AND l.l_shipdate <  TIMESTAMP '1997-04-01'
    )
    SELECT promo_c100, total_c100,
           CAST((promo_c100 * 10000) // total_c100 AS BIGINT) AS promo_frac_e4
    FROM r
    """,
    doc="TPC-H Q14 shape (promotion effect): fraction of one month's "
    "revenue from PROMO-type parts. Part dim broadcast; the fraction is "
    "a floor-divided e4 integer over two exact cents-x100 sums (both "
    "nonnegative), so no float reaches either plan.",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = F.broadcast(load(spark, sf_dir, "part").select("p_partkey", "p_type"))
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias(
                "promo_c100"
            ),
            F.sum(rev).alias("total_c100"),
        )
        .select(
            "promo_c100",
            "total_c100",
            F.expr("(promo_c100 * 10000) div total_c100").alias("promo_frac_e4"),
        )
    )


@query(
    "q_top_supplier",
    oracle=f"""
    WITH srev AS (
      SELECT l.l_suppkey, CAST(sum({_REV}) AS BIGINT) AS revenue_c100
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.revenue_c100
    FROM srev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.revenue_c100 = (SELECT max(revenue_c100) FROM srev)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 shape (top supplier): per-supplier quarterly revenue, "
    "then the argmax row(s) via aggregate-then-join-back against the "
    "max scalar (the window-free formulation — the per-supplier partial "
    "agg collapses before any row movement, and the max is one "
    "broadcast scalar). Exact cents-x100 revenue makes the max "
    "unambiguous across engines.",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    srev = li.groupBy("l_suppkey").agg(F.sum(rev).alias("revenue_c100"))
    mx = srev.agg(F.max("revenue_c100").alias("mx"))
    s = F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        srev.crossJoin(F.broadcast(mx))
        .filter(F.col("revenue_c100") == F.col("mx"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "revenue_c100")
        .orderBy("s_suppkey")
    )


@query(
    "q_small_qty_revenue",
    oracle="""
    WITH pq AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq,
             count(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS small_qty_revenue_cents,
           count(*) AS n_lines
    FROM lineitem l
    JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE 5 * CAST(round(l.l_quantity) AS BIGINT) * pq.cnt < pq.sq
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue): line items whose "
    "quantity is below 20% of their part's average quantity. The "
    "correlated average condition qty < 0.2 * (sum/cnt) is "
    "cross-multiplied into the pure-integer 5*qty*cnt < sum — exact on "
    "both engines, no division anywhere. The per-part aggregate "
    "collapses map-side before the join back.",
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    pq = li.groupBy("l_partkey").agg(
        F.sum(qty).alias("sq"), F.count(F.lit(1)).alias("cnt")
    ).withColumnRenamed("l_partkey", "pq_partkey")
    return (
        li.join(pq, li.l_partkey == pq.pq_partkey)
        .filter(5 * qty * F.col("cnt") < F.col("sq"))
        .agg(
            F.sum(_cents("l_extendedprice")).alias("small_qty_revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


LARGE_ORDER_QTY = 150


@query(
    "q_large_orders",
    oracle=f"""
    WITH oq AS (
      SELECT l_orderkey,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity) AS BIGINT)) > {LARGE_ORDER_QTY}
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, oq.total_qty
    FROM oq
    JOIN orders o   ON o.o_orderkey = oq.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY oq.total_qty DESC, o.o_orderkey
    LIMIT 20
    """,
    doc=f"TPC-H Q18 shape (large volume customers): orders whose total "
    f"quantity exceeds {LARGE_ORDER_QTY} units, with their customers, "
    "top-20 by quantity. The HAVING collapses the fact table to "
    "qualifying order keys BEFORE the joins — the joins move only "
    "survivors.",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    oq = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("total_qty"))
        .filter(F.col("total_qty") > LARGE_ORDER_QTY)
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        oq.join(o, oq.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@query(
    "q_disjunctive_filter",
    oracle=f"""
    SELECT CAST(sum({_REV}) AS BIGINT) AS revenue_c100, count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
    doc="TPC-H Q19 shape (discounted revenue, disjunctive predicates): an "
    "OR of three brand/size/quantity conjunctions spanning both join "
    "sides — exercises Catalyst's ability to keep the equi-join while "
    "evaluating the disjunction as a post-join filter, with the "
    "join-side-local parts of the OR pushed toward the scans.",
)
def q_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = F.broadcast(load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size"))
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & q.between(20, 40))
    )
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(rev).alias("revenue_c100"), F.count(F.lit(1)).alias("n_lines"))
    )


@query(
    "q_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
             AS revenue_delta_c100,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND round(l_discount * 100) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecasting revenue change): the pure scan-bound "
    "single-table aggregate — date range + discount band + quantity cap, "
    "summing extendedprice*discount as exact cents-x100 integers. Every "
    "predicate except the derived discount band pushes into the parquet "
    "scan (min-max row-group skipping on l_shipdate at scale); no join, "
    "no wide shuffle — one partial+final agg. The discount band compares "
    "the rounded integer pct on both engines so the float third-decimal "
    "noise in the stored double can't flip boundary rows.",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.round(F.col("l_discount") * 100, 0).cast("long").between(5, 7)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_cents("l_extendedprice") * _cents("l_discount")).alias("revenue_delta_c100"),
        F.count(F.lit(1)).alias("n_lines"),
    )
