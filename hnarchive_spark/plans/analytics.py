"""Third relational wave: distribution / cohort-style business analytics.

Shapes not yet in the inventory: outer-join histogram (TPC-H Q13), scalar
per-group threshold + anti-join (Q22), the sole-late-supplier multi-predicate
(Q21 re-expressed as one aggregation instead of two correlated EXISTS),
integer-exact per-user anomaly flags, and a group-wise OLS trend with exact
rational outputs.

Every output column is integer (cents / counts / scaled rationals) so the
driver hash cannot drift across DuckDB builds — the repo-wide determinism
rule (see q_corpus_datacard's docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hnarchive_spark.plans.registry import query
from hnarchive_spark.tables import load


@query(
    "q_orders_per_customer_dist",
    oracle="""
    WITH cnt AS (
      SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
    ),
    per_cust AS (
      SELECT c.c_custkey, coalesce(cnt.n, 0) AS n_orders
      FROM customer c LEFT JOIN cnt ON cnt.o_custkey = c.c_custkey
    )
    SELECT n_orders, count(*) AS n_customers
    FROM per_cust GROUP BY n_orders
    """,
    doc="Order-count distribution over customers (TPC-H Q13 shape: outer "
    "join preserving zero-order customers, then a histogram of group "
    "sizes). Orders are pre-aggregated to per-custkey counts BEFORE the "
    "join — the shuffle carries one row per customer, not one per order "
    "(partial agg does the heavy reduction map-side), and the outer join "
    "keeps inactive customers via coalesce(n, 0). The final histogram agg "
    "is over ~n_customers rows with few distinct keys — negligible. At "
    "100 TB both sides shuffle on custkey; AQE picks the join strategy.",
)
def q_orders_per_customer_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    cnt = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    per_cust = c.join(cnt, c["c_custkey"] == cnt["o_custkey"], "left").select(
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders")
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


IDLE_SINCE = "2000-01-01"  # "idle" = no order on/after this date


@query(
    "q_idle_rich_customers",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, c_mktsegment,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ),
    seg AS (
      SELECT c_mktsegment, CAST(sum(cents) AS BIGINT) AS s, count(*) AS n
      FROM c WHERE cents > 0 GROUP BY c_mktsegment
    )
    SELECT c.c_mktsegment, count(*) AS n_custs,
           CAST(sum(c.cents) AS BIGINT) AS total_cents
    FROM c JOIN seg USING (c_mktsegment)
    WHERE c.cents * seg.n > seg.s
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '{IDLE_SINCE} 00:00:00')
    GROUP BY c.c_mktsegment
    """,
    doc="Idle high-balance customers (TPC-H Q22 shape): customers whose "
    "account balance beats their segment's positive-balance average and "
    f"who placed no order since {IDLE_SINCE} (the synthetic order stream "
    "gives every customer SOME order, so Q22's never-ordered predicate "
    "would be vacuously empty — recency-idle keeps the anti-join shape "
    "with real survivors). The above-average predicate is the exact "
    "integer cross-multiplication cents*n > sum_cents (no division, no "
    "float average), the per-segment averages are a 5-row broadcast, and "
    "the no-orders predicate is a left-anti join on custkey (Spark's "
    "NOT EXISTS). Orders ships only its custkey column through the "
    "anti-join exchange.",
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
    )
    seg = (
        c.filter(F.col("cents") > 0)
        .groupBy("c_mktsegment")
        .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    rich = c.join(F.broadcast(seg), "c_mktsegment").filter(
        F.col("cents") * F.col("n") > F.col("s")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(f"{IDLE_SINCE} 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    idle = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.sum("cents").alias("total_cents"),
    )


LATE_DAYS = 60  # order considered late when shipped > 60 days after orderdate


@query(
    "q_sole_late_supplier",
    oracle=f"""
    WITH j AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
                  THEN 1 ELSE 0 END AS late_row
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    ps AS (
      SELECT l_orderkey, l_suppkey, max(late_row) AS late
      FROM j GROUP BY l_orderkey, l_suppkey
    ),
    w AS (
      SELECT *, count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
             CAST(sum(late) OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_late
      FROM ps
    )
    SELECT s.s_name, count(*) AS numwait
    FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey
    WHERE w.late = 1 AND w.n_supp > 1 AND w.n_late = 1
    GROUP BY s.s_name
    """,
    doc="Suppliers who alone held up multi-supplier orders (TPC-H Q21 "
    f"shape, late = shipped >{LATE_DAYS} days after orderdate; the schema "
    "has no commit/receipt dates — reference Q21's commitdate predicate "
    "maps to this shipdate one). The classic form is two correlated "
    "EXISTS/NOT EXISTS self-joins on lineitem; here both collapse into "
    "ONE per-order aggregation — n_supp > 1 encodes EXISTS(other "
    "supplier), n_late = 1 encodes NOT EXISTS(other late supplier) — so "
    "lineitem is scanned once and shuffled once on orderkey instead of "
    "three scans + two extra joins. The window reuses the groupBy's "
    "orderkey clustering; supplier is a broadcast dim.",
)
def q_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        F.when(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS"),
            1,
        )
        .otherwise(0)
        .alias("late_row"),
    )
    ps = j.groupBy("l_orderkey", "l_suppkey").agg(F.max("late_row").alias("late"))
    wo = Window.partitionBy("l_orderkey")
    w = ps.select(
        "*",
        F.count(F.lit(1)).over(wo).alias("n_supp"),
        F.sum("late").over(wo).alias("n_late"),
    ).filter((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        w.join(F.broadcast(s), w["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


MIN_ACTIVE_DAYS = 7  # anomaly stats need a minimum per-user history


@query(
    "q_user_anomaly",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day, count(*) AS cnt
      FROM events GROUP BY user_id, date_trunc('day', ts)
    ),
    st AS (
      SELECT user_id, CAST(day AS TIMESTAMP) AS day, cnt,
             count(*) OVER (PARTITION BY user_id) AS n,
             CAST(sum(cnt) OVER (PARTITION BY user_id) AS BIGINT) AS s,
             CAST(sum(cnt * cnt) OVER (PARTITION BY user_id) AS BIGINT) AS ss
      FROM daily
    )
    SELECT user_id, day, cnt
    FROM st
    WHERE n >= {MIN_ACTIVE_DAYS}
      AND (n * cnt - s) > 0
      AND (n * cnt - s) * (n * cnt - s) > 4 * (n * ss - s * s)
    """,
    doc="Per-user activity anomalies: days where a user's event count sits "
    ">2 sigma above their own mean daily count. The 2-sigma test is exact "
    "integer algebra — (n*cnt - s)^2 > 4*(n*ss - s^2) cross-multiplies "
    "mean and variance away (no float, no sqrt), so both engines agree "
    "bit-for-bit even on boundary days. Exact within int64 for any user "
    "with daily counts below ~8e5 over a 10-year history; beyond that "
    "envelope switch to double Welford (noted, not needed for event "
    "streams where one user emits at human rates). One shuffle builds the "
    "(user, day) counts; the stats window re-clusters by user only.",
)
def q_user_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = (
        e.select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wu = Window.partitionBy("user_id")
    st = daily.select(
        "user_id",
        "day",
        "cnt",
        F.count(F.lit(1)).over(wu).alias("n"),
        F.sum("cnt").over(wu).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(wu).alias("ss"),
    )
    dev = F.col("n") * F.col("cnt") - F.col("s")
    return st.filter(
        (F.col("n") >= MIN_ACTIVE_DAYS)
        & (dev > 0)
        & (dev * dev > 4 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s")))
    ).select("user_id", "day", "cnt")


@query(
    "q_revenue_trend",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS priority, date_trunc('day', o_orderdate) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sc,
             count(*) AS c
      FROM orders GROUP BY 1, 2
    ),
    base AS (
      SELECT priority, min(day) AS d0 FROM daily GROUP BY priority
    ),
    xy AS (
      SELECT d.priority,
             CAST(date_diff('day', b.d0, d.day) AS BIGINT) AS x,
             (2 * d.sc + d.c) // (2 * d.c) AS y
      FROM daily d JOIN base b USING (priority)
    )
    SELECT priority, count(*) AS n_days,
           CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS slope_num,
           CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS slope_den
    FROM xy GROUP BY priority
    """,
    doc="Group-wise OLS trend of daily mean order value: per priority, the "
    "least-squares slope of (day index, mean daily cents) emitted as the "
    "exact rational num/den pair (slope = num/den) — no division ever "
    "runs, so the output is hash-stable and the caller picks its own "
    "precision. y is the round-half-up daily mean in cents ((2*sum+c)//"
    "(2*c)) — mean, not total, keeps every covariance term inside int64 "
    "at ANY scale factor (totals grow with volume; means don't). x is "
    "centered per group via its min day so x*x stays ~1e6 for a decade of "
    "days. Plan: one partial-agg shuffle to (priority, day), a 5-row "
    "broadcast of the min days, a 5-group final agg.",
)
def q_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    daily = (
        o.select(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("day", F.col("o_orderdate")).alias("day"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("priority", "day")
        .agg(F.sum("cents").alias("sc"), F.count(F.lit(1)).alias("c"))
    )
    base = daily.groupBy("priority").agg(F.min("day").alias("d0"))
    xy = daily.join(F.broadcast(base), "priority").select(
        "priority",
        F.datediff(F.col("day"), F.col("d0")).cast("long").alias("x"),
        F.expr("(2 * sc + c) div (2 * c)").alias("y"),
    )
    return xy.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_days"),
        (
            F.count(F.lit(1)) * F.sum(F.col("x") * F.col("y"))
            - F.sum("x") * F.sum("y")
        ).alias("slope_num"),
        (
            F.count(F.lit(1)) * F.sum(F.col("x") * F.col("x"))
            - F.sum("x") * F.sum("x")
        ).alias("slope_den"),
    )


@query(
    "q_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS priority, date_trunc('day', o_orderdate) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sc
      FROM orders GROUP BY 1, 2
    ),
    span AS (SELECT priority, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY priority),
    cal AS (
      SELECT priority, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM span
    ),
    j AS (
      SELECT c.priority, CAST(c.day AS TIMESTAMP) AS day, d.sc
      FROM cal c LEFT JOIN daily d ON d.priority = c.priority AND d.day = c.day
    )
    SELECT priority, day,
           CAST(last_value(sc IGNORE NULLS)
                OVER (PARTITION BY priority ORDER BY day) AS BIGINT)
             AS cents_filled,
           CASE WHEN sc IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM j
    """,
    doc="Calendar gap filling with forward fill: per priority, the daily "
    "revenue series is completed over the full min..max day range "
    "(sequence + explode generates the calendar engine-side — no driver "
    "loop, no calendar table), missing days carry the last observed "
    "value (last-ignore-nulls running window) and are flagged is_gap. "
    "The calendar explode produces one row per (group, day) — tiny next "
    "to the fact scan — and the fill window rides the same priority "
    "clustering as the join. The first calendar day always has data "
    "(span starts at an observed min), so the fill never emits NULL. "
    "Time-series regularization is the precondition for any rolling-"
    "window feature job; this is the scalable form.",
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    daily = (
        o.select(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("day", F.col("o_orderdate")).alias("day"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("priority", "day")
        .agg(F.sum("cents").alias("sc"))
    )
    span = daily.groupBy("priority").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = span.select(
        "priority",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    j = cal.join(daily, ["priority", "day"], "left")
    w = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "priority",
        "day",
        F.last("sc", ignorenulls=True).over(w).alias("cents_filled"),
        F.when(F.col("sc").isNull(), 1).otherwise(0).alias("is_gap"),
    )


@query(
    "q_length_histogram",
    oracle="""
    WITH t AS (
      SELECT source,
             CAST(len(list_filter(string_split(text, ' '), w -> w != ''))
                  AS BIGINT) AS n
      FROM documents
    )
    SELECT source,
           CAST(CASE WHEN n = 0 THEN -1 ELSE length(bin(n)) - 1 END AS BIGINT)
             AS log2_bucket,
           count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           min(n) AS min_tokens, max(n) AS max_tokens
    FROM t GROUP BY source, 2
    """,
    doc="Per-source document-length histogram in log2 buckets — the "
    "length-distribution audit behind truncation/packing decisions. "
    "floor(log2(n)) is computed WITHOUT floating log (whose boundary "
    "values, e.g. log2(2^k - 1), can round differently per libm build): "
    "length(bin(n)) - 1 is the integer bit-length, exact in both "
    "engines; empty docs land in bucket -1. Pure projection + one "
    "partial-agg shuffle on (source, bucket).",
)
def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.functions import text as T

    d = load(spark, sf_dir, "documents").select(
        "source", F.size(T.tokens(F.col("text"))).cast("long").alias("n")
    )
    bucket = (
        F.when(F.col("n") == 0, F.lit(-1))
        .otherwise(F.length(F.bin(F.col("n"))) - 1)
        .cast("long")
    )
    return (
        d.select("source", bucket.alias("log2_bucket"), "n")
        .groupBy("source", "log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.min("n").alias("min_tokens"),
            F.max("n").alias("max_tokens"),
        )
    )


_MED_X2 = """max(CASE WHEN rn = (nn - 1) // 2 + 1 THEN {v} END)
             + max(CASE WHEN rn = nn // 2 + 1 THEN {v} END)"""


@query(
    "q_outlier_mad",
    oracle=f"""
    WITH v AS (
      SELECT event_type, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    r1 AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY cents, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS nn
      FROM v
    ),
    med AS (
      SELECT event_type,
             CAST({_MED_X2.format(v="cents")} AS BIGINT) AS med_x2
      FROM r1 GROUP BY event_type
    ),
    d AS (
      SELECT v.event_type, v.event_id, v.cents,
             abs(2 * v.cents - m.med_x2) AS dev_x2, m.med_x2
      FROM v JOIN med m USING (event_type)
    ),
    r2 AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY dev_x2, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS nn
      FROM d
    ),
    mad AS (
      SELECT event_type,
             CAST({_MED_X2.format(v="dev_x2")} AS BIGINT) AS mad_x4
      FROM r2 GROUP BY event_type
    )
    SELECT d.event_type, max(d.med_x2) AS med_x2, max(mad.mad_x4) AS mad_x4,
           count(*) AS n,
           CAST(sum(CASE WHEN 2 * d.dev_x2 > 3 * mad.mad_x4 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           CAST(coalesce(sum(CASE WHEN 2 * d.dev_x2 > 3 * mad.mad_x4
                                  THEN d.cents END), 0) AS BIGINT)
             AS outlier_cents
    FROM d JOIN mad USING (event_type)
    GROUP BY d.event_type
    """,
    doc="Robust outlier detection via median absolute deviation: per event "
    "type, values more than 3 MAD from the median — the estimator that "
    "survives the very outliers a mean/sigma test gets dragged by (cf. "
    "q_user_anomaly's 2-sigma flags). Entirely integer: medians are the "
    "exact two-order-statistic sum (med_x2 = 2*median), deviations are "
    "dev_x2 = 2*|v - med|, the MAD median doubles again to mad_x4, and "
    "the flag 2*dev_x2 > 3*mad_x4 is |v-med| > 3*MAD with no division "
    "ever. Both medians come from histogram-prune rank selection "
    "(operators/rankselect.py — no per-type total sort) + two 5-row "
    "broadcast joins back.",
)
def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.operators.rankselect import grouped_rank_values

    e = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )

    def med_x2_of(df: DataFrame, col: str, out: str) -> DataFrame:
        # exact median via histogram-prune rank selection — no per-type
        # total sort (operators/rankselect.py); same two order statistics
        # as the window idiom.
        rv = grouped_rank_values(
            df.select("event_type", col),
            "event_type",
            col,
            {"m_l": "(nn - 1) div 2 + 1", "m_h": "nn div 2 + 1"},
        )
        return rv.select(
            "event_type", (F.col("m_l") + F.col("m_h")).cast("long").alias(out)
        )

    med = med_x2_of(e, "cents", "med_x2")
    d = e.join(F.broadcast(med), "event_type").withColumn(
        "dev_x2", F.abs(2 * F.col("cents") - F.col("med_x2"))
    )
    mad = med_x2_of(d.select("event_type", "event_id", "dev_x2"), "dev_x2", "mad_x4")
    flagged = d.join(F.broadcast(mad), "event_type")
    is_out = 2 * F.col("dev_x2") > 3 * F.col("mad_x4")
    return flagged.groupBy("event_type").agg(
        F.max("med_x2").alias("med_x2"),
        F.max("mad_x4").alias("mad_x4"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
        F.coalesce(F.sum(F.when(is_out, F.col("cents"))), F.lit(0)).alias("outlier_cents"),
    )


N_DECILES = 10


@query(
    "q_decile_binning",
    oracle=f"""
    WITH b AS (
      SELECT c_mktsegment,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
             ntile({N_DECILES}) OVER (PARTITION BY c_mktsegment
                                      ORDER BY round(c_acctbal * 100), c_custkey)
               AS decile
      FROM customer
    )
    SELECT c_mktsegment, CAST(decile AS BIGINT) AS decile,
           count(*) AS n_custs,
           min(cents) AS min_cents, max(cents) AS max_cents,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM b GROUP BY c_mktsegment, decile
    """,
    doc="Equi-depth decile binning of account balances per market segment "
    "(ntile over a TOTAL order — cents then custkey — so bucket "
    "boundaries cannot flip on ties) with per-bin count/min/max/sum "
    "audit: the feature-bucketing / monotone-binning primitive behind "
    "WoE scoring and percentile features. ntile's fill rule (first "
    "n mod k buckets take the extra row) is ANSI-identical across "
    "engines given the total order. One window shuffle on segment + the "
    "bin aggregate on the same clustering.",
)
def q_decile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_custkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy("cents", "c_custkey")
    b = c.select(
        "c_mktsegment", "cents", F.ntile(N_DECILES).over(w).cast("long").alias("decile")
    )
    return b.groupBy("c_mktsegment", "decile").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
        F.sum("cents").alias("sum_cents"),
    )


ATTR_WINDOW_DAYS = 7  # last-touch lookback


@query(
    "q_attribution_last_touch",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT event_id AS view_id, user_id, ts FROM events
      WHERE event_type = 'view'
    ),
    cand0 AS (
      SELECT p.purchase_id, v.view_id, v.ts AS vts,
             (epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS gap_s
      FROM p JOIN v ON v.user_id = p.user_id
       AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL {ATTR_WINDOW_DAYS} DAY
    ),
    cand AS (
      SELECT purchase_id, view_id, gap_s,
             row_number() OVER (PARTITION BY purchase_id
                                ORDER BY vts DESC, view_id DESC) AS rn
      FROM cand0
    ),
    hit AS (SELECT * FROM cand WHERE rn = 1)
    SELECT p.purchase_id, p.cents, h.view_id,
           CAST(h.gap_s AS BIGINT) AS gap_s
    FROM p LEFT JOIN hit h USING (purchase_id)
    """,
    doc="Last-touch attribution: each purchase credits the LATEST view by "
    f"the same user within {ATTR_WINDOW_DAYS} days (ties on ts broken by "
    "event_id — total order), unattributed purchases survive with NULL "
    "view — the as-of-join business shape done as candidate-range join + "
    "per-purchase rank-1 window. The user-key equi-join bounds "
    "candidates to one user's history (never a time-only range scan); "
    "join, window and the final purchase join all shuffle on the same "
    "user/purchase keys. gap_s is an exact epoch-seconds integer.",
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("vts"),
    )
    cand = p.join(v, "user_id").filter(
        (F.col("vts") <= F.col("pts"))
        & (F.col("vts") > F.col("pts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS"))
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("vts").desc(), F.col("view_id").desc()
    )
    hit = (
        cand.select(
            "purchase_id",
            "view_id",
            F.expr("(unix_micros(pts) - unix_micros(vts)) div 1000000").alias("gap_s"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return p.select("purchase_id", "cents").join(hit, "purchase_id", "left").select(
        "purchase_id", "cents", "view_id", F.col("gap_s").cast("long").alias("gap_s")
    )


RW_HALFLIFE_WEEKS = 1  # halve the weight every week of age
RW_MAX_STEPS = 20  # floor weight at 2^0 after 20 half-lives


@query(
    "q_recency_weighted",
    oracle=f"""
    WITH p AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    mx AS (SELECT event_type, max(day) AS d1 FROM p GROUP BY event_type),
    wtd AS (
      SELECT p.event_type, p.cents,
             (CAST(1 AS BIGINT) << ({RW_MAX_STEPS} - least(
                date_diff('day', p.day, mx.d1) // (7 * {RW_HALFLIFE_WEEKS}),
                {RW_MAX_STEPS}))) AS w
      FROM p JOIN mx USING (event_type)
    )
    SELECT event_type,
           count(*) AS n,
           CAST(sum(cents * w) AS BIGINT) AS weighted_num,
           CAST(sum(w) AS BIGINT) AS weight_den
    FROM wtd GROUP BY event_type
    """,
    doc="Exponential-decay recency weighting (half-life = "
    f"{RW_HALFLIFE_WEEKS} week): each event's value is weighted "
    "2^(20 - age_in_halflives), floored after "
    f"{RW_MAX_STEPS} half-lives, and the recency-weighted mean is "
    "emitted as the exact rational (weighted_num, weight_den) — the "
    "recency-score primitive behind trending/decay rankings. Weights "
    "are INTEGER powers of two from a bit-shift (shiftleft), never "
    "pow() doubles, so both engines agree exactly. The per-type max "
    "day is a 5-row broadcast; one partial-agg shuffle total.",
)
def q_recency_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    mx = e.groupBy("event_type").agg(F.max("day").alias("d1"))
    wtd = e.join(F.broadcast(mx), "event_type").select(
        "event_type",
        "cents",
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), {RW_MAX_STEPS} - least("
            f"datediff(d1, day) div (7 * {RW_HALFLIFE_WEEKS}), {RW_MAX_STEPS}))"
        ).alias("w"),
    )
    return wtd.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents") * F.col("w")).alias("weighted_num"),
        F.sum("w").alias("weight_den"),
    )


@query(
    "q_winsorize",
    oracle="""
    WITH v AS (
      SELECT event_type, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY cents, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS nn
      FROM v
    ),
    th AS (
      SELECT event_type,
             max(CASE WHEN rn = (nn - 1) // 20 + 1 THEN cents END)
               * (20 - max((nn - 1) % 20))
             + max(CASE WHEN rn = least((nn - 1) // 20 + 2, nn) THEN cents END)
               * max((nn - 1) % 20) AS lo_x20,
             max(CASE WHEN rn = (19 * (nn - 1)) // 20 + 1 THEN cents END)
               * (20 - max((19 * (nn - 1)) % 20))
             + max(CASE WHEN rn = least((19 * (nn - 1)) // 20 + 2, nn) THEN cents END)
               * max((19 * (nn - 1)) % 20) AS hi_x20
      FROM r GROUP BY event_type
    )
    SELECT v.event_type,
           count(*) AS n,
           CAST(sum(CASE WHEN 20 * v.cents < th.lo_x20 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clip_lo,
           CAST(sum(CASE WHEN 20 * v.cents > th.hi_x20 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clip_hi,
           CAST(sum(least(greatest(20 * v.cents, th.lo_x20), th.hi_x20))
                AS BIGINT) AS winsorized_sum_x20
    FROM v JOIN th USING (event_type)
    GROUP BY v.event_type
    """,
    doc="Winsorization audit: per event type, values clamped to the exact "
    "[p5, p95] band before summation — the tail-robust cleaning step "
    "upstream of any mean-based metric. Percentiles are the exact "
    "two-order-statistic interpolation scaled x20 (q_percentiles / "
    "q_corpus_datacard idiom), the clamp compares 20*cents against the "
    "x20 thresholds, and the winsorized sum stays in the x20 scale — "
    "every comparison and sum is integer-exact, so boundary values "
    "clip identically in both engines. Thresholds come from histogram-"
    "prune rank selection (operators/rankselect.py — no per-type total "
    "sort over the fact rows) + a 5-row broadcast.",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.operators.rankselect import grouped_rank_values

    e = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    # thresholds via histogram-prune rank selection (operators/rankselect.py)
    # instead of a per-type total sort — same exact order statistics, no
    # low-cardinality-key window over the fact rows.
    rv = grouped_rank_values(
        e,
        "event_type",
        "cents",
        {
            "lo_l": "(nn - 1) div 20 + 1",
            "lo_h": "least((nn - 1) div 20 + 2, nn)",
            "hi_l": "(19 * (nn - 1)) div 20 + 1",
            "hi_h": "least((19 * (nn - 1)) div 20 + 2, nn)",
        },
    )
    f1 = F.expr("(nn - 1) % 20")
    f19 = F.expr("(19 * (nn - 1)) % 20")
    th = rv.select(
        "event_type",
        (F.col("lo_l") * (20 - f1) + F.col("lo_h") * f1).alias("lo_x20"),
        (F.col("hi_l") * (20 - f19) + F.col("hi_h") * f19).alias("hi_x20"),
    )
    j = e.join(F.broadcast(th), "event_type")
    v20 = 20 * F.col("cents")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(v20 < F.col("lo_x20"), 1).otherwise(0)).alias("n_clip_lo"),
        F.sum(F.when(v20 > F.col("hi_x20"), 1).otherwise(0)).alias("n_clip_hi"),
        F.sum(F.least(F.greatest(v20, F.col("lo_x20")), F.col("hi_x20"))).alias(
            "winsorized_sum_x20"
        ),
    )


@query(
    "q_association_rules",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    nu AS (SELECT count(DISTINCT user_id) AS n_users FROM ut),
    na AS (SELECT event_type, count(*) AS n FROM ut GROUP BY event_type),
    pair AS (
      SELECT a.event_type AS ea, b.event_type AS eb, count(*) AS n_ab
      FROM ut a JOIN ut b ON b.user_id = a.user_id
       AND b.event_type != a.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT p.ea, p.eb, x.n AS n_a, y.n AS n_b, p.n_ab, nu.n_users,
           (2000000 * p.n_ab + x.n) // (2 * x.n) AS conf_e6,
           CAST((2 * 1000000 * p.n_ab * nu.n_users + x.n * y.n)
                // (2 * x.n * y.n) AS BIGINT) AS lift_e6
    FROM pair p
    JOIN na x ON x.event_type = p.ea
    JOIN na y ON y.event_type = p.eb
    CROSS JOIN nu
    """,
    doc="Association rules over per-user event-type baskets: for each "
    "directed pair (A -> B), support counts, confidence P(B|A) and lift "
    "P(AB)/(P(A)P(B)) as exact round-half-up e6 integers — the 1-level "
    "Apriori market-basket pass. The per-user distinct-type basket is "
    "one dedup shuffle; co-occurrence is a self-join keyed on user (the "
    "basket join never leaves the user key, so fanout is basket-size "
    "squared per user, bounded by the type-cardinality, not by event "
    "volume); the type-level count tables are broadcast-sized. The "
    "integer lift stays in int64 up to ~1e6*n_ab*n_users = 9e18 — "
    "switch the two ratio columns to doubles beyond ~millions of users "
    "(counts themselves never overflow).",
)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    nu = ut.agg(F.countDistinct("user_id").alias("n_users"))
    na = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("ea"))
    b = ut.select("user_id", F.col("event_type").alias("eb"))
    pair = (
        a.join(b, "user_id")
        .filter(F.col("eb") != F.col("ea"))
        .groupBy("ea", "eb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    return (
        pair.join(
            F.broadcast(na.select(F.col("event_type").alias("ea"), F.col("n").alias("n_a"))),
            "ea",
        )
        .join(
            F.broadcast(na.select(F.col("event_type").alias("eb"), F.col("n").alias("n_b"))),
            "eb",
        )
        .crossJoin(F.broadcast(nu))
        .select(
            "ea",
            "eb",
            "n_a",
            "n_b",
            "n_ab",
            "n_users",
            F.expr("(2000000 * n_ab + n_a) div (2 * n_a)").alias("conf_e6"),
            F.expr(
                "CAST((2 * 1000000 * n_ab * n_users + n_a * n_b)"
                " div (2 * n_a * n_b) AS BIGINT)"
            ).alias("lift_e6"),
        )
    )


@query(
    "q_expectations",
    oracle="""
    SELECT 'orders' AS tbl, e.expectation,
           CAST(e.violations AS BIGINT) AS violations,
           CAST(e.checked AS BIGINT) AS checked
    FROM (
      SELECT
        count(*) AS n,
        sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS null_key,
        count(*) - count(DISTINCT o_orderkey) AS dup_key,
        sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nonpos_price,
        sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
          AS bad_status,
        sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                  OR o_orderdate > TIMESTAMP '2030-01-01' THEN 1 ELSE 0 END)
          AS bad_date
      FROM orders
    ) s, LATERAL (VALUES
      ('orderkey_not_null', s.null_key, s.n),
      ('orderkey_unique', s.dup_key, s.n),
      ('totalprice_positive', s.nonpos_price, s.n),
      ('status_in_domain', s.bad_status, s.n),
      ('orderdate_in_range', s.bad_date, s.n)
    ) AS e(expectation, violations, checked)
    """,
    doc="Declarative data-quality expectations (the dbt-test / Deequ "
    "pattern): not-null, uniqueness, positivity, domain and range checks "
    "over orders, each emitted as (expectation, violations, checked). "
    "ALL checks share ONE scan and one aggregation — the violation "
    "counters are conditional aggregates computed together, then "
    "unpivoted into report rows (a naive one-query-per-check framework "
    "scans the table k times). Uniqueness uses count(*) - count(distinct "
    "key), the only check needing a shuffle; everything else is map-side. "
    "Gate a pipeline by asserting violations = 0 over this DataFrame.",
)
def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    s = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("null_key"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_key"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("nonpos_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("bad_status"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
                | (F.col("o_orderdate") > F.lit("2030-01-01").cast("timestamp")),
                1,
            ).otherwise(0)
        ).alias("bad_date"),
    )
    checks = [
        ("orderkey_not_null", "null_key"),
        ("orderkey_unique", "dup_key"),
        ("totalprice_positive", "nonpos_price"),
        ("status_in_domain", "bad_status"),
        ("orderdate_in_range", "bad_date"),
    ]
    report = F.array(
        *[
            F.struct(
                F.lit(name).alias("expectation"),
                F.col(col).cast("long").alias("violations"),
                F.col("n").cast("long").alias("checked"),
            )
            for name, col in checks
        ]
    )
    return (
        s.select(F.explode(report).alias("e"))
        .select(
            F.lit("orders").alias("tbl"),
            "e.expectation",
            "e.violations",
            "e.checked",
        )
    )


@query(
    "q_decile_binning_scalable",
    # Same oracle as q_decile_binning: identical bins, scalable rank.
    oracle=f"""
    WITH b AS (
      SELECT c_mktsegment,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
             ntile({N_DECILES}) OVER (PARTITION BY c_mktsegment
                                      ORDER BY round(c_acctbal * 100), c_custkey)
               AS decile
      FROM customer
    )
    SELECT c_mktsegment, CAST(decile AS BIGINT) AS decile,
           count(*) AS n_custs,
           min(cents) AS min_cents, max(cents) AS max_cents,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM b GROUP BY c_mktsegment, decile
    """,
    doc="Equi-depth decile binning WITHOUT the per-segment total sort: "
    "ntile is a pure function of (rank, n) — with q = n div k and "
    "r = n mod k, ranks up to r*(q+1) fall in the first r (larger) "
    "buckets and the rest split by q — so grouped_global_rank's "
    "two-phase rank (parallel (key, value-bucket) windows + metadata "
    "prefix shift) replaces the ANSI window entirely. Identical bins to "
    "q_decile_binning, hash-checked against the same oracle. Completes "
    "the scalable-twin trifecta: rank SELECTION (percentiles), FULL rank "
    "(LPT dealing), and ntile all derive from the same two-phase "
    "pattern.",
)
def q_decile_binning_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.operators.rankselect import grouped_global_rank

    c = load(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_custkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
    )
    ranked = grouped_global_rank(
        c, "c_mktsegment", "cents", "c_custkey",
        descending=False, bucket_width=4096, with_count=True,
    )
    with_n = ranked.withColumnRenamed("nn", "n")
    k = N_DECILES
    decile = F.expr(
        f"CASE WHEN rank <= (n % {k}) * (n div {k} + 1)"
        f" THEN (rank - 1) div (n div {k} + 1) + 1"
        f" ELSE (n % {k}) + (rank - (n % {k}) * (n div {k} + 1) - 1) div (n div {k}) + 1 END"
    )
    b = with_n.select("c_mktsegment", "cents", decile.cast("long").alias("decile"))
    return b.groupBy("c_mktsegment", "decile").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
        F.sum("cents").alias("sum_cents"),
    )


@query(
    "q_mode_per_group",
    oracle="""
    WITH vc AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY cnt DESC, cents) AS rn
      FROM vc
    )
    SELECT event_type, cents AS mode_cents, cnt AS mode_count
    FROM r WHERE rn = 1
    """,
    doc="Exact grouped mode (most frequent value, smallest-value tiebreak): "
    "fact rows collapse to (key, value) counts through partial "
    "aggregation FIRST — the ranking window then runs over the distinct-"
    "value table (bounded by value cardinality), never over raw rows. "
    "The descriptive statistic the mean/median/percentile family was "
    "missing.",
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    vc = e.groupBy("event_type", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(F.col("cnt").desc(), "cents")
    return (
        vc.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("cents").alias("mode_cents"),
            F.col("cnt").alias("mode_count"),
        )
    )


@query(
    "q_gini_revenue",
    oracle="""
    WITH x AS (
      SELECT o_orderpriority AS priority, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    r AS (
      SELECT priority, cents,
             row_number() OVER (PARTITION BY priority
                                ORDER BY cents, o_orderkey) AS rk
      FROM x
    )
    SELECT priority, count(*) AS n,
           CAST(2 * sum(rk * cents) - (count(*) + 1) * sum(cents) AS BIGINT)
             AS gini_num,
           CAST(count(*) * sum(cents) AS BIGINT) AS gini_den
    FROM r GROUP BY priority
    """,
    doc="Gini concentration of order value per priority as the exact "
    "rational (num, den): G = (2*sum(rank*x) - (n+1)*sum(x)) / (n*sum(x)) "
    "over ascending-ranked cents — the inequality audit behind revenue-"
    "concentration and data-contribution analyses, no division or float "
    "ever. Ranks come from operators/rankselect.py grouped_global_rank "
    "(parallel value-bucket windows + metadata prefix shift), NOT a "
    "per-priority total sort. sum(rank*x) stays in int64 through "
    "~n^2*x = 9e18 — beyond ~1e6 rows/group at these cent magnitudes, "
    "switch the ratio to double (the counts never overflow).",
)
def q_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.operators.rankselect import grouped_global_rank

    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    ranked = grouped_global_rank(
        o, "priority", "cents", "o_orderkey", descending=False, bucket_width=65536
    )
    return ranked.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n"),
        (
            2 * F.sum(F.col("rank") * F.col("cents"))
            - (F.count(F.lit(1)) + 1) * F.sum("cents")
        ).alias("gini_num"),
        (F.count(F.lit(1)) * F.sum("cents")).alias("gini_den"),
    )


@query(
    "q_changepoint_cusum",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS priority, date_trunc('day', o_orderdate) AS day,
             (2 * sum(CAST(round(o_totalprice) AS BIGINT)) + count(*))
               // (2 * count(*)) AS y
      FROM orders GROUP BY 1, 2
    ),
    st AS (
      SELECT priority, count(*) AS n, CAST(sum(y) AS BIGINT) AS s FROM daily
      GROUP BY priority
    ),
    cum AS (
      SELECT d.priority, d.day, st.n, st.s,
             CAST(sum(d.y) OVER (PARTITION BY d.priority ORDER BY d.day)
                  AS BIGINT) AS c,
             row_number() OVER (PARTITION BY d.priority ORDER BY d.day) AS k
      FROM daily d JOIN st ON st.priority = d.priority
    ),
    dev AS (
      SELECT priority, day, n, abs(n * c - k * s) AS d_abs
      FROM cum
    ),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY priority
                                   ORDER BY d_abs DESC, day) AS rn
      FROM dev
    )
    SELECT priority, CAST(n AS BIGINT) AS n_days,
           CAST(day AS TIMESTAMP) AS peak_day,
           CAST(d_abs AS BIGINT) AS cusum_peak
    FROM best WHERE rn = 1
    """,
    doc="CUSUM changepoint detection over the daily MEAN order value "
    "(whole dollars, round-half-up via the portability-exact (2s+n) div "
    "(2n) form — the same volume-independent series as q_autocorr_lag1): "
    "the day where the cumulative deviation from the overall level peaks "
    "— |n*cum_k - k*S| maximized (the integer-cleared form of |prefix "
    "mean - global mean| weighted by k; no division) — the textbook "
    "level-shift locator for monitoring pipelines, which is defined on a "
    "mean-level statistic anyway. The series choice is the int64 answer "
    "(round 11, same audit that fixed q_autocorr_lag1): with a daily-"
    "TOTAL series the n*cum_k product scales with row volume (~5.3e15 at "
    "sf0.1, overflowing near sf200); with the daily mean it is bounded "
    "by days^2 x the price domain (~3.5e12 for a decade of days) at ANY "
    "corpus volume. All windows run over the DAILY aggregate (metadata-"
    "sized after the one partial-agg shuffle), never raw orders; ties "
    "break to the earliest day.",
)
def q_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    daily = (
        o.select(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("day", F.col("o_orderdate")).alias("day"),
            F.round(F.col("o_totalprice"), 0).cast("long").alias("dollars"),
        )
        .groupBy("priority", "day")
        .agg(F.expr("(2 * sum(dollars) + count(*)) div (2 * count(*))").alias("y"))
    )
    st = daily.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    wd = Window.partitionBy("priority").orderBy("day")
    cum = daily.join(F.broadcast(st), "priority").select(
        "priority",
        "day",
        "n",
        F.sum("y").over(wd).alias("c"),
        F.row_number().over(wd).alias("k"),
        "s",
    )
    dev = cum.select(
        "priority", "day", "n", F.abs(F.col("n") * F.col("c") - F.col("k") * F.col("s")).alias("d_abs")
    )
    wb = Window.partitionBy("priority").orderBy(F.col("d_abs").desc(), "day")
    return (
        dev.select("*", F.row_number().over(wb).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            "priority",
            F.col("n").cast("long").alias("n_days"),
            F.col("day").alias("peak_day"),
            F.col("d_abs").cast("long").alias("cusum_peak"),
        )
    )


@query(
    "q_autocorr_lag1",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS priority, date_trunc('day', o_orderdate) AS day,
             (2 * sum(CAST(round(o_totalprice) AS BIGINT)) + count(*))
               // (2 * count(*)) AS y
      FROM orders GROUP BY 1, 2
    ),
    st AS (
      SELECT priority, count(*) AS n, CAST(sum(y) AS BIGINT) AS s FROM daily
      GROUP BY priority
    ),
    dev AS (
      SELECT d.priority, d.day,
             d.y - (2 * st.s + st.n) // (2 * st.n) AS dv
      FROM daily d JOIN st ON st.priority = d.priority
    ),
    paired AS (
      SELECT priority, dv,
             lead(dv) OVER (PARTITION BY priority ORDER BY day) AS dv1
      FROM dev
    )
    SELECT priority, count(*) AS n_days,
           CAST(sum(dv * dv1) AS BIGINT) AS r1_num,
           CAST(sum(dv * dv) AS BIGINT) AS r1_den
    FROM paired GROUP BY priority
    """,
    doc="Lag-1 autocorrelation of the daily MEAN order value (whole "
    "dollars, round-half-up — both levels of rounding are the "
    "portability-exact (2s+n) div (2n) form) as the exact rational "
    "(r1_num, r1_den), deviations paired with the next day's via "
    "lead(). Positive r1 = momentum, negative = mean reversion — the "
    "stationarity screen before any forecasting job. The SERIES CHOICE "
    "is the int64-overflow answer (round 11): a daily-TOTAL series "
    "scales with row volume, so sum(dv^2) ~ SF^2 x days blows past "
    "int64 at sf0.1 (measured: the r7 form crashed the 10x window "
    "sweep); the daily mean is volume-independent (bounded by the "
    "price domain, ~6e5 dollars), leaving ~1e4 headroom in days x "
    "dv^2 at ANY corpus volume — and since r1 is invariant to linear "
    "scaling of the series, the statistic's meaning survives the "
    "switch. Daily aggregate first; every window runs over the "
    "metadata-sized day table. Null-lead tail rows drop from the "
    "numerator only, matching the standard sum over n-1 pairs.",
)
def q_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    daily = (
        o.select(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("day", F.col("o_orderdate")).alias("day"),
            F.round(F.col("o_totalprice"), 0).cast("long").alias("dollars"),
        )
        .groupBy("priority", "day")
        .agg(F.expr("(2 * sum(dollars) + count(*)) div (2 * count(*))").alias("y"))
    )
    st = daily.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    dev = daily.join(F.broadcast(st), "priority").select(
        "priority", "day", (F.col("y") - F.expr("(2 * s + n) div (2 * n)")).alias("dv")
    )
    wd = Window.partitionBy("priority").orderBy("day")
    paired = dev.select("priority", "dv", F.lead("dv").over(wd).alias("dv1"))
    return paired.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("dv") * F.col("dv1")).alias("r1_num"),
        F.sum(F.col("dv") * F.col("dv")).alias("r1_den"),
    )


@query(
    "q_dow_profile",
    oracle="""
    SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY event_type, isodow(ts)
    """,
    doc="Day-of-week seasonality profile per event type (ISO weekday, "
    "1=Monday — Spark's weekday()+1 matches DuckDB's isodow exactly; the "
    "engines' default dayofweek() numbering DISAGREES, Sunday-1 vs "
    "Sunday-0, which this sidesteps). One partial-agg shuffle on "
    "(type, dow) — 35 groups regardless of volume.",
)
def q_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            (F.weekday("ts") + 1).cast("long").alias("dow"),
            F.round(F.col("value") * 100, 0).cast("long").alias("c"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("cents"))
    )


SKEW_TOPK = 10


@query(
    "q_skew_report",
    oracle=f"""
    WITH kc AS (
      SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
    ),
    st AS (
      SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total,
             CAST(max(cnt) AS BIGINT) AS max_cnt
      FROM kc
    )
    SELECT kc.o_custkey, kc.cnt, st.n_keys, st.total,
           (2000 * st.max_cnt * st.n_keys + st.total) // (2 * st.total)
             AS skew_x1000
    FROM kc, st
    ORDER BY kc.cnt DESC, kc.o_custkey
    LIMIT {SKEW_TOPK}
    """,
    doc="Join-key skew diagnosis: the top heaviest custkeys with the "
    "hot-key skew factor max_count/mean_count as a round-half-up x1000 "
    "integer — the report an engineer reads BEFORE reaching for "
    "operators/skew.py salting or AQE skew-join thresholds. One "
    "partial-agg shuffle to per-key counts, a 1-row broadcast of the "
    "corpus stats, TakeOrderedAndProject for the top-k (never a global "
    "sort).",
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_custkey")
    kc = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    st = kc.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("max_cnt"),
    )
    return (
        kc.crossJoin(F.broadcast(st))
        .select(
            "o_custkey",
            "cnt",
            "n_keys",
            "total",
            F.expr(
                "(2000 * max_cnt * n_keys + total) div (2 * total)"
            ).alias("skew_x1000"),
        )
        .orderBy(F.col("cnt").desc(), "o_custkey")
        .limit(SKEW_TOPK)
    )


N_HIST_BINS = 10


@query(
    "q_histogram_equiwidth",
    oracle=f"""
    WITH v AS (
      SELECT o_orderpriority AS priority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    ext AS (
      SELECT priority, min(cents) AS lo, max(cents) AS hi FROM v
      GROUP BY priority
    ),
    binned AS (
      SELECT v.priority,
             least((v.cents - e.lo) * {N_HIST_BINS} // (e.hi - e.lo + 1),
                   {N_HIST_BINS} - 1) AS bin,
             e.lo, e.hi, v.cents
      FROM v JOIN ext e ON e.priority = v.priority
    )
    SELECT priority, CAST(bin AS BIGINT) AS bin, count(*) AS n,
           CAST(min(cents) AS BIGINT) AS bin_min,
           CAST(max(cents) AS BIGINT) AS bin_max
    FROM binned GROUP BY priority, bin
    """,
    doc=f"Equi-width {N_HIST_BINS}-bin value histogram per group with "
    "data-derived edges: bin = (v - lo) * k / (hi - lo + 1) in pure "
    "integer arithmetic (the +1 keeps the max value inside the last bin "
    "without a float epsilon; both operands non-negative so truncating "
    "and flooring division agree). Completes the profiling family next "
    "to the log2 histogram, deciles, and mode. Per-group extents are a "
    "5-row broadcast; one partial-agg shuffle bins the corpus.",
)
def q_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    ext = o.groupBy("priority").agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    binned = o.join(F.broadcast(ext), "priority").select(
        "priority",
        "cents",
        F.least(
            F.expr(f"(cents - lo) * {N_HIST_BINS} div (hi - lo + 1)"),
            F.lit(N_HIST_BINS - 1).cast("long"),
        ).alias("bin"),
    )
    return binned.groupBy("priority", "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cents").alias("bin_min"),
        F.max("cents").alias("bin_max"),
    )


@query(
    "q_lorenz_deciles",
    oracle=f"""
    WITH x AS (
      SELECT o_orderpriority AS priority, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    r AS (
      SELECT priority, cents,
             row_number() OVER (PARTITION BY priority
                                ORDER BY cents, o_orderkey) AS rk,
             count(*) OVER (PARTITION BY priority) AS n
      FROM x
    ),
    b AS (
      SELECT priority, cents,
             CASE WHEN rk <= (n % {N_DECILES}) * (n // {N_DECILES} + 1)
                  THEN (rk - 1) // (n // {N_DECILES} + 1) + 1
                  ELSE (n % {N_DECILES})
                       + (rk - (n % {N_DECILES}) * (n // {N_DECILES} + 1) - 1)
                         // (n // {N_DECILES}) + 1 END AS decile
      FROM r
    ),
    d AS (
      SELECT priority, CAST(decile AS BIGINT) AS decile,
             CAST(sum(cents) AS BIGINT) AS decile_cents, count(*) AS n_orders
      FROM b GROUP BY priority, decile
    ),
    t AS (SELECT priority, CAST(sum(decile_cents) AS BIGINT) AS total FROM d
          GROUP BY priority)
    SELECT d.priority, d.decile, d.n_orders, d.decile_cents,
           (2000000 * d.decile_cents + t.total) // (2 * t.total) AS share_e6,
           CAST((2000000 * sum(d.decile_cents) OVER (PARTITION BY d.priority
                    ORDER BY d.decile) + t.total) // (2 * t.total) AS BIGINT)
             AS cum_share_e6
    FROM d JOIN t ON t.priority = d.priority
    """,
    doc="Lorenz curve by value decile: each priority's orders split into "
    "equal-count deciles of ascending value (the ntile-from-rank formula "
    "over the scalable grouped rank, all divisions integer // / div), "
    "emitting each decile's revenue share and cumulative share as "
    "round-half-up e6 integers — the inequality curve q_gini_revenue "
    "summarizes, decile by decile. Heavy ranks come from "
    "operators/rankselect.py; the share windows run over 10 rows per "
    "group.",
)
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.operators.rankselect import grouped_global_rank

    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    ranked = grouped_global_rank(
        o, "priority", "cents", "o_orderkey",
        descending=False, bucket_width=65536, with_count=True,
    )
    with_n = ranked.withColumnRenamed("nn", "n")
    k = N_DECILES
    decile = F.expr(
        f"CASE WHEN rank <= (n % {k}) * (n div {k} + 1)"
        f" THEN (rank - 1) div (n div {k} + 1) + 1"
        f" ELSE (n % {k}) + (rank - (n % {k}) * (n div {k} + 1) - 1) div (n div {k}) + 1 END"
    )
    d = (
        with_n.select("priority", "cents", decile.cast("long").alias("decile"))
        .groupBy("priority", "decile")
        .agg(F.sum("cents").alias("decile_cents"), F.count(F.lit(1)).alias("n_orders"))
    )
    t = d.groupBy("priority").agg(F.sum("decile_cents").alias("total"))
    wd = Window.partitionBy("priority").orderBy("decile")
    j = d.join(F.broadcast(t), "priority")
    return j.select(
        "priority",
        "decile",
        "n_orders",
        "decile_cents",
        F.expr("(2000000 * decile_cents + total) div (2 * total)").alias("share_e6"),
        F.expr(
            "CAST((2000000 * sum(decile_cents) OVER (PARTITION BY priority ORDER BY decile)"
            " + total) div (2 * total) AS BIGINT)"
        ).alias("cum_share_e6"),
    )


@query(
    "q_percentile_rank_transform",
    oracle="""
    WITH v AS (
      SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    r AS (
      SELECT event_id, event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents, event_id) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM v
    )
    SELECT event_id, event_type, cents,
           CAST((2000000 * (rk - 1) + (n - 1)) // (2 * (n - 1)) AS BIGINT)
             AS pct_e6
    FROM r WHERE n > 1
    """,
    doc="Percentile-rank transform (quantile normalization): every value "
    "maps to its within-group rank position (rk-1)/(n-1) as a round-half-"
    "up e6 integer — the monotone, outlier-immune feature transform "
    "behind quantile-normalized model inputs. Ranks come from "
    "operators/rankselect.py grouped_global_rank (parallel value-bucket "
    "windows + metadata prefix shift — NOT a per-type total sort); ties "
    "break by event_id so the map is a bijection on both engines. "
    "Single-row groups drop (the transform is undefined at n=1).",
)
def q_percentile_rank_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.operators.rankselect import grouped_global_rank

    e = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    ranked = grouped_global_rank(
        e, "event_type", "cents", "event_id",
        descending=False, bucket_width=65536, with_count=True,
    )
    return (
        ranked.withColumnRenamed("nn", "n")
        .filter(F.col("n") > 1)
        .select(
            "event_id",
            "event_type",
            "cents",
            F.expr(
                "CAST((2000000 * (rank - 1) + (n - 1)) div (2 * (n - 1)) AS BIGINT)"
            ).alias("pct_e6"),
        )
    )


@query(
    "q_benford_audit",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority AS priority,
             CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    )
    SELECT priority, digit, count(*) AS n
    FROM d GROUP BY priority, digit
    """,
    doc="Benford first-digit audit: leading-digit counts of order amounts "
    "per priority — the classic fabricated-numbers screen (natural "
    "multiplicative amounts follow log10(1+1/d); uniform or spiked "
    "digits flag synthetic or manipulated data). The digit extracts via "
    "string head of the integer cents (pure integer->string, no "
    "log/pow), one partial-agg shuffle over 45 groups. Callers compare "
    "the counts against the Benford expectation downstream.",
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"), 1, 1
    ).cast("long")
    return (
        o.select(F.col("o_orderpriority").alias("priority"), digit.alias("digit"))
        .groupBy("priority", "digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )

_RT_AUDIT_ORACLE = """
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT)
             AS text_md5_sum
    FROM documents GROUP BY source
"""


def _rt_audit(df: DataFrame) -> DataFrame:
    return df.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(
            F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast("long")
        ).alias("text_md5_sum"),
    )


@query(
    "q_jsonl_roundtrip",
    oracle=_RT_AUDIT_ORACLE,
    doc="JSON-lines sink + source round trip: documents write to JSONL "
    "(executor-parallel, one file per partition) and read back with an "
    "explicit schema; the per-source audit (counts, chars, md5-prefix "
    "content checksum) must hash-match the oracle computed from the "
    "ORIGINAL parquet — i.e. the round trip is proven lossless, not "
    "assumed. Schema-on-read is explicit (inference is a second full "
    "scan AND a nondeterminism source); content equality rides on the "
    "md5 sum, so an escaping bug in either direction flips the hash.",
)
def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.scratch import scratch_dir

    d = load(spark, sf_dir, "documents")
    path = scratch_dir("jsonl_rt") + "/docs"
    d.write.mode("overwrite").json(path)
    back = spark.read.schema(d.schema).json(path)
    return _rt_audit(back)


@query(
    "q_csv_roundtrip",
    oracle=_RT_AUDIT_ORACLE,
    doc="CSV sink + source round trip with full quoting/escaping (header, "
    "explicit schema on read — never inferSchema): same lossless-or-"
    "hash-fail audit as q_jsonl_roundtrip. multiLine keeps quoted "
    "embedded newlines inside one record; the \\\\N null sentinel plus "
    "emptyValue pins on both sides disambiguate NULL from '' (Spark's "
    "CSV defaults read both back as NULL, silently dropping md5 terms "
    "from the checksum). Round trip is lossless for newlines, empties, "
    "quotes, commas and NULLs — the one residual CSV ambiguity is a text "
    "cell literally equal to the sentinel (nullValue matches post-"
    "unquote), absent from this corpus; use JSONL/parquet when even that "
    "must survive. Scale note: multiLine CSV files are not splittable — "
    "an inherent cost of the format, so parallelism comes from file "
    "count, which the executor-parallel write already provides. "
    "Completes the connector matrix: parquet (store), JSONL, CSV, DuckDB "
    "export (unit), HTML sink, HTTP source, plus the streaming "
    "source/sinks.",
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.scratch import scratch_dir

    d = load(spark, sf_dir, "documents")
    path = scratch_dir("csv_rt") + "/docs"
    (
        d.write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')
        .option("nullValue", "\\N")
        .option("emptyValue", '""')
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
    )
    back = (
        spark.read.schema(d.schema)
        .option("header", "true")
        .option("escape", '"')
        .option("multiLine", "true")
        .option("nullValue", "\\N")
        .option("emptyValue", "")
        .csv(path)
    )
    return _rt_audit(back)


@query(
    "q_orc_roundtrip",
    oracle=_RT_AUDIT_ORACLE,
    doc="ORC sink + source round trip (Spark's native ORC reader/writer — "
    "the other columnar interchange format a warehouse migration meets "
    "beside parquet): same lossless-or-hash-fail audit as "
    "q_jsonl_roundtrip. Columnar-to-columnar, so unlike CSV/JSONL there "
    "is no escaping surface — the audit instead proves type fidelity "
    "(long/string round-trip bit-exact) and that predicate-capable ORC "
    "stripes come back splittable and complete. Extends the connector "
    "matrix: parquet (store), ORC, JSONL, CSV, DuckDB + SQLite exports, "
    "HTML sink, HTTP source, streaming source/sinks.",
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.scratch import scratch_dir

    d = load(spark, sf_dir, "documents")
    path = scratch_dir("orc_rt") + "/docs"
    d.write.mode("overwrite").orc(path)
    back = spark.read.schema(d.schema).orc(path)
    return _rt_audit(back)


@query(
    "q_wow_growth",
    oracle="""
    WITH weekly AS (
      SELECT o_orderpriority AS priority, date_trunc('week', o_orderdate) AS wk,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1, 2
    ),
    p AS (
      SELECT priority, CAST(wk AS TIMESTAMP) AS wk, y,
             lag(y) OVER (PARTITION BY priority ORDER BY wk) AS prev
      FROM weekly
    )
    SELECT priority, wk, y AS cents, prev AS prev_cents,
           CAST(y - prev AS BIGINT) AS growth_num,
           prev AS growth_den
    FROM p WHERE prev IS NOT NULL
    """,
    doc="Week-over-week revenue growth per priority as the exact rational "
    "(growth_num, growth_den) = (this - prev, prev) — the KPI delta "
    "emitted without division so no rounding policy is baked in. "
    "date_trunc('week') is ISO-Monday-anchored in BOTH engines (unlike "
    "dayofweek numbering, which diverges — see q_dow_profile). All "
    "windows run over the metadata-sized weekly table after one "
    "partial-agg shuffle.",
)
def q_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    weekly = (
        o.select(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("week", F.col("o_orderdate")).alias("wk"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("priority", "wk")
        .agg(F.sum("cents").alias("y"))
    )
    w = Window.partitionBy("priority").orderBy("wk")
    p = weekly.select("priority", "wk", "y", F.lag("y").over(w).alias("prev"))
    return p.filter(F.col("prev").isNotNull()).select(
        "priority",
        "wk",
        F.col("y").alias("cents"),
        F.col("prev").alias("prev_cents"),
        (F.col("y") - F.col("prev")).cast("long").alias("growth_num"),
        F.col("prev").alias("growth_den"),
    )


# box aligned to a user-id nibble (4..7 shares the two high user bits, so
# the Morton curve keeps it contiguous): measured 5/16 files touched at
# sf0.001 and 3/16 at sf0.01 vs 16/16 for any day-bounded box on a
# user-sorted layout
ZBOX_USER_LO, ZBOX_USER_HI = 4, 7
ZBOX_DAY_LO, ZBOX_DAY_HI = 19740, 19744  # 2024-01-18 .. 2024-01-22 (days since epoch)
ZBOX_FILES = 16


@query(
    "q_zorder_box",
    oracle=f"""
    WITH e AS (
      SELECT event_type, user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT event_type, count(*) AS n,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           count(DISTINCT user_id) AS n_users
    FROM e
    WHERE user_id BETWEEN {ZBOX_USER_LO} AND {ZBOX_USER_HI}
      AND day BETWEEN {ZBOX_DAY_LO} AND {ZBOX_DAY_HI}
    GROUP BY event_type
    """,
    doc="2-D box query against a Z-ORDERED layout (sources/zorder.py): "
    f"events are written along the Morton curve of (user_id, day) into "
    f"{ZBOX_FILES} range-partitioned files, then a (user, day-window) box "
    "is answered from the laid-out table. The oracle computes the same "
    "box from the ORIGINAL events, so the layout round trip is value-"
    "hash-checked, and tests/test_zorder.py::test_zorder_box_query_skips_"
    "files asserts from parquet FOOTERS that the registered box touches "
    "a strict minority of the files (a 1-D user-sorted layout matches "
    "every file for any day-bounded box, since each file spans all days). "
    "This is the layout trick behind Delta OPTIMIZE ZORDER BY / Iceberg "
    "sort orders: at 100 TB the write is a one-time repartitionByRange on "
    "the Morton value (pure unrolled JVM bit math, no UDF) and every "
    "later 2-D scan prunes by footer min/max instead of reading the "
    "corpus.",
)
def q_zorder_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.scratch import scratch_dir

    from hnarchive_spark.sources.zorder import write_zordered

    e = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    path = scratch_dir("zorder_box") + "/events_z"
    write_zordered(e, path, "user_id", "day", ZBOX_FILES)
    z = spark.read.parquet(path)
    return (
        z.filter(
            F.col("user_id").between(ZBOX_USER_LO, ZBOX_USER_HI)
            & F.col("day").between(ZBOX_DAY_LO, ZBOX_DAY_HI)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


ROLLING_DAYS = 7


@query(
    "q_rolling_active_users",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM pairs),
    rolled AS (
      SELECT d.day, p.user_id
      FROM days d JOIN pairs p
        ON p.day <= d.day AND p.day > d.day - {ROLLING_DAYS}
      GROUP BY d.day, p.user_id
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           count(*) AS active_users_{ROLLING_DAYS}d
    FROM rolled GROUP BY day
    """,
    doc=f"Rolling {ROLLING_DAYS}-day active users per day (the DAU/WAU "
    "family): COUNT DISTINCT over a sliding window is not window-function-"
    "expressible, and the naive per-day re-scan reads the corpus once per "
    "day. Scalable shape: events collapse FIRST to distinct (user, day) "
    "pairs (one partial-agg shuffle — the only pass over fact rows), then "
    f"each pair explodes to the <= {ROLLING_DAYS} days it covers and a "
    "second distinct+count runs on the pair table (users x days rows, "
    "metadata-sized relative to events; the explode factor is the window "
    "length, applied AFTER the collapse). The oracle computes the same "
    "windows by range join over the distinct pairs.",
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    pairs = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    days = pairs.select("day").distinct()
    covered = pairs.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"), F.date_add(F.col("day"), ROLLING_DAYS - 1)
            )
        ).alias("day"),
    ).join(F.broadcast(days), "day", "left_semi")
    return (
        covered.distinct()
        .groupBy(F.col("day").cast("timestamp").alias("day"))
        .agg(F.count(F.lit(1)).alias(f"active_users_{ROLLING_DAYS}d"))
    )


@query(
    "q_corr_rational",
    oracle="""
    WITH x AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS v,
             CAST(date_part('hour', ts) AS BIGINT) AS h
      FROM events
    )
    SELECT event_type, count(*) AS n,
           CAST(count(*) * sum(v * h) - sum(v) * sum(h) AS BIGINT) AS corr_num,
           CAST(count(*) * sum(v * v) - sum(v) * sum(v) AS BIGINT) AS var_v_n2,
           CAST(count(*) * sum(h * h) - sum(h) * sum(h) AS BIGINT) AS var_h_n2
    FROM x GROUP BY event_type
    """,
    doc="Pearson correlation pieces per event type as EXACT integers: "
    "corr = corr_num / sqrt(var_v_n2 * var_h_n2) with corr_num = "
    "n*Sxy - Sx*Sy and the two n^2-scaled variances — the feature-"
    "correlation audit (does value correlate with hour-of-day?) emitted "
    "without sqrt or division, so the hash is engine-exact and the "
    "caller picks the final float precision. One partial-agg shuffle; "
    "every sum is a BIGINT over cents x hour products. Overflow bound: "
    "n * sum(v^2) <= n^2 * max_cents^2 — exact through ~3e4 rows/group "
    "at 1e5-cent values in int64; past that, compute per-partition "
    "partial rationals or switch to double Welford (the audit then "
    "tolerates float).",
)
def q_corr_rational(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    x = e.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
        F.hour("ts").cast("long").alias("h"),
    )
    n = F.count(F.lit(1))
    return x.groupBy("event_type").agg(
        n.alias("n"),
        (n * F.sum(F.col("v") * F.col("h")) - F.sum("v") * F.sum("h"))
        .cast("long")
        .alias("corr_num"),
        (n * F.sum(F.col("v") * F.col("v")) - F.sum("v") * F.sum("v"))
        .cast("long")
        .alias("var_v_n2"),
        (n * F.sum(F.col("h") * F.col("h")) - F.sum("h") * F.sum("h"))
        .cast("long")
        .alias("var_h_n2"),
    )


@query(
    "q_schema_evolution",
    oracle="""
    WITH v AS (
      SELECT event_id, user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_id % 2 = 1
                  THEN 'ch' || CAST(user_id % 3 AS VARCHAR) END AS channel
      FROM events
    )
    SELECT coalesce(channel, '<pre-evolution>') AS channel,
           count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents,
           min(event_id) AS min_event_id, max(event_id) AS max_event_id
    FROM v GROUP BY 1
    """,
    doc="Parquet schema evolution round trip: batch 1 lands WITHOUT the "
    "channel column (the pre-migration writer), batch 2 lands WITH it, "
    "and one mergeSchema read unions both vintages — old rows surface "
    "channel as NULL, audited per channel against an oracle computed "
    "straight from the source table (lossless-or-hash-fail, like the "
    "JSONL/CSV round trips). The additive-column migration every "
    "long-lived 100 TB table undergoes; mergeSchema's footer-union cost "
    "is per-FILE metadata, data files are never rewritten, and a "
    "production table would pin the merged schema in a catalog rather "
    "than re-deriving it per read.",
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.scratch import scratch_dir

    e = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    path = scratch_dir("schema_evo") + "/t"
    e.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(path)
    (
        e.filter(F.col("event_id") % 2 == 1)
        .withColumn(
            "channel", F.concat(F.lit("ch"), (F.col("user_id") % 3).cast("string"))
        )
        .write.mode("append").parquet(path)
    )
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return (
        back.groupBy(
            F.coalesce(F.col("channel"), F.lit("<pre-evolution>")).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
    )


FUZZY_LEV_MAX = 2


FUZZY_LBKT_WIDTH = 4  # name-length bucket width; must be > FUZZY_LEV_MAX so
# a |len diff| <= FUZZY_LEV_MAX pair is always in the same or adjacent bucket


@query(
    "q_fuzzy_match_blocked",
    # The oracle states the SEMANTICS (pairs within edit distance 2 sharing
    # brand + first name token); the Spark plan implements the scalable
    # candidate generation. The blocking is complete w.r.t. these
    # semantics: bucket width 4 > lev_max 2 guarantees any qualifying pair
    # sits in the same or an adjacent length bucket, which the probe-side
    # neighbor union covers exactly once.
    oracle=f"""
    WITH p AS (
      SELECT p_partkey, p_name, p_brand,
             string_split(p_name, ' ')[1] AS ftok
      FROM part
    )
    SELECT a.p_partkey AS p1, b.p_partkey AS p2, a.p_brand AS brand,
           a.p_name AS name_1, b.p_name AS name_2,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev
    FROM p a JOIN p b
      ON a.p_brand = b.p_brand
     AND a.ftok = b.ftok
     AND a.p_partkey < b.p_partkey
     AND abs(length(a.p_name) - length(b.p_name)) <= {FUZZY_LEV_MAX}
     AND levenshtein(a.p_name, b.p_name) <= {FUZZY_LEV_MAX}
    """,
    doc=f"Blocked fuzzy matching (entity resolution): part-name pairs "
    f"within edit distance {FUZZY_LEV_MAX}, compared ONLY inside the "
    "fine blocking key brand x name-length-bucket x first-token (the "
    "probe side unions its own and both neighbor length buckets, so "
    "every |len diff| <= 2 pair is generated exactly once), with the "
    "cheap length-difference filter ahead of the O(len^2) Levenshtein "
    "— the classic record-linkage shape (typo'd product names, "
    "near-identical author strings). Both engines' levenshtein is "
    "classical unit-cost edit distance, so the integer output hashes "
    "exactly. The equi-join key is the full composite block, so the "
    "quadratic compare is bounded per fine block (sf0.01: max block 17 "
    "vs 96 brand-only — ~32x fewer candidate compares), at the "
    "documented recall cost of requiring the first token to match "
    "exactly; a still-hot block gets the same cap treatment as the "
    "shingle/band indexes.",
)
def q_fuzzy_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_brand",
        F.split(F.col("p_name"), " ")[0].alias("ftok"),
        F.length("p_name").alias("nlen"),
        F.expr(f"length(p_name) div {FUZZY_LBKT_WIDTH}").alias("lbkt"),
    )
    # probe side emits its own + both neighbor buckets; the build side keeps
    # its single bucket, so each qualifying pair matches on exactly one key
    probe = p.withColumn(
        "blk", F.explode(F.array(F.col("lbkt") - 1, F.col("lbkt"), F.col("lbkt") + 1))
    )
    a, b = probe.alias("a"), p.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.ftok") == F.col("b.ftok"))
        & (F.col("a.blk") == F.col("b.lbkt"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey"))
        & (F.abs(F.col("a.nlen") - F.col("b.nlen")) <= FUZZY_LEV_MAX)
        & (lev <= FUZZY_LEV_MAX),
    ).select(
        F.col("a.p_partkey").alias("p1"),
        F.col("b.p_partkey").alias("p2"),
        F.col("a.p_brand").alias("brand"),
        F.col("a.p_name").alias("name_1"),
        F.col("b.p_name").alias("name_2"),
        lev.cast("long").alias("lev"),
    )


@query(
    "q_scd2_history",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    v AS (
      SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
      FROM s
    ),
    g AS (
      SELECT user_id, version, event_type AS state,
             CAST(min(epoch_us(ts)) AS BIGINT) AS valid_from_us,
             CAST(count(*) AS BIGINT) AS n_events
      FROM v GROUP BY user_id, version, event_type
    )
    SELECT user_id, version, state, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version) AS valid_to_us,
           n_events,
           lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version) IS NULL AS is_current
    FROM g
    """,
    doc="SCD2 / type-2 history build: each user's event_type stream is "
    "run-length collapsed into validity intervals (valid_from/valid_to "
    "in epoch microseconds, open-ended current row flagged) — the "
    "changelog-to-dimension transform a warehouse runs on every entity "
    "feed (cf. q_store_changelog, which emits the per-merge diff this "
    "operator accumulates). One exchange on user_id serves the "
    "change-flag window, the run aggregation, AND the interval-close "
    "window (all keyed/prefixed by user_id); ordering is total via "
    "(ts, event_id) so version numbers are bit-stable. At 100 TB this "
    "shape is incremental by construction: only users present in a new "
    "batch re-derive, everyone else's closed intervals are immutable.",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.operators.scd2 import close_intervals, scd2_runs

    e = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    return close_intervals(scd2_runs(e).drop("last_ts_us", "last_event_id"))


@query(
    "q_bucketed_join",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_c100
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="Co-located join over BUCKETED tables (sources/bucketed.py): "
    "orders and lineitem are laid out once via bucketBy(8, orderkey) + "
    "sortBy, then the fact-to-fact join runs with NO exchange under the "
    "sort-merge join — both scans arrive pre-partitioned by the catalog "
    "bucket spec (plan shows the bucketed scan; locked by "
    "tests/test_bucketed.py). The merge hint pins the sort-merge "
    "strategy so the plan demonstrates the shuffle-free fact join "
    "rather than an sf-small broadcast; at 100 TB SMJ is what the "
    "optimizer picks anyway. The write-once/join-free-forever trade is "
    "the Hive-bucketing / Iceberg bucket-transform pattern — the one "
    "layout decision that deletes the daily multi-TB join shuffle. "
    "Oracle computes the same join from the raw parquet, so the layout "
    "round trip is value-hash-checked.",
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.sources.bucketed import bucketed_pair

    name_o, name_li = bucketed_pair(spark, sf_dir)
    o = spark.table(name_o).select("o_orderkey", "o_orderpriority")
    li = spark.table(name_li)
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("price_c") * (100 - F.col("disc_pct"))).alias("revenue_c100"),
        )
    )


SCD2_SPLIT_TS = "2024-01-25 00:00:00"


@query(
    "q_scd2_incremental",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    v AS (
      SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
      FROM s
    ),
    g AS (
      SELECT user_id, version, event_type AS state,
             CAST(min(epoch_us(ts)) AS BIGINT) AS valid_from_us,
             CAST(count(*) AS BIGINT) AS n_events
      FROM v GROUP BY user_id, version, event_type
    )
    SELECT user_id, version, state, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version) AS valid_to_us,
           n_events,
           lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version) IS NULL AS is_current
    FROM g
    """,
    doc="INCREMENTAL SCD2 maintenance: the archive dimension (events "
    f"before {SCD2_SPLIT_TS}) absorbs a new batch (events after) "
    "touching only batch users — closed intervals pass through "
    "verbatim, each touched user's OPEN row is coalesced with the "
    "batch's run-length runs in one metadata-width window pass (the "
    "only cross-boundary merge possible is open-state == first-batch-"
    "state), and untouched users never shuffle again. THE ORACLE IS "
    "THE FULL RECOMPUTE over all events — the driver hash literally "
    "checks incremental == batch, the invariant that makes nightly "
    "O(batch) dimension maintenance trustworthy at 100 TB (per-batch "
    "cost tracks ingest, not the dimension's history; cf. the "
    "ann/text index append family for the same contract on indexes).",
)
def q_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.operators.scd2 import close_intervals, merge_scd2_runs, scd2_runs

    e = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    split = F.lit(SCD2_SPLIT_TS).cast("timestamp")
    # localCheckpoint (NOT persist) both runs tables: the merge consumes
    # the archive in three branches (closed / open-touched / open-
    # untouched) and the batch in two — unchecked, each branch re-scans
    # events and re-runs the window+agg chain (6 scans, 8 exchanges at
    # sf0.1). persist() would leave CacheManager entries behind on every
    # invocation of a long session (234-query sweeps) AND make repeated
    # timed bench runs read the first run's cache via canonicalized-plan
    # dedup; eager localCheckpoint materializes once per invocation, joins
    # read the checkpointed blocks, and the blocks are freed with the
    # DataFrame — every timed repeat does the full runs computation.
    arch_runs = scd2_runs(e.filter(F.col("ts") < split)).localCheckpoint(eager=True)
    batch_runs = scd2_runs(e.filter(F.col("ts") >= split)).localCheckpoint(eager=True)
    dim = merge_scd2_runs(arch_runs, batch_runs)
    return close_intervals(dim)


DPP_HOT_DAYS = 5


@query(
    "q_dpp_join",
    oracle=f"""
    WITH per_day AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n_purch
      FROM events WHERE event_type = 'purchase'
      GROUP BY CAST(ts AS DATE)
    ),
    hot AS (
      SELECT day FROM (
        SELECT day, row_number() OVER (ORDER BY n_purch DESC, day) AS rk
        FROM per_day
      ) WHERE rk <= {DPP_HOT_DAYS}
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(count(DISTINCT CAST(e.ts AS DATE)) AS BIGINT) AS n_days
    FROM events e JOIN hot h ON CAST(e.ts AS DATE) = h.day
    GROUP BY e.event_type
    """,
    doc="Dynamic partition pruning demo: events are laid out ONCE "
    "partitioned by day (the standard fact layout), and the probe joins "
    "them to a data-DERIVED dim (the top-5 purchase days, knowable only "
    "at runtime). Catalyst plans a DPP subquery: the fact scan's "
    "PartitionFilters carry dynamicpruning#... fed by the broadcast dim, "
    "so only hot-day directories are READ — no static predicate could "
    "express this, and at 100 TB it is the difference between scanning "
    "the month and scanning 5 days (plan-locked in test_plan_hygiene). "
    "Completes the write-time-layout triple: z-order (2-D scan "
    "pruning), bucketing (join shuffle deletion), day partitioning + "
    "DPP (runtime scan pruning).",
)
def q_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.scratch import built_once

    def _build(path: str) -> None:
        (
            load(spark, sf_dir, "events")
            .withColumn("day_p", F.to_date("ts"))
            .write.partitionBy("day_p")
            .mode("overwrite")
            .parquet(path)
        )

    path = built_once("dpp_events", sf_dir, _build)
    ev = spark.read.parquet(path)
    per_day = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_purch"))
    )
    wk = Window.orderBy(F.col("n_purch").desc(), F.col("day"))
    hot = (
        per_day.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= DPP_HOT_DAYS)
        .select("day")
    )
    return (
        ev.join(F.broadcast(hot), ev.day_p == hot.day)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sum_cents"),
            F.countDistinct(F.to_date("ts")).alias("n_days"),
        )
    )


SCD2_SPLIT2_TS = "2024-01-28 00:00:00"


@query(
    "q_scd2_store",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    v AS (
      SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
      FROM s
    ),
    g AS (
      SELECT user_id, version, event_type AS state,
             CAST(min(epoch_us(ts)) AS BIGINT) AS valid_from_us,
             CAST(count(*) AS BIGINT) AS n_events
      FROM v GROUP BY user_id, version, event_type
    )
    SELECT user_id, version, state, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version) AS valid_to_us,
           n_events,
           lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version) IS NULL AS is_current
    FROM g
    """,
    doc="PERSISTED SCD2 dimension lifecycle (sources/scd2_store.py): "
    f"build the store from events before {SCD2_SPLIT_TS}, absorb two "
    "successive micro-batches through the bucket-pruned O(batch) append "
    "(only the buckets a batch's users hash into are read or rewritten; "
    "untouched buckets inode-stable — test_scd2_store.py), then read "
    "the dimension view back. The oracle is the FULL recompute over all "
    "events, so the driver hash checks the whole maintenance cycle: "
    "build + append + append == batch. The build runs once per process "
    "(built_once; bench warmup pays it) — the probe path the timed "
    "runs see is the read view over the maintained runs.",
)
def q_scd2_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.scratch import built_once
    from hnarchive_spark.sources.scd2_store import (
        append_scd2,
        build_scd2_store,
        read_scd2,
    )

    e = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    split1 = F.lit(SCD2_SPLIT_TS).cast("timestamp")
    split2 = F.lit(SCD2_SPLIT2_TS).cast("timestamp")

    def _build(path: str) -> None:
        build_scd2_store(spark, e.filter(F.col("ts") < split1), path)
        append_scd2(spark, e.filter((F.col("ts") >= split1) & (F.col("ts") < split2)), path)
        append_scd2(spark, e.filter(F.col("ts") >= split2), path)

    path = built_once("scd2_store", sf_dir, _build)
    return read_scd2(spark, path)
