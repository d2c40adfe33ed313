"""Streaming-shaped queries: tumbling-window aggregation via a real
Structured Streaming run (Trigger.AvailableNow — the reference's `update`
semantics, SURVEY §2.8/E2), sessionization, and the as-of join.

q_stream_tumbling genuinely goes through readStream -> writeStream(memory)
so the streaming plumbing (source listing, watermarking hooks, micro-batch
execution) is exercised; with AvailableNow it drains the input and stops,
which makes the result a deterministic batch answer the oracle can check.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hnarchive_spark.operators.asof import asof_join
from hnarchive_spark.plans.registry import query
from hnarchive_spark.tables import load, read_events_stream

_sink_counter = itertools.count()

# Exact integer cents: value is 2-decimal money stored as double, so a naive
# sum(value) is summation-order dependent and a half-cent tie can flip
# between engines/runs.  round(value*100) is exactly integral per row, a sum
# of integer-valued doubles below 2^53 is exact in ANY order, and the final
# BIGINT cast is lossless — so both engines produce the identical integer.
# (A function, not a module constant: Column construction needs an active
# SparkContext under classic PySpark.)
def _sum_cents():
    return F.sum(F.round(F.col("value") * 100, 0)).cast("long")


_SUM_CENTS_SQL = "CAST(round(sum(round(value * 100))) AS BIGINT)"


@query(
    "q_stream_tumbling",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           count(*) AS n_events, {_SUM_CENTS_SQL} AS sum_value_cents
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling 1-day window aggregation executed as a real Structured "
    "Streaming query (readStream -> window() -> memory sink) drained with "
    "Trigger.AvailableNow — the reference `update` catch-up semantics "
    "(hnarchive.py:524-537). Watermark included to exercise the late-data "
    "path (no-op on a drained source). Money summed as exact integer cents "
    "so the hash is order- and engine-independent.",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = read_events_stream(spark, sf_dir)
    agg = (
        raw.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), _sum_cents().alias("sum_value_cents"))
    )
    name = f"stream_tumbling_sink_{next(_sink_counter)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("w.start").alias("day"), "event_type", "n_events", "sum_value_cents"
    )


@query(
    "q_stream_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    doc="Streaming stateful deduplication: dropDuplicates on the key columns "
    "holds the seen-key set in the state store across micro-batches — the "
    "streaming form of exact dedup (the ingest-time guard of a training "
    "pipeline). Projecting ONLY the key columns makes survivor choice "
    "deterministic, so the drained result is exactly batch DISTINCT.",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = (
        read_events_stream(spark, sf_dir)
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
    )
    name = f"stream_dedup_sink_{next(_sink_counter)}"
    q = (
        raw.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "q_stream_dedup_bounded",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    doc="Streaming dedup with BOUNDED state: dropDuplicatesWithinWatermark "
    "evicts seen keys once the watermark passes their event time, so the "
    "state store holds only the active horizon instead of every key ever "
    "seen — the form of q_stream_dedup that survives an unbounded stream "
    "at 100 TB (plain dropDuplicates state grows forever). The delay here "
    "(35 days) exceeds the drained corpus's 30-day span, so no key is "
    "evicted mid-drain and the result is exactly batch DISTINCT — "
    "deterministic for the oracle while the bounded-state plumbing "
    "(watermark tracking + state TTL) is genuinely exercised.",
)
def q_stream_dedup_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = (
        read_events_stream(spark, sf_dir)
        .select("user_id", "event_type", "ts")
        .withWatermark("ts", "35 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    name = f"stream_dedup_bounded_sink_{next(_sink_counter)}"
    q = (
        raw.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "q_sessionize",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      -- CAST: DuckDB windowed sum() over BIGINT returns HUGEINT (int128);
      -- session_id reaches the output here and the driver value-hash is
      -- type-sensitive at the serialization layer, so pin BIGINT explicitly.
      -- (The sibling session oracles below keep session_id as a grouping key
      -- only, so they are unaffected.)
      SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           {_SUM_CENTS_SQL} AS session_value_cents
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="Sessionization (30-min inactivity gap): lag + cumulative-sum session "
    "ids, one shuffle on user_id; the batch twin of the stateful streaming "
    "session operator in hnarchive_spark.streaming. The gap test compares at "
    "microsecond precision (unix_micros), matching the oracle's INTERVAL "
    "comparison and GAP_US in streaming/sessionize.py — unix_timestamp's "
    "whole-second truncation would split (1800s, 1801s] gaps differently. "
    "session_value_cents is an exact integer (no double ever reaches the "
    "output), so the hash is order- and engine-independent.",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts").over(w)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(prev)
    new_session = F.when(prev.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    return (
        ev.select("user_id", "event_id", "ts", "value", new_session.alias("new_session"))
        .select("*", F.sum("new_session").over(wsum).alias("session_id"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            _sum_cents().alias("session_value_cents"),
        )
    )


@query(
    "q_asof_join_inner",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
    FROM events e
    ASOF JOIN o ON o.user_id = e.user_id AND o.o_orderdate <= e.ts
    """,
    doc="Inner as-of join (events -> most recent prior order per user): "
    "events whose user has no preceding order are dropped. The right side "
    "is deduplicated per (user, date) first — an as-of match at a tied "
    "timestamp is engine-arbitrary otherwise, so uniqueness per (key, time) "
    "is part of the operator's determinism contract.",
)
def q_asof_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    return asof_join(
        e, o, key="user_id", left_time="ts", right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"], how="inner",
    )


@query(
    "q_stream_dim_join",
    oracle=f"""
    SELECT c.c_mktsegment, CAST(date_trunc('day', e.ts) AS TIMESTAMP) AS day,
           count(*) AS n_events,
           CAST(round(sum(round(e.value * 100))) AS BIGINT) AS sum_value_cents
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    doc="Stream-static join: the event stream enriched against the static "
    "customer dimension (broadcast per micro-batch — no stream state), then "
    "windowed aggregation; drained with AvailableNow. Money summed as exact "
    "integer cents.",
)
def q_stream_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = read_events_stream(spark, sf_dir)
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = raw.join(F.broadcast(cust), raw.user_id == cust.c_custkey)
    agg = (
        joined.withWatermark("ts", "1 hour")
        .groupBy("c_mktsegment", F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), _sum_cents().alias("sum_value_cents"))
    )
    name = f"stream_dim_join_sink_{next(_sink_counter)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "c_mktsegment", F.col("w.start").alias("day"), "n_events", "sum_value_cents"
    )


@query(
    "q_stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id,
           CAST(round(p.value * 100) AS BIGINT) AS purchase_value_cents
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    """,
    doc="Stream-stream interval join: purchases matched to the same user's "
    "clicks in the preceding hour; both sides watermarked so the join state "
    "is bounded by the time band (state eviction at watermark). AvailableNow "
    "drain makes the result equal the batch interval join.",
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    c = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        F.round(F.col("p_value") * 100, 0).cast("long").alias("purchase_value_cents"),
    )
    name = f"stream_stream_join_sink_{next(_sink_counter)}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "q_stream_sessionize",
    # After an AvailableNow drain the stateful result is deterministic and
    # equals batch sessionization MINUS each user's final (still-open)
    # session, which stays in state awaiting the next micro-batch.  Value
    # sums are exact integer cents on all three sides (stream state, batch
    # twin, this oracle), so the hash is engine- and order-independent.
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    agg AS (
      SELECT user_id, session_id, count(*) AS n_events,
             min(ts) AS session_start, max(ts) AS session_end,
             {_SUM_CENTS_SQL} AS value_cents
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id, session_start, session_end, n_events, value_cents
    FROM agg
    QUALIFY session_id < max(session_id) OVER (PARTITION BY user_id)
    """,
    doc="Custom stateful streaming operator: session windows with a 30-min "
    "inactivity gap via applyInPandasWithState (per-user state, timeout "
    "handling). AvailableNow drain -> emits every session closed by a "
    "subsequent event; open tail sessions stay in state. The oracle is batch "
    "sessionization minus each user's final session.",
)
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.streaming.sessionize import sessionize_stream

    raw = read_events_stream(spark, sf_dir).select("user_id", "ts", "value")
    sessions = sessionize_stream(raw)
    name = f"stream_sessionize_sink_{next(_sink_counter)}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "q_stream_rollup_mv",
    # The maintained rollup equals the from-scratch batch aggregate of the
    # drained stream — count/sum/min/max per (day, event_type).  All money
    # outputs are exact integer cents: value is 2-decimal money, so
    # round(value*100) is integral per row, the sum is exact in any order,
    # and min/max are pass-through values scaled by the same exact rule.
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           count(*) AS n,
           CAST(round(sum(round(value * 100))) AS BIGINT) AS total_cents,
           CAST(round(min(value) * 100) AS BIGINT) AS vmin_cents,
           CAST(round(max(value) * 100) AS BIGINT) AS vmax_cents
    FROM events GROUP BY 1, 2
    """,
    doc="Streaming materialized view, driver-checked end-to-end: the event "
    "stream drains through streaming/rollup_sink.py (foreachBatch lands "
    "each micro-batch day-partitioned in the record store, then "
    "DailyRollup recomputes exactly the dirty days with a partition-pruned "
    "scan), and the MAINTAINED rollup table is returned — the oracle is "
    "the from-scratch batch aggregate, so the driver hash proves "
    "incremental maintenance converges to the batch answer (the MV "
    "correctness contract; kill/resume and late-day invalidation are "
    "locked separately in test_stream_rollup.py). At 100 TB each trigger "
    "costs O(batch + dirty days), never O(history).",
)
def q_stream_rollup_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.scratch import scratch_dir

    from hnarchive_spark.operators.rollup import DailyRollup
    from hnarchive_spark.streaming.rollup_sink import stream_rollup

    base = scratch_dir("rollup_mv")
    rollup = DailyRollup(spark, f"{base}/rollup", "event_type", "value")
    stream = read_events_stream(spark, sf_dir).select("ts", "event_type", "value")
    q = stream_rollup(stream, f"{base}/record", rollup, f"{base}/ckpt")
    q.awaitTermination()
    return rollup.read().select(
        "day",
        "event_type",
        "n",
        F.round(F.col("total") * 100, 0).cast("long").alias("total_cents"),
        F.round(F.col("vmin") * 100, 0).cast("long").alias("vmin_cents"),
        F.round(F.col("vmax") * 100, 0).cast("long").alias("vmax_cents"),
    )


@query(
    "q_asof_join",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, max(event_id) AS event_id
      FROM events GROUP BY user_id, ts
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, e.event_id, e.ts AS event_ts
    FROM orders o
    ASOF LEFT JOIN e
      ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
    """,
    doc="As-of join (latest event per user at or before each order date): "
    "union-and-carry implementation — ONE shuffle on the key, no range "
    "explosion (operators/asof.py). The right side is deduplicated per "
    "(user, ts) first: an as-of match at a tied timestamp is "
    "engine-arbitrary, so (key, time) uniqueness is part of the "
    "determinism contract (same as q_asof_join_inner).",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    e = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("o_custkey"), F.col("ts").alias("event_ts"))
        .agg(F.max("event_id").alias("event_id"))
        .select("o_custkey", "event_id", "event_ts")
    )
    return asof_join(
        o,
        e,
        key="o_custkey",
        left_time="o_orderdate",
        right_time="event_ts",
        payload_cols=["event_id", "event_ts"],
    )


@query(
    "q_asof_join_forward",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, min(event_id) AS event_id
      FROM events GROUP BY user_id, ts
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, e.event_id, e.ts AS event_ts
    FROM orders o
    ASOF LEFT JOIN e
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    doc="FORWARD as-of join (earliest event per user at or after each order "
    "date) — the time-reversed twin of q_asof_join: the same union-and-"
    "carry single-shuffle plan scanned in descending time order "
    "(operators/asof.py direction='forward'). The reaction-to-an-order "
    "lookup a backward as-of cannot express. Right side deduplicated per "
    "(user, ts) so the tied-timestamp match is deterministic on both "
    "engines.",
)
def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    e = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("o_custkey"), F.col("ts").alias("event_ts"))
        .agg(F.min("event_id").alias("event_id"))
        .select("o_custkey", "event_id", "event_ts")
    )
    return asof_join(
        o,
        e,
        key="o_custkey",
        left_time="o_orderdate",
        right_time="event_ts",
        payload_cols=["event_id", "event_ts"],
        direction="forward",
    )


@query(
    "q_stream_sliding",
    # Each event falls into TWO hopping windows (2-day length, 1-day hop,
    # epoch-aligned): the one starting at its own day and the one starting
    # the day before. The oracle materializes exactly those two starts per
    # event and aggregates — the batch semantics of a drained sliding
    # window.
    oracle=f"""
    WITH ev AS (
      SELECT unnest([CAST(date_trunc('day', ts) AS TIMESTAMP),
                     CAST(date_trunc('day', ts) - INTERVAL 1 DAY AS TIMESTAMP)]) AS win_start,
             event_type, value
      FROM events
    )
    SELECT win_start, event_type, count(*) AS n_events,
           {_SUM_CENTS_SQL} AS sum_value_cents
    FROM ev GROUP BY 1, 2
    """,
    doc="Sliding (hopping) window aggregation: 2-day windows advancing by "
    "1 day, so every event contributes to two windows — the smoothing "
    "window shape tumbling can't express. Real readStream drained with "
    "AvailableNow; money as exact integer cents.",
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = read_events_stream(spark, sf_dir)
    agg = (
        raw.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 days", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), _sum_cents().alias("sum_value_cents"))
    )
    name = f"stream_sliding_sink_{next(_sink_counter)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("w.start").alias("win_start"), "event_type", "n_events", "sum_value_cents"
    )


@query(
    "q_session_window_builtin",
    # Built-in session_window semantics: events merge while the NEXT event
    # starts before the current window's end (ts - prev < gap); a new
    # session starts when ts - prev >= gap (NON-strict — note the
    # difference from q_sessionize's reference-shaped strict > gap);
    # window end = last event + gap.
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           {_SUM_CENTS_SQL} AS value_cents
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="Session windows via the BUILT-IN session_window aggregation — the "
    "engine-native form of the custom applyInPandasWithState operator "
    "(streaming/sessionize.py): one groupBy, window merging inside the "
    "aggregation, window end = last event + gap. Run here as a batch "
    "aggregate (the same expression works under readStream with a "
    "watermark in append mode). The oracle replays the exact merge rule "
    "(new session when gap >= 30 min, non-strict).",
)
def q_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), _sum_cents().alias("value_cents"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_cents",
        )
    )


@query(
    "q_stream_outer_join",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS click_id, user_id, ts FROM events
      WHERE event_type = 'click'
    ),
    wm AS (
      SELECT least(date_trunc('milliseconds', (SELECT max(ts) FROM p))
                     - INTERVAL 1 HOUR,
                   date_trunc('milliseconds', (SELECT max(ts) FROM c))
                     - INTERVAL 2 HOUR) AS w
    ),
    matched AS (
      SELECT p.purchase_id, c.click_id, p.user_id, p.cents
      FROM p JOIN c ON c.user_id = p.user_id
       AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    ),
    unmatched AS (
      SELECT p.purchase_id, NULL AS click_id, p.user_id, p.cents
      FROM p, wm
      WHERE p.ts < wm.w AND NOT EXISTS (
        SELECT 1 FROM c WHERE c.user_id = p.user_id
         AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      )
    )
    SELECT * FROM matched UNION ALL SELECT * FROM unmatched
    """,
    doc="LEFT OUTER stream-stream join: matched purchase-click pairs emit "
    "immediately; an unmatched purchase emits null-padded only once the "
    "watermark PROVES no qualifying click can still arrive — i.e. "
    "p_ts < global watermark = min(max(p_ts) - 1h, max(c_ts) - 2h) "
    "(Spark's min-policy global watermark; event time truncates to "
    "milliseconds, hence the oracle's date_trunc). Purchases younger "
    "than the final watermark stay in state awaiting the next trigger — "
    "the oracle reproduces that cutoff exactly, so the driver hash "
    "checks the ENGINE's eviction semantics, not just the inner join. "
    "State is bounded by the watermark band on both sides; the no-data "
    "final micro-batch (noDataMicroBatches) performs the last eviction "
    "under availableNow.",
)
def q_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    c = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_outer",
    ).select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        "cents",
    )
    name = f"stream_outer_join_sink_{next(_sink_counter)}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@query(
    "q_stream_late_drop",
    oracle="""
    WITH ev AS (
      SELECT event_id, ts, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    b0 AS (SELECT * FROM ev WHERE event_id % 5 != 0),
    b1 AS (SELECT * FROM ev WHERE event_id % 5 = 0),
    wm1 AS (SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 30 MINUTE AS w
            FROM b0),
    wm2 AS (SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 30 MINUTE AS w
            FROM ev),
    kept AS (
      SELECT * FROM b0
      UNION ALL
      SELECT b1.* FROM b1, wm1
      WHERE date_trunc('hour', b1.ts) + INTERVAL 1 HOUR > wm1.w
    ),
    agg AS (
      SELECT date_trunc('hour', ts) AS win_start, event_type,
             count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents
      FROM kept GROUP BY 1, 2
    )
    SELECT a.* FROM agg a, wm2 WHERE a.win_start + INTERVAL 1 HOUR <= wm2.w
    """,
    doc="Watermark LATE-DATA DROP, hash-checked: 1/5 of the events are "
    "delivered one trigger AFTER the rest (two availableNow passes over "
    "a shared checkpoint — guaranteed batch separation, no sleep/mtime "
    "races), so rows whose 1-hour window already closed under the "
    "first-pass watermark (window_end <= max(on-time ts) - 30 min, "
    "ms-truncated) are dropped from the tumbling aggregate while late "
    "rows into still-open windows merge normally. The oracle reproduces "
    "both cutoffs — the drop (wm after pass 1) and the final append-mode "
    "emission (wm after pass 2) — so the driver hash verifies the "
    "engine's watermark filter itself, the semantics every streaming "
    "pipeline silently relies on. Output goes through a parquet sink + "
    "checkpoint (the production shape), not the memory sink.",
)
def q_stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    from hnarchive_spark.scratch import scratch_dir

    from hnarchive_spark.tables import load

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    root = scratch_dir("late_drop")
    src, out, ckpt = f"{root}/src", f"{root}/out", f"{root}/ckpt"
    os.makedirs(src)
    schema = ev.schema

    def run_pass() -> None:
        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "100")
            .parquet(f"{src}/batch=*")
        )
        agg = (
            s.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents"))
            .select(F.col("w.start").alias("win_start"), "event_type", "n", "cents")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    ev.filter(F.col("event_id") % 5 != 0).coalesce(1).write.parquet(f"{src}/batch=0")
    run_pass()
    ev.filter(F.col("event_id") % 5 == 0).coalesce(1).write.parquet(f"{src}/batch=1")
    run_pass()
    return spark.read.parquet(out)


@query(
    "q_stream_funnel",
    # Emission contract: a user's conversion row is emitted exactly ONCE, at
    # the micro-batch where the funnel completes; users who never complete
    # stay in state (the open-tail contract q_stream_sessionize uses).  So
    # after an AvailableNow drain the sink holds exactly the batch funnel's
    # reached=3 rows — the oracle below is the batch funnel restricted to
    # completed conversions.
    oracle="""
    WITH s1 AS (
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
    SELECT s3.user_id, epoch_us(t1) AS t1_us, epoch_us(t2) AS t2_us,
           epoch_us(t3) AS t3_us
    FROM s3 JOIN s2 USING (user_id) JOIN s1 USING (user_id)
    """,
    doc="Streaming ordered-funnel conversion detection (view -> click -> "
    "purchase) via applyInPandasWithState (streaming/funnel.py): per-user "
    "state carries the three stage times as microsecond epochs, strict "
    "event-time comparisons replicate the batch q_funnel min/after "
    "semantics, and each user emits exactly one conversion row at the "
    "micro-batch where the purchase lands. AvailableNow drain; users mid-"
    "funnel stay in state for the next batch (open-tail contract). State "
    "is 3 longs per user — bounded, no event buffering — so at 100 TB the "
    "operator's state size tracks active users, not event volume.",
)
def q_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.streaming.funnel import funnel_stream

    raw = read_events_stream(spark, sf_dir).select(
        "user_id", "event_id", "ts", "event_type"
    )
    conv = funnel_stream(raw)
    name = f"stream_funnel_sink_{next(_sink_counter)}"
    q = (
        conv.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
