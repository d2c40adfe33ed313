"""Measure the write-time-layout claims (SURVEY §2: bucketing + DPP).

Join probe (sf dir, default sf0.1): lineitem ⋈ orders on orderkey +
per-priority agg, three physical strategies —
  plain_smj   raw parquet, merge hint      (shuffle both sides, then SMJ)
  bucketed    bucketed tables, merge hint  (NO exchange under the join)
  plain_aqe   raw parquet, optimizer free  (AQE picks broadcast at sf0.1)

Scan probe: the q_dpp_join aggregate over the day-partitioned layout —
  dpp_on      dynamic partition pruning enabled (5 of ~30 days read)
  dpp_off     spark.sql.optimizer.dynamicPartitionPruning.enabled=false
              (same plan minus the pruning subquery: full layout scan)

Walls are min-of-3 after an untimed warmup, noop sink. Run with nothing
else on the box; results go to BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from hnarchive_spark.session import get_spark
from hnarchive_spark.sources.bucketed import bucketed_pair
from hnarchive_spark.tables import load


def _time(df) -> float:
    df.write.mode("overwrite").format("noop").save()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("layout-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}

    li_raw = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("price_c"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("disc_pct"),
    )
    o_raw = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")

    def agg(j):
        return j.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("price_c") * (100 - F.col("disc_pct"))).alias("revenue_c100"),
        )

    out["join_plain_smj"] = _time(
        agg(li_raw.hint("merge").join(o_raw, li_raw.l_orderkey == o_raw.o_orderkey))
    )
    out["join_plain_aqe"] = _time(
        agg(li_raw.join(o_raw, li_raw.l_orderkey == o_raw.o_orderkey))
    )
    name_o, name_li = bucketed_pair(spark, sf_dir)
    o_b = spark.table(name_o).select("o_orderkey", "o_orderpriority")
    li_b = spark.table(name_li)
    out["join_bucketed"] = _time(
        agg(li_b.hint("merge").join(o_b, li_b.l_orderkey == o_b.o_orderkey))
    )

    from hnarchive_spark.plans.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    q = REGISTRY["q_dpp_join"].spark
    out["dpp_on"] = _time(q(spark, sf_dir))
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    out["dpp_off"] = _time(q(spark, sf_dir))
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")

    # amplified DPP probe: the sf0.1 layout is ~100k rows, so the pruning
    # subquery's fixed cost exceeds the scan it saves — replicate events
    # AMP x into the same day-partitioned shape to find the regime where
    # runtime pruning pays (the claim is IO-proportionality, not a fixed
    # speedup).
    AMP = 20
    from hnarchive_spark.scratch import scratch_dir

    path = scratch_dir("dpp_amp") + "/events_amp"
    ev = load(spark, sf_dir, "events")
    amp = (
        ev.crossJoin(F.broadcast(spark.range(AMP).select(F.col("id").alias("rep"))))
        .withColumn("event_id", F.col("event_id") * AMP + F.col("rep"))
        .drop("rep")
        .withColumn("day_p", F.to_date("ts"))
    )
    amp.write.partitionBy("day_p").mode("overwrite").parquet(path)
    evl = spark.read.parquet(path)
    per_day = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_purch"))
    )
    from pyspark.sql import Window

    wk = Window.orderBy(F.col("n_purch").desc(), F.col("day"))
    hot = per_day.withColumn("rk", F.row_number().over(wk)).filter(F.col("rk") <= 5).select("day")
    probe = (
        evl.join(F.broadcast(hot), evl.day_p == hot.day)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )
    out[f"dpp_on_amp{AMP}x"] = _time(probe)
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    out[f"dpp_off_amp{AMP}x"] = _time(probe)
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")

    print(json.dumps({"sf_dir": sf_dir, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
