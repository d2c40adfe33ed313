"""Adversarial-skew probe for the wedge-shaped graph operators (SCALE.md).

Builds the same star+ring hub graph as the round-6 triangle probe (a
mid-id celebrity vertex adjacent to every node, plus a ring so every node
has degree >= 2) and measures, for link prediction and LPA, the row counts
that decide whether the shape survives a celebrity vertex at 100 TB:

* link prediction: candidate wedge rows generated through the hub pivot —
  uncapped (deg^2: the quadratic blowup) vs the pivot-degree-capped twin
  (bounded by cap^2 per pivot);
* LPA: vote rows per iteration (linear in E either way) and the max
  per-node vote-group size — the row count the OLD row_number() window
  funneled through ONE task at the hub, which the max-struct aggregate
  rewire partial-combines map-side instead.

Run: python tools/skew_probe_graph.py [N]   (default N=10000 nodes)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hnarchive_spark.plans.graph_ml import LP_PIVOT_CAP_X


def hub_graph(spark, n: int):
    """Star (hub = n//2 adjacent to everyone) + ring, canonical a < b."""
    hub = n // 2
    ids = spark.range(n).select(F.col("id").cast("long"))
    star = ids.filter(F.col("id") != hub).select(
        F.least(F.col("id"), F.lit(hub)).alias("a"),
        F.greatest(F.col("id"), F.lit(hub)).alias("b"),
    )
    ring = ids.select(
        F.least(F.col("id"), (F.col("id") + 1) % n).alias("a"),
        F.greatest(F.col("id"), (F.col("id") + 1) % n).alias("b"),
    )
    return star.unionAll(ring).distinct().localCheckpoint()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    und = hub_graph(spark, n)
    e = und.count()
    print(f"nodes={n} edges={e} hub_degree~{n - 1}")

    adj = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("d")).localCheckpoint()

    # --- link prediction wedge fanout, uncapped vs capped -----------------
    t0 = time.time()
    x = adj.select("u", F.col("v").alias("w"))
    y = adj.select(F.col("v").alias("w"), F.col("u").alias("v2"))
    uncapped = x.join(y, "w").filter(F.col("u") < F.col("v2")).count()
    t_uncapped = time.time() - t0

    t0 = time.time()
    cap = deg.agg(F.expr(f"({LP_PIVOT_CAP_X} * sum(d)) div count(*)").alias("maxd"))
    maxd = cap.first()[0]
    adjc = (
        adj.join(deg.select(F.col("u").alias("v"), F.col("d").alias("dv")), "v")
        .crossJoin(F.broadcast(cap))
        .filter(F.col("dv") <= F.col("maxd"))
        .select("u", "v")
    )
    xc = adjc.select("u", F.col("v").alias("w"))
    yc = adjc.select(F.col("v").alias("w"), F.col("u").alias("v2"))
    capped = xc.join(yc, "w").filter(F.col("u") < F.col("v2")).count()
    t_capped = time.time() - t0
    print(
        f"link-pred wedge rows: uncapped={uncapped} ({t_uncapped:.2f}s)  "
        f"capped(deg<={LP_PIVOT_CAP_X}x mean = {maxd})={capped} ({t_capped:.2f}s)  "
        f"ratio={uncapped / max(capped, 1):.0f}x"
    )

    # --- LPA vote volume and the per-node funnel --------------------------
    labels = adj.select("u").distinct().select("u", F.col("u").alias("lab"))
    votes = (
        adj.join(labels.select(F.col("u").alias("v"), "lab"), "v")
        .groupBy("u", "lab")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    vote_rows = votes.count()
    max_group = votes.groupBy("u").count().agg(F.max("count")).first()[0]
    t0 = time.time()
    (
        votes.groupBy("u")
        .agg(F.max(F.struct(F.col("c"), (-F.col("lab")).alias("nl"))).alias("m"))
        .select("u", (-F.col("m.nl")).alias("lab"))
        .count()
    )
    t_agg = time.time() - t0
    print(
        f"LPA iter-1: vote rows={vote_rows} (linear in E)  "
        f"max per-node vote group={max_group} (the old window's single-task "
        f"funnel; the max-struct aggregate partial-combines it, {t_agg:.2f}s)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
