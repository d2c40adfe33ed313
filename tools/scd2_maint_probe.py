"""Measure the SCD2 store's O(batch) maintenance claim (the r11
index_maint_probe methodology applied to the dimension): seed the store
from the first time-slice of events, append the remaining slices through
the exact per-batch path streaming maintenance uses, then re-deliver the
last slice.  The claim holds if per-batch wall stays FLAT while the
dimension grows, and the re-delivered batch costs only the frontier
check (no write job).

Run: python tools/scd2_maint_probe.py [sf_dir] [n_slices]

Wide-cardinality mode (VERDICT r12 #6): the sf0.1 fixture has only 150
users, so every batch touches every bucket and the probe above can only
show the per-append cost FLOOR.  ``python tools/scd2_maint_probe.py
wide`` instead synthesizes a 65,536-user dimension (256 buckets, 256
users per bucket), then appends SAME-SIZED batches (256 events each)
engineered to touch 1 / 4 / 16 / 64 / 256 buckets — if the bucket
pruning is real, append wall tracks TOUCHED BUCKETS at constant batch
size and constant dimension size.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from hnarchive_spark.session import get_spark
from hnarchive_spark.sources.scd2_store import append_scd2, build_scd2_store, read_scd2
from hnarchive_spark.tables import load


def wide() -> None:
    """The sparse-batch measurement at realistic cardinality: 65,536
    users over 256 buckets; equal-sized appends touching 1/4/16/64/256
    buckets.  user_id encodes its bucket as user_id % 256 (the store's
    own hash), so batch construction picks buckets exactly."""
    n_users, nb, per_batch = 65_536, 256, 256
    spark = get_spark("scd2-maint-probe-wide")
    spark.sparkContext.setLogLevel("ERROR")
    base = "2024-01-01 00:00:00"
    # seed: 2 events per user (one state flip) — 131k rows, all before
    # the batches' timestamps so the frontier guard admits every batch
    seed = (
        spark.range(n_users * 2)
        .select(
            (F.col("id") % n_users + 1).alias("user_id"),
            (F.to_timestamp(F.lit(base)) + F.make_interval(secs=(F.col("id") / n_users).cast("int")))
            .alias("ts"),
            F.col("id").alias("event_id"),
            F.when((F.col("id") / n_users).cast("int") == 0, "active").otherwise("idle")
            .alias("event_type"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="scd2_wide_")
    out: dict = {"mode": "wide", "n_users": n_users, "n_buckets": nb, "events_per_batch": per_batch}
    try:
        t0 = time.perf_counter()
        build_scd2_store(spark, seed, tmp, n_buckets=nb)
        out["build_s"] = round(time.perf_counter() - t0, 2)
        rows = []
        ev_id = n_users * 2

        def _batch(t: int, day: int):
            # per_batch users, per_batch//t from each of t buckets; user
            # b + k*nb + 1 sits in bucket (b+1) % nb — t distinct buckets
            nonlocal ev_id
            per_bucket = per_batch // t
            users = sorted(
                {b + k * nb + 1 for b in range(t) for k in range(per_bucket)}
            )
            df = spark.createDataFrame(
                [
                    (u, f"2024-02-{day:02d} 00:00:00", ev_id + i, "purchase")
                    for i, u in enumerate(users)
                ],
                "user_id long, ts string, event_id long, event_type string",
            ).withColumn("ts", F.col("ts").cast("timestamp"))
            ev_id += len(users)
            return df, users

        # untimed warmup append — the first append pays one-time JVM/plan
        # costs that would otherwise land on the t=1 measurement
        warm, _ = _batch(1, day=1)
        append_scd2(spark, warm, tmp)

        for day, t in enumerate((1, 4, 16, 64, 256), start=2):
            batch, users = _batch(t, day=day)
            touched = len({u % nb for u in users})
            t0 = time.perf_counter()
            applied = append_scd2(spark, batch, tmp)
            wall = round(time.perf_counter() - t0, 2)
            rows.append(
                {"target_buckets": t, "touched_buckets": touched,
                 "events": len(users), "applied": applied, "wall_s": wall}
            )
        out["appends"] = rows
        out["dim_rows"] = read_scd2(spark, tmp).count()
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "wide":
        wide()
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("scd2-maint-probe")
    spark.sparkContext.setLogLevel("ERROR")
    e = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    lo, hi = e.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / n
    edges = [lo + i * span for i in range(1, n)]

    def slice_(i: int):
        c = F.col("ts")
        if i == 0:
            return e.filter(c < edges[0])
        if i == n - 1:
            return e.filter(c >= edges[-1])
        return e.filter((c >= edges[i - 1]) & (c < edges[i]))

    tmp = tempfile.mkdtemp(prefix="scd2_probe_")
    out: dict = {"sf_dir": sf_dir, "n_slices": n}
    try:
        t0 = time.perf_counter()
        build_scd2_store(spark, slice_(0), tmp)
        out["build_s"] = round(time.perf_counter() - t0, 2)
        walls = []
        applied = []
        for i in range(1, n):
            b = slice_(i)
            t0 = time.perf_counter()
            applied.append(append_scd2(spark, b, tmp))
            walls.append(round(time.perf_counter() - t0, 2))
        out["append_walls_s"] = walls
        out["append_applied"] = applied
        t0 = time.perf_counter()
        noop = append_scd2(spark, slice_(n - 1), tmp)
        out["redeliver_s"] = round(time.perf_counter() - t0, 2)
        out["redeliver_applied"] = noop
        out["dim_rows"] = read_scd2(spark, tmp).count()
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
