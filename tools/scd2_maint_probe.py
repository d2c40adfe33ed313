"""Measure the SCD2 store's O(batch) maintenance claim (the r11
index_maint_probe methodology applied to the dimension): seed the store
from the first time-slice of events, append the remaining slices through
the exact per-batch path streaming maintenance uses, then re-deliver the
last slice.  The claim holds if per-batch wall stays FLAT while the
dimension grows, and the re-delivered batch costs only the frontier
check (no write job).

Run: python tools/scd2_maint_probe.py [sf_dir] [n_slices]
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


def main() -> None:
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
