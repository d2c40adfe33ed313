"""Decompose the per-commit fixed cost ("zero-row commit floor") of
ItemsStore.merge_batch (VERDICT r9 #3: version-swap vs hardlink pass vs
plan/job launch, with numbers).

Method: seed a store from the sf events table (untimed), then run N
zero-row merge commits and N 200-row merge commits with the store's
internal phases wrapped in timers:

* ``checkpoint``  — ``updates.localCheckpoint(eager=True)`` (one job)
* ``listing``     — touched-bucket ``distinct().collect()`` (one job)
* ``write``       — ``_write_snapshot`` (merge plan + shuffle + parquet
                    commit protocol; the only corpus-touching job)
* ``hardlink``    — the copy-forward pass over untouched buckets (pure
                    Python, O(total buckets))
* ``swap``        — meta write + fsynced pointer swap + retention vacuum
                    (rmtree of the expired snapshot)
* ``residual``    — total − sum(above): plan construction, filter/isin
                    pushdown setup, py4j round trips

Run: python tools/merge_floor_probe.py  [SF_DIR]
Output: one JSON line per cadence with mean seconds per phase.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# PySpark 4: concrete sessions build classic DataFrames, which OVERRIDE the
# base-class methods — patch the classic class or the timers never fire
import pyspark.sql.classic.dataframe as _D
from pyspark.sql import functions as F

from bench import _items_from_events
from hnarchive_spark.session import get_spark
from hnarchive_spark.sources.items_store import ItemsStore

N_COMMITS = 5


def _timed_store(spark, path, acc):
    store = ItemsStore(spark, path, bucket_size=10_000)

    def wrap(name, fn):
        def inner(*a, **kw):
            t0 = time.perf_counter()
            try:
                return fn(*a, **kw)
            finally:
                acc[name] = acc.get(name, 0.0) + time.perf_counter() - t0

        return inner

    store._write_snapshot = wrap("write", store._write_snapshot)
    store._link_forward = wrap("hardlink", store._link_forward)
    store._swap_pointer = wrap("swap", store._swap_pointer)
    store._read_raw = wrap("read_raw", store._read_raw)
    return store


def run_cadence(spark, items, rows_per_commit: int) -> dict[str, float]:
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="merge_floor_probe_")
    acc: dict[str, float] = {}
    orig_ckpt, orig_collect = _D.DataFrame.localCheckpoint, _D.DataFrame.collect

    def t_ckpt(self, eager=True):
        t0 = time.perf_counter()
        try:
            return orig_ckpt(self, eager)
        finally:
            acc["checkpoint"] = acc.get("checkpoint", 0.0) + time.perf_counter() - t0

    def t_collect(self):
        t0 = time.perf_counter()
        try:
            return orig_collect(self)
        finally:
            acc["listing"] = acc.get("listing", 0.0) + time.perf_counter() - t0

    try:
        store = _timed_store(spark, tmp, acc)
        store.merge_batch(items.withColumn("seq", F.lit(0)), seq_col="seq")
        acc.clear()
        _D.DataFrame.localCheckpoint, _D.DataFrame.collect = t_ckpt, t_collect
        t0 = time.perf_counter()
        for k in range(N_COMMITS):
            if rows_per_commit == 0:
                upd = items.filter(F.lit(False))
            else:
                lo = k * rows_per_commit + 1
                upd = items.filter(F.col("id").between(lo, lo + rows_per_commit - 1))
            store.merge_batch(
                upd.withColumn("score", F.col("score") + 1).withColumn("seq", F.lit(k + 1)),
                seq_col="seq",
            )
        total = time.perf_counter() - t0
    finally:
        _D.DataFrame.localCheckpoint, _D.DataFrame.collect = orig_ckpt, orig_collect
        shutil.rmtree(tmp, ignore_errors=True)

    out = {k: round(v / N_COMMITS, 4) for k, v in acc.items()}
    out["residual"] = round(total / N_COMMITS - sum(acc.values()) / N_COMMITS, 4)
    out["total_per_commit"] = round(total / N_COMMITS, 4)
    out["rows_per_commit"] = rows_per_commit
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("merge-floor-probe")
    spark.sparkContext.setLogLevel("ERROR")
    items = _items_from_events(spark, sf_dir)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    for rows in (0, 200):
        print(json.dumps(run_cadence(spark, items, rows)))
    spark.stop()


if __name__ == "__main__":
    main()
