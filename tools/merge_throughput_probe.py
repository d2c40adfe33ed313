"""Store-merge cost decomposition: per-commit overhead vs per-row and
per-bucket cost (BENCH_NOTES.md r9; VERDICT r8 next-round #2).

The bench's two cadences bracket the store WRITE path:

* ``store_merge_5x200`` — the reference's 200-id commit_period
  (hnarchive.py:255-262): wall is dominated by FIXED per-commit work
  (localCheckpoint of the batch, touched-bucket listing job, snapshot
  write job, hardlink pass over untouched buckets, pointer fsync).
* ``store_merge_bulk`` — one whole-corpus commit: wall is dominated by
  actual row throughput.

This probe separates the remaining axis: with ROWS held constant, how
does one commit's cost scale with the NUMBER of id buckets it touches?
Each touched bucket adds a partition-dir rewrite (one parquet file job
output dir) and removes one hardlink from the copy-forward pass, so cost
should rise mildly and linearly in touched buckets — if it jumps, the
per-bucket fixed cost (file open/commit round trips) is the thing to
batch at 100 TB, not row volume.

Method: seed a store with the sf0.1 items corpus (100k rows, 10 buckets
of 10k ids), then for k in (1, 2, 5, 10) merge a 10k-row update spread
evenly over k buckets (first 10000//k ids of each) and time the commit.

Run: python tools/merge_throughput_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from hnarchive_spark.session import get_spark
from hnarchive_spark.sources.items_store import ItemsStore

BUCKET_SIZE = 10_000
UPDATE_ROWS = 10_000


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("merge-throughput-probe")
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    items = bench._items_from_events(spark, sf_dir).localCheckpoint(eager=True)
    n = items.count()
    print(f"corpus: {n} rows, bucket_size={BUCKET_SIZE}")

    for k in (1, 2, 5, 10):
        per_bucket = UPDATE_ROWS // k
        tmp = tempfile.mkdtemp(prefix=f"merge_probe_{k}_")
        try:
            store = ItemsStore(spark, tmp, bucket_size=BUCKET_SIZE)
            store.merge_batch(items.withColumn("seq", F.lit(0)), seq_col="seq")
            upd = (
                items.filter(
                    (F.expr(f"id div {BUCKET_SIZE}") < k)
                    & (F.expr(f"id % {BUCKET_SIZE}") < per_bucket)
                )
                .withColumn("score", F.col("score") + 1)
                .withColumn("seq", F.lit(1))
            )
            n_upd = upd.count()
            t0 = time.perf_counter()
            store.merge_batch(upd, seq_col="seq")
            dt = time.perf_counter() - t0
            print(
                f"touched_buckets={k:3d} rows={n_upd:6d} "
                f"wall={dt:6.2f}s rows_per_sec={n_upd / dt:9.1f}"
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # the zero-row floor: an empty commit = pure fixed cost
    tmp = tempfile.mkdtemp(prefix="merge_probe_0_")
    try:
        store = ItemsStore(spark, tmp, bucket_size=BUCKET_SIZE)
        store.merge_batch(items.withColumn("seq", F.lit(0)), seq_col="seq")
        upd = items.filter(F.col("id") < 0).withColumn("seq", F.lit(1))
        t0 = time.perf_counter()
        store.merge_batch(upd, seq_col="seq")
        print(f"touched_buckets=  0 rows=     0 wall={time.perf_counter() - t0:6.2f}s  (pure per-commit floor)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
