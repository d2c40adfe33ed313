"""Watermark semantics across micro-batches (maxFilesPerTrigger=1 splits the
files into separate batches):

* append mode emits a window exactly once, only after the watermark passes
  its end; still-open windows are withheld;
* a late event arriving after the watermark has been applied is dropped.

Empirical Spark 4.1 note (verified here): the late-row drop filter lags the
watermark by ONE batch — a late row landing in the batch immediately after
the watermark advanced can still be merged. The test therefore delivers the
late event two batches later, where the drop is guaranteed.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

BASE = 1_700_000_400  # multiple of 600 s -> 10-min windows align to BASE


def _write(spark, path, rows):
    spark.createDataFrame(rows, "event_id long, ts timestamp, value double").coalesce(
        1
    ).write.mode("append").parquet(path)
    time.sleep(1.1)  # distinct mtimes -> deterministic file order


def _ts(sec):
    from datetime import datetime, timezone

    return datetime.fromtimestamp(BASE + sec, tz=timezone.utc).replace(tzinfo=None)


def test_late_event_dropped_and_single_emission(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 0: window A [0,600) gets 2 events; head event at t=1800 pushes
    # the watermark (10 min delay) to 1200 after this batch
    _write(spark, src, [(1, _ts(10), 1.0), (2, _ts(20), 1.0), (3, _ts(1800), 1.0)])
    # batch 1: on-time head event (watermark now applied to scans)
    _write(spark, src, [(5, _ts(1810), 1.0)])
    # batch 2: a LATE event for window A (t=30 << watermark 1200) -> dropped
    _write(spark, src, [(4, _ts(30), 100.0)])

    agg = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [
        (int(r["w"]["start"].timestamp() - BASE), r["n"], r["total"])
        for r in spark.table("wm_sink").collect()
    ]
    # exactly one emission: window A without the late event; the head window
    # (still open — watermark never passed its end) is withheld
    assert rows == [(0, 2, 2.0)], rows
