"""Streaming restart semantics: a checkpointed file-stream aggregation,
stopped and restarted with MORE input, must resume from the checkpoint (no
reprocessing from scratch) and produce the same totals as one batch pass."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write_events(spark, path, lo, hi):
    spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000).alias("ts"),
        (F.col("id") % 7).alias("user_id"),
        F.lit(1.0).alias("value"),
    ).coalesce(1).write.mode("append").parquet(path)


def test_checkpointed_restart_resumes(spark, tmp_path):
    src = str(tmp_path / "events_src")
    ckpt = str(tmp_path / "ckpt")
    _write_events(spark, src, 0, 100)

    schema = "event_id long, ts timestamp, user_id long, value double"

    def run_once(sink_name):
        agg = (
            spark.readStream.schema(schema)
            .parquet(src)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["user_id"]: (r["n"], r["total"]) for r in spark.table(sink_name).collect()}

    first = run_once("restart_sink_a")
    assert sum(n for n, _ in first.values()) == 100

    # more data arrives while the query is down; restart from checkpoint
    _write_events(spark, src, 100, 250)
    second = run_once("restart_sink_b")
    assert sum(n for n, _ in second.values()) == 250

    batch = {
        r["user_id"]: (r["n"], r["total"])
        for r in spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert second == batch

    # the checkpoint recorded both runs' offsets (it resumed, not restarted)
    offsets = os.listdir(os.path.join(ckpt, "offsets"))
    assert len(offsets) >= 2
