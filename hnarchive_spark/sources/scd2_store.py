"""Persisted SCD2 dimension store with bucket-pruned O(batch) appends.

Layout: ``<path>/runs`` parquet partitioned by ``u_bucket = user_id %
N_BUCKETS``.  An append touches ONLY the buckets its batch users hash
into: those partitions are read (partition-pruned scan), merged with the
batch's runs through :func:`operators.scd2.merge_scd2_runs`, and
rewritten via dynamic partition overwrite — untouched buckets' files are
never opened, let alone rewritten (inode-locked in
tests/test_scd2_store.py).  Per-batch cost therefore tracks
|batch users| / N_BUCKETS of the dimension, not its total history — the
same maintenance contract as the ANN/text index appends.

At-least-once safety (the streaming requirement): each run row carries
its final event's (ts, event_id); an arriving event at-or-before its
user's open-run position is DROPPED before the merge, so a re-delivered
micro-batch re-derives zero kept events and the append is a pure no-op
(no write job at all).  This is also the standard SCD2 late-data policy:
events older than the current state's last position can no longer
change history.  Atomicity per batch: the dynamic-overwrite parquet job
commits all its bucket rewrites at job commit — a crash before that
leaves the old files live, and the re-delivered batch redoes the merge.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hnarchive_spark.operators.scd2 import close_intervals, merge_scd2_runs, scd2_runs

N_BUCKETS = 32

_EVENT_COLS = ("user_id", "ts", "event_id", "event_type")


def _with_bucket(df: DataFrame) -> DataFrame:
    return df.withColumn("u_bucket", (F.col("user_id") % N_BUCKETS).cast("int"))


def build_scd2_store(spark: SparkSession, events: DataFrame, path: str) -> int:
    """Full build: run-length collapse the seed events and lay the runs
    out bucket-partitioned. Returns the number of runs written."""
    runs = _with_bucket(scd2_runs(events.select(*_EVENT_COLS)))
    runs.write.mode("overwrite").partitionBy("u_bucket").parquet(os.path.join(path, "runs"))
    return spark.read.parquet(os.path.join(path, "runs")).count()


def append_scd2(spark: SparkSession, batch: DataFrame, path: str) -> int:
    """Absorb a batch of events; returns the number of events APPLIED
    (0 for a fully re-delivered/late batch — which also skips the write
    entirely)."""
    runs_path = os.path.join(path, "runs")
    b = batch.select(*_EVENT_COLS)
    buckets = [
        r[0] for r in b.select((F.col("user_id") % N_BUCKETS).cast("int")).distinct().collect()
    ]
    if not buckets:
        return 0
    dim = spark.read.parquet(runs_path).filter(F.col("u_bucket").isin(buckets))

    # at-least-once / late-data guard: drop events at-or-before the open
    # run's last (ts, event_id) position
    wmax = F.max(F.struct("last_ts_us", "last_event_id"))
    frontier = dim.groupBy("user_id").agg(wmax.alias("_f"))
    kept = (
        b.join(frontier, "user_id", "left")
        .filter(
            F.col("_f").isNull()
            | (F.struct(F.unix_micros("ts").alias("last_ts_us"),
                        F.col("event_id").alias("last_event_id")) > F.col("_f"))
        )
        .drop("_f")
    )
    n_kept = kept.count()
    if n_kept == 0:
        return 0

    new_rows = _with_bucket(merge_scd2_runs(dim.drop("u_bucket"), scd2_runs(kept)))
    (
        new_rows.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("u_bucket")
        .parquet(runs_path)
    )
    return n_kept


def read_scd2(spark: SparkSession, path: str) -> DataFrame:
    """The dimension view: runs + derived valid_to_us/is_current."""
    return close_intervals(spark.read.parquet(os.path.join(path, "runs")).drop("u_bucket"))
