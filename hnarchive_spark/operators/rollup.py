"""Incremental time-bucket rollup — a continuously-maintained materialized
aggregate (the 'hypertable rollup' pattern): daily per-key aggregates kept
in a parquet table and refreshed by recomputing ONLY the days present in
the new batch, not the whole history.

At 100 TB this is the difference between an O(new-data) nightly refresh and
an O(all-time) rescan: the rollup table is partitioned by day, the incoming
batch names the affected days, and the merge rewrites exactly those
partitions (partition-overwrite semantics via dynamic partitionOverwriteMode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class DailyRollup:
    """Maintains sum/count/min/max of ``value_col`` per (day, key_col)."""

    def __init__(self, spark: SparkSession, path: str, key_col: str, value_col: str):
        self.spark = spark
        self.path = path
        self.key_col = key_col
        self.value_col = value_col

    def _aggregate(self, batch: DataFrame) -> DataFrame:
        return (
            batch.withColumn("day", F.date_trunc("day", F.col("ts")))
            .groupBy("day", self.key_col)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum(self.value_col), 2).alias("total"),
                F.min(self.value_col).alias("vmin"),
                F.max(self.value_col).alias("vmax"),
            )
        )

    def refresh(self, events: DataFrame, batch: DataFrame) -> None:
        """Recompute only the days touched by ``batch`` from ``events`` (the
        full source for those days) and overwrite exactly those partitions.

        ``events`` is the system of record; ``batch`` just names the dirty
        days — so late rows for an old day correctly trigger that day's
        recompute (the batch-side analog of watermark-window invalidation).
        """
        dirty_days = [
            r["day"]
            for r in batch.select(
                F.date_trunc("day", F.col("ts")).alias("day")
            ).distinct().collect()
        ]
        if not dirty_days:
            return
        fresh = self._aggregate(self._dirty_slice(events, dirty_days))
        prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            fresh.write.mode("overwrite").partitionBy("day").parquet(self.path)
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    @staticmethod
    def _dirty_slice(events: DataFrame, dirty_days: list) -> DataFrame:
        """Restrict ``events`` to the dirty days. When the record store
        carries a ``day_p`` DATE partition column (streaming/rollup_sink.py
        lands batches partitioned by day), the filter reaches the scan as a
        PartitionFilter and the recompute reads ONLY the touched day
        directories — O(batch + dirty days), never O(history). A
        date_trunc(ts) predicate could not prune (it is a function of a data
        column), so that form is only the fallback for unpartitioned
        sources."""
        if "day_p" in events.columns:
            return events.filter(
                F.col("day_p").isin([d.date() for d in dirty_days])
            ).drop("day_p")
        return events.filter(F.date_trunc("day", F.col("ts")).isin(dirty_days))

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)
