"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[32]; the config choices below are the ones that
matter at cluster scale and are harmless locally:

* AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  at 100 TB the static shuffle-partition guess is always wrong; AQE fixes it.
* Arrow enabled — every Pandas UDF crossing is Arrow-batched, never per-row.
* UTC session timezone — deterministic timestamp semantics vs the oracle.
* shuffle.partitions sized by env (driver runs 32 cores; a real cluster
  would set this to ~2-3x total cores or rely on AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hnarchive-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Parquet scan efficiency: vectorized reader + pushdown are defaults,
        # stated here because the engine depends on them (SURVEY §4).
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
