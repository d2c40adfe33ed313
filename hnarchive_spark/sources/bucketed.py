"""Bucketed-table layout: pre-shuffle a join's both sides ONCE at write
time so every later join on the bucket key runs shuffle-free.

This is the physical-design answer to "we join these two tables on this
key every day": `df.write.bucketBy(N, key).sortBy(key).saveAsTable(...)`
hashes rows into N bucket files per side at WRITE time and records the
bucket spec in the catalog.  A later equi-join of two tables bucketed to
the SAME N on the join key satisfies both children's required
distribution straight off the scan — the sort-merge join plans with NO
Exchange under it (and with one file per bucket + sortBy, no Sort
either).  At 100 TB this converts the daily fact-to-fact shuffle
(terabytes over the wire, the single most expensive stage in a
warehouse) into a one-time layout cost amortized over every subsequent
join, exactly like Hive bucketed tables / Iceberg bucket partition
transforms.

Complements `sources/zorder.py` (which optimizes SCANS via file-level
min/max pruning); bucketing optimizes JOINS via co-partitioning.  Both
are write-time layout decisions checked here by plan shape, not by
faith: tests/test_bucketed.py asserts the joined plan has no exchange
below the join and that the scans report their bucket selection.

Spark specifics worth recording:
* bucketed writes must go through ``saveAsTable`` (the bucket spec lives
  in the catalog, not in parquet footers) — ``option("path", ...)``
  makes the table external so the files land in our scratch dir;
* both sides must agree on the bucket COUNT (Spark joins two bucketed
  tables shuffle-free only when the counts match; a mismatch
  re-shuffles the smaller side);
* ``spark.sql.sources.bucketing.enabled`` is true by default.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hnarchive_spark.scratch import scratch_dir
from hnarchive_spark.tables import load

N_BUCKETS = 8


def _tag(sf_dir: str) -> str:
    return hashlib.sha256(os.path.realpath(sf_dir).encode()).hexdigest()[:12]


def bucketed_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Ensure orders + lineitem exist as co-bucketed catalog tables for
    ``sf_dir``; returns their table names.  Idempotent per session: the
    catalog check makes repeat invocations (bench warmup, parity sweep,
    driver) reuse the one layout, mirroring scratch.built_once."""
    tag = _tag(sf_dir)
    name_o, name_li = f"orders_b_{tag}", f"lineitem_b_{tag}"
    if spark.catalog.tableExists(name_o) and spark.catalog.tableExists(name_li):
        return name_o, name_li
    base = scratch_dir(f"bucketed_{os.path.basename(os.path.normpath(sf_dir))}_{tag}")
    (
        load(spark, sf_dir, "orders")
        .write.format("parquet")
        .bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", os.path.join(base, "orders_b"))
        .mode("overwrite")
        .saveAsTable(name_o)
    )
    (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("price_c"),
            F.round(F.col("l_discount") * 100, 0).cast("long").alias("disc_pct"),
        )
        .write.format("parquet")
        .bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", os.path.join(base, "lineitem_b"))
        .mode("overwrite")
        .saveAsTable(name_li)
    )
    return name_o, name_li
