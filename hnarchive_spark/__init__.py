"""hnarchive_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of voussoir/hnarchive, rebuilt Spark-first.

The reference (/root/reference/hnarchive.py) is a single-process Python +
SQLite incremental archival pipeline.  This package re-expresses every
capability it has — and the general relational / training-data-pipeline
surface a 100 TB deployment needs — as declarative DataFrame / Spark SQL /
Structured Streaming programs so Catalyst + Tungsten pick the physical plan.

Layout:
    session      SparkSession factory with scale-oriented defaults
    schema       the `items` table StructType + wire-JSON schema (SURVEY §1)
    tables       loaders for the driver's synthetic parquet tables
    functions/   scalar function library (SURVEY §2.6) + text/vector ops
    operators/   merge engine, tree closure, dedup, similarity, multimodal
    sources/     HN Firebase API batch/streaming sources (mockable transport)
    plans/       the named query library backing __spark_entry__.queries()
    streaming/   Structured Streaming pipelines (livestream / update analogs)
"""

from hnarchive_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
