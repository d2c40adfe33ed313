"""The `items` data model (SURVEY.md §1; reference DDL hnarchive.py:34-60).

Two schemas:

* ``WIRE_SCHEMA`` — the Firebase API JSON payload shape consumed at
  hnarchive.py:119-131 (field ``by`` not yet renamed, epochs as longs,
  booleans absent-or-true).
* ``ITEMS_SCHEMA`` — the normalized store row (hnarchive.py:37-52), with the
  reference's int-encoded booleans promoted to BooleanType, ``parent``/``poll``
  promoted to LongType (the DDL says TEXT but values are JSON ints), and the
  engine-generated provenance columns ``retrieved`` and ``age_at_retrieval``.

``age_at_retrieval`` materializes the reference's expression index
``items(retrieved - time)`` (hnarchive.py:58) as a real column so parquet
min-max stats can skip files on it — Catalyst will not file-skip on an
arithmetic of two columns (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ITEM_TYPES = ("comment", "job", "poll", "pollopt", "story")

# Firebase wire payload (hnarchive.py:209-224 reads exactly these keys).
WIRE_SCHEMA = StructType(
    [
        StructField("id", LongType(), nullable=False),
        StructField("deleted", BooleanType(), nullable=True),
        StructField("type", StringType(), nullable=True),
        StructField("by", StringType(), nullable=True),
        StructField("time", LongType(), nullable=True),
        StructField("text", StringType(), nullable=True),
        StructField("dead", BooleanType(), nullable=True),
        StructField("parent", LongType(), nullable=True),
        StructField("poll", LongType(), nullable=True),
        StructField("url", StringType(), nullable=True),
        StructField("score", LongType(), nullable=True),
        StructField("title", StringType(), nullable=True),
        StructField("descendants", LongType(), nullable=True),
    ]
)

ITEMS_SCHEMA = StructType(
    [
        StructField("id", LongType(), nullable=False),
        StructField("deleted", BooleanType(), nullable=False),
        StructField("type", StringType(), nullable=True),
        StructField("author", StringType(), nullable=True),
        StructField("time", LongType(), nullable=True),
        StructField("text", StringType(), nullable=True),
        StructField("dead", BooleanType(), nullable=False),
        StructField("parent", LongType(), nullable=True),
        StructField("poll", LongType(), nullable=True),
        StructField("url", StringType(), nullable=True),
        StructField("score", LongType(), nullable=True),
        StructField("title", StringType(), nullable=True),
        StructField("descendants", LongType(), nullable=True),
        StructField("retrieved", LongType(), nullable=False),
        StructField("age_at_retrieval", LongType(), nullable=True),
    ]
)


def normalize_wire(df: DataFrame, retrieved_at: int) -> DataFrame:
    """Wire JSON rows -> normalized `items` rows (U3, hnarchive.py:203-229).

    * tombstone filter: a payload with no ``time`` is treated as nonexistent
      (hnarchive.py:125-130) and an API-null row never reaches here — both
      reduce to ``filter(time IS NOT NULL)`` (U2: deleted-item retention
      falls out because no tombstone row reaches the merge).
    * ``by`` -> ``author`` rename (hnarchive.py:213).
    * boolean coercion with False default (hnarchive.py:211,216).
    * ``retrieved`` stamped by the engine (hnarchive.py:205) and
      ``age_at_retrieval`` persisted for file-skipping (see module doc).
    """
    return df.filter(F.col("time").isNotNull()).select(
        F.col("id").cast("long").alias("id"),
        F.coalesce(F.col("deleted").cast("boolean"), F.lit(False)).alias("deleted"),
        F.col("type").cast("string").alias("type"),
        F.col("by").cast("string").alias("author"),
        F.col("time").cast("long").alias("time"),
        F.col("text").cast("string").alias("text"),
        F.coalesce(F.col("dead").cast("boolean"), F.lit(False)).alias("dead"),
        F.col("parent").cast("long").alias("parent"),
        F.col("poll").cast("long").alias("poll"),
        F.col("url").cast("string").alias("url"),
        F.col("score").cast("long").alias("score"),
        F.col("title").cast("string").alias("title"),
        F.col("descendants").cast("long").alias("descendants"),
        F.lit(retrieved_at).cast("long").alias("retrieved"),
        (F.lit(retrieved_at) - F.col("time")).cast("long").alias("age_at_retrieval"),
    )


def parse_wire_json(df: DataFrame, json_col: str = "payload") -> DataFrame:
    """Raw JSON-string column -> typed wire columns via from_json."""
    return df.select(F.from_json(F.col(json_col), WIRE_SCHEMA).alias("w")).select("w.*")
