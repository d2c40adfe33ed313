"""Multimodal query: binary-payload plumbing through an Arrow-batched decode
stub. The oracle reproduces the stub arithmetic from octet_length, so the
whole path (binary encode -> mapInPandas -> metadata) is value-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hnarchive_spark.operators.multimodal import attach_payload, decode_media
from hnarchive_spark.plans.registry import query
from hnarchive_spark.tables import load


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           octet_length(encode(text)) % 640 AS width,
           (octet_length(encode(text)) * 7) % 480 AS height,
           octet_length(encode(text)) % 30 + 1 AS n_frames
    FROM documents
    """,
    doc="Multimodal plumbing: opaque binary payload + typed metadata struct, "
    "decoded via Arrow-batched mapInPandas (stub decoder — see "
    "operators/multimodal.py; the Spark-side schema/batching/partitioning "
    "is real).",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return decode_media(attach_payload(d))
