"""Multimodal query: binary-payload plumbing through an Arrow-batched decode
stub. The oracle reproduces the stub arithmetic from octet_length, so the
whole path (binary encode -> mapInPandas -> metadata) is value-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from hnarchive_spark.operators.multimodal import (
    attach_payload,
    decode_media,
    extract_features,
    resize_media,
    sample_frames,
)
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


@query(
    "q_multimodal_frames",
    oracle="""
    WITH m AS (
      SELECT doc_id, octet_length(encode(text)) AS n FROM documents
    ),
    f AS (
      SELECT doc_id, n, n % 30 + 1 AS n_frames, n // (n % 30 + 1) AS stride FROM m
    ),
    idx AS (
      SELECT doc_id, stride, unnest(range(0, n_frames)) AS frame_idx FROM f
    )
    SELECT doc_id, frame_idx, frame_idx * stride AS frame_offset,
           stride AS frame_len
    FROM idx
    """,
    doc="Frame sampling: per-payload row explosion inside the Arrow kernel "
    "(stub decoder slices at fixed strides; a real kernel would seek+decode). "
    "Binary frame slices flow in the output batch; the oracle checks the "
    "sampling arithmetic.",
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return sample_frames(attach_payload(d)).select(
        "doc_id", "frame_idx", "frame_offset", "frame_len"
    )


@query(
    "q_multimodal_resize",
    oracle="""
    WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
    SELECT doc_id,
           n % 640 AS width,
           (n * 7) % 480 AS height,
           64 AS target_w, 48 AS target_h,
           least(((n - 1) // greatest(n // 3072, 1)) + 1, 3072) AS resized_len
    FROM m
    """,
    doc="Resize kernel (stub strided resample; a real kernel swaps in "
    "PIL/cv2): binary in, binary out through mapInPandas; the oracle checks "
    "dims + resampled length arithmetic.",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    resized = resize_media(attach_payload(d))
    return resized.select(
        "doc_id",
        "width",
        "height",
        "target_w",
        "target_h",
        F.octet_length("resized_bytes").cast("long").alias("resized_len"),
    )


@query(
    "q_multimodal_features",
    oracle="""
    WITH chars AS (
      SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM documents
    ),
    binned AS (
      SELECT doc_id, ascii(substr(text, i, 1)) % 8 AS dim, count(*) AS value
      FROM chars GROUP BY doc_id, dim
    ),
    dims AS (SELECT unnest(range(0, 8)) AS dim),
    docs AS (SELECT DISTINCT doc_id FROM documents)
    SELECT d.doc_id, dims.dim, coalesce(b.value, 0) AS value
    FROM docs d CROSS JOIN dims
    LEFT JOIN binned b ON b.doc_id = d.doc_id AND b.dim = dims.dim
    """,
    doc="Feature extraction: numpy byte-histogram (8 bins) per payload inside "
    "the Arrow kernel — the embedding-model stand-in; exploded (doc, dim, "
    "value) output keeps downstream joins columnar. Oracle reproduces the "
    "histogram from character codes (payloads are utf-8 of ascii text).",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return extract_features(attach_payload(d))


@query(
    "q_multimodal_dedup",
    oracle="""
    WITH h AS (
      -- DuckDB md5() takes VARCHAR (hashes its utf-8 bytes) = Spark's
      -- md5(encode(text,'utf-8')) over the BINARY payload
      SELECT doc_id, md5(text) AS content_hash,
             octet_length(encode(text)) AS byte_len
      FROM documents
    )
    SELECT content_hash, min(byte_len) AS byte_len,
           min(doc_id) AS keep_doc_id, count(*) AS n_copies
    FROM h GROUP BY content_hash
    """,
    doc="Exact content-hash dedup over the opaque BINARY payload (the "
    "image/audio/video analog of text exact-dedup): md5 of the raw bytes "
    "— never a decode — groups identical assets regardless of filename "
    "or metadata, keeping the smallest doc_id. One shuffle on the 128-bit "
    "hash; at 100 TB the hash computes in the scan projection and only "
    "(hash, id, len) rows ever move, so dedup cost is independent of "
    "asset size. byte_len rides along as the audit column (all copies "
    "share it by construction).",
)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    withp = attach_payload(d)
    return (
        withp.select(
            "doc_id",
            F.md5(F.col("payload")).alias("content_hash"),
            F.octet_length(F.col("payload")).cast("long").alias("bl"),
        )
        .groupBy("content_hash")
        .agg(
            F.min("bl").alias("byte_len"),
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
