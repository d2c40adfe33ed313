"""Persisted ANN index: LSH bucket as a PARTITION column on disk.

The search-time operators in ``operators/similarity.py`` compute hyperplane
sign signatures on the fly; at 100 TB the index is built ONCE and the
signature becomes the physical partition key, so a probe reads only its
bucket's files (1/256th of the corpus at uniform spread) via partition
pruning — the same plan shape as an IVF list keyed by centroid id.

* ``build_index`` — one pass over the corpus: signature + norm computed
  per vector, written partitioned by ``bucket`` (zstd parquet).  The norm
  is materialized with the vector so probes never recompute it (the
  index-build-time cost amortizes over every query).
* ``probe_topk`` — broadcast the query set (with their buckets), join on
  the bucket partition column, exact cosine inside the bucket only.
  ``.explain`` shows ``PartitionFilters: [bucket IN (...)]`` when the
  query-side buckets are pushed as an IN filter (done here by collecting
  the handful of query buckets — the query SET is small by contract).

Results are identical to the on-the-fly ``lsh_topk`` (same deterministic
hyperplanes) — locked by tests and by sharing the q_ann_lsh oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hnarchive_spark.operators.similarity import (
    DIM,
    as_double,
    cosine,
    dot,
    lsh_signature,
    norm,
)


def build_index(
    embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Write the bucket-partitioned ANN index (one corpus pass)."""
    (
        embeddings.select(
            F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v")
        )
        .withColumn("n", norm(F.col("v")))
        .withColumn("bucket", lsh_signature(F.col("v")))
        .repartition("bucket")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .partitionBy("bucket")
        .parquet(path)
    )


def probe_topk(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k per query against the persisted index, bucket-pruned.

    The query set is small by contract (it is broadcast); its distinct
    buckets become a pushed-down partition filter, so only those bucket
    directories are scanned.
    """
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
        )
        .withColumn("bucket", lsh_signature(F.col("qv")))
        .withColumn("qn", norm(F.col("qv")))
    )
    buckets = [r["bucket"] for r in q.select("bucket").distinct().collect()]
    idx = spark.read.parquet(index_path).filter(F.col("bucket").isin(buckets))
    scored = (
        idx.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("n")) * 1_000_000, 0)
            .cast("long")
            .alias("cos_e6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_e6").desc(), F.col("neighbor_id"))
    return scored.select("*", F.row_number().over(w).alias("rank")).filter(
        F.col("rank") <= k
    )


def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "label",
) -> None:
    """Write the IVF index: list-partitioned vectors + persisted centroids.

    The on-the-fly ``ivf_topk`` recomputes the per-list centroids with a
    corpus-wide aggregate on EVERY query batch — fine at bench scale, a
    100 TB-scale bug.  Here both index artifacts are built once:

    * ``<path>/lists`` — (vec_id, v, n) partitioned by ``list_id`` (the
      k-means assignment), so a probe reads only its lists' files;
    * ``<path>/centroids`` — n_lists rows of (list_id, centroid), the
      coarse quantizer, loaded (tiny) at query time for routing.
    """
    e = (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            as_double(F.col(vec_col)).alias("v"),
            F.col(list_col).alias("list_id"),
        )
        .withColumn("n", norm(F.col("v")))
    )
    (
        e.repartition("list_id")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .partitionBy("list_id")
        .parquet(f"{path}/lists")
    )
    dim_cols = [F.avg(F.col("v")[i]).alias(f"c{i}") for i in range(DIM)]
    (
        e.groupBy("list_id")
        .agg(*dim_cols)
        .select("list_id", F.array(*[F.col(f"c{i}") for i in range(DIM)]).alias("centroid"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/centroids")
    )


def append_ivf_index(
    spark,
    batch: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental IVF maintenance: add a batch WITHOUT rebuilding.

    The batch is assigned to the FROZEN persisted centroids (nearest by
    6-decimal-rounded cosine, list-id tiebreak — the same routing metric
    probes use) and its rows are APPENDED into the existing ``list_id``
    partitions.  Cost is O(batch): no corpus rescan, no centroid
    recompute, and every pre-existing index file is left byte-untouched
    (locked by tests/test_ann_append.py).  This is the standard IVF
    ingest pattern at scale — centroid drift from accumulated appends is
    handled by a periodic full rebuild, not per-batch."""
    centroids = spark.read.parquet(f"{path}/centroids")
    b = batch.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("n", norm(F.col("v")))
    scored = b.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "v",
        "n",
        "list_id",
        F.round(cosine(F.col("v"), F.col("centroid")) * 1_000_000, 0).cast("long").alias("ccos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("list_id"))
    assigned = (
        scored.select(
            "vec_id", "v", "n", "list_id", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "n", "list_id")
    )
    (
        assigned.repartition("list_id")
        .write.mode("append")
        .option("compression", "zstd")
        .partitionBy("list_id")
        .parquet(f"{path}/lists")
    )


def probe_ivf_topk(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k per query against the persisted IVF index.

    Routing uses the PERSISTED centroids (no corpus aggregate at query
    time); the probed list ids become a pushed-down partition filter on
    ``<path>/lists``, so only those lists' files are scanned — the same
    plan shape as ``probe_topk`` for LSH.  Results are identical to the
    on-the-fly ``ivf_topk`` (same centroid means, cosine rounded to 6
    decimals before ranking), so it shares the same oracle.
    """
    centroids = spark.read.parquet(f"{index_path}/centroids")
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    routed = q.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "qv",
        "qn",
        "list_id",
        F.round(cosine(F.col("qv"), F.col("centroid")) * 1_000_000, 0).cast("long").alias("ccos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("list_id"))
    probes = routed.select(
        "query_id", "qv", "qn", "list_id", F.row_number().over(w).alias("pr")
    ).filter(F.col("pr") <= n_probe)
    lists = [r["list_id"] for r in probes.select("list_id").distinct().collect()]
    idx = spark.read.parquet(f"{index_path}/lists").filter(F.col("list_id").isin(lists))
    scored = (
        idx.join(F.broadcast(probes), "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("n")) * 1_000_000, 0)
            .cast("long")
            .alias("cos_e6"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("cos_e6").desc(), F.col("neighbor_id"))
    return scored.select("*", F.row_number().over(wk).alias("rank")).filter(
        F.col("rank") <= k
    )
