"""Persisted SemDeDup centroid index — the frozen-quantizer form of
semantic dedup (`q_semdedup` retrains k-means per invocation; the
indexed twin `q_semdedup_indexed` assigns the corpus to CENTROIDS READ
FROM THIS STORE, so query time spends zero work on training — the same
inline-vs-production split the IVF/IVF-PQ/BM25 families already have).

Layout (versioned behind the atomic ``_CURRENT`` pointer):

* ``<root>/centroids`` — the (list_id, centroid array<double>) rows the
  training run's FINAL assignment pass scored against (k rows — the
  whole index is broadcast-scalar), written once at build;
* ``<root>/_META.json`` — k and iters, so a rebuild retrains with the
  same recipe.

The determinism contract rides on :func:`operators.kmeans`'s shared
scoring step: a frozen assignment against these centroids reproduces
the training run's final assignment bit-for-bit (6-decimal rounded
distances, list-id tiebreak), which is what lets the probe share the
inline query's unrolled-Lloyd DuckDB oracle.

Lifecycle: clustering quality drifts as the corpus grows past the
training sample — :func:`rebuild_semdedup_index` retrains into
``<path>/v<N>`` and publishes at the pointer swap, the exact discipline
of ``rebuild_ivfpq_index``.  There is no append verb: the index IS the
k-row centroid table (new vectors need no index write to be probed —
they simply assign against the frozen centroids), so the only
maintenance is the scheduled rebuild.

At 100 TB: the probe is ONE broadcast-join pass over the corpus plus
the within-cluster pair join (quadratic bounded per cluster; k grows
with the corpus — SemDeDup's own recipe, ~0.1% of n — keeping per-
cluster pair counts flat), and only k x dim doubles ever sit in the
index.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from hnarchive_spark.operators.kmeans import kmeans_assign, kmeans_assign_frozen
from hnarchive_spark.operators.similarity import semdedup_prune
from hnarchive_spark.sources.index_version import (
    current_index_version,
    index_root,
    publish_index_version,
)


def _centroids_path(path: str) -> str:
    return os.path.join(index_root(path), "centroids")


def _write_meta(root: str, k: int, iters: int) -> None:
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, "_META.json.tmp")
    with open(tmp, "w") as fh:
        json.dump({"k": int(k), "iters": int(iters)}, fh)
    os.replace(tmp, os.path.join(root, "_META.json"))


def read_meta(path: str) -> dict:
    with open(os.path.join(index_root(path), "_META.json")) as fh:
        return json.load(fh)


def _train_and_write(
    spark: SparkSession,
    vectors: DataFrame,
    root: str,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
) -> int:
    _assign, cents = kmeans_assign(
        vectors, k, iters, id_col=id_col, vec_col=vec_col, return_centroids=True
    )
    cent_df = spark.createDataFrame(
        [(r["list_id"], r["centroid"]) for r in cents],
        "list_id long, centroid array<double>",
    )
    cent_df.coalesce(1).write.mode("overwrite").parquet(os.path.join(root, "centroids"))
    _write_meta(root, k, iters)
    return len(cents)


def build_semdedup_index(
    spark: SparkSession,
    vectors: DataFrame,
    path: str,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Train on the given corpus sample and persist the frozen centroids;
    returns the number of (non-empty) centroids written."""
    os.makedirs(path, exist_ok=True)
    return _train_and_write(spark, vectors, path, k, iters, id_col, vec_col)


def semdedup_probe(
    spark: SparkSession,
    vectors: DataFrame,
    path: str,
    t_e6: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_pivots: int | None = None,
) -> DataFrame:
    """SemDeDup drops for a corpus against the FROZEN centroids: one
    broadcast assignment pass (zero training) + the shared within-cluster
    prune.  Probing the training corpus itself reproduces the inline
    q_semdedup rows exactly (shared oracle).  ``max_pivots`` passes the
    hot-cluster skew guard through to the prune (see semdedup_prune)."""
    cents = spark.read.parquet(_centroids_path(path))
    assign = kmeans_assign_frozen(
        vectors, cents, id_col=id_col, vec_col=vec_col, keep_vec=True
    )
    return semdedup_prune(assign, t_e6, max_pivots=max_pivots)


def rebuild_semdedup_index(
    spark: SparkSession,
    vectors: DataFrame,
    path: str,
    k: int | None = None,
    iters: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Retrain on the (grown) corpus into ``<path>/v<N>`` and publish at
    the atomic pointer swap — the drift answer.  k/iters default to the
    published recipe.  Returns the new version directory."""
    meta = read_meta(path)
    k = int(k if k is not None else meta["k"])
    iters = int(iters if iters is not None else meta["iters"])
    new_v = (current_index_version(path) or 0) + 1
    vdir = os.path.join(path, f"v{new_v}")
    _train_and_write(spark, vectors, vdir, k, iters, id_col, vec_col)
    publish_index_version(path, new_v)
    return vdir
