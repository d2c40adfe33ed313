"""Measure the SemDeDup membership table's O(batch) maintenance claim
(the scd2 wide-cardinality methodology applied to cluster membership):
at the fixture's k=8 every batch touches every cluster, so the
cluster-pruned presence anti-join in ``append_semdedup_index`` can't
show its pruning.  Here k=64 well-separated clusters (one-hot centers,
ids arranged so kmeans' k-smallest-ids init lands one per cluster) and
SAME-SIZED batches (256 vectors) are engineered to land in 1/4/16/64
clusters — if the pruning is real, append wall tracks TOUCHED CLUSTERS
at constant batch size and constant archive size, and a fully
re-delivered batch appends nothing.

Run: python tools/semdedup_maint_probe.py [n_per_cluster]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hnarchive_spark.session import get_spark
from hnarchive_spark.sources.semdedup_index import (
    append_semdedup_index,
    build_semdedup_index,
)

DIM = 64
K = 64


def _vecs(spark, ids_and_clusters, rng):
    rows = [
        (int(i), [float(x) for x in (np.eye(1, DIM, c % K)[0] + rng.normal(0, 1e-3, DIM))])
        for i, c in ids_and_clusters
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def main() -> None:
    per = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    spark = get_spark("semdedup-maint-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(14)
    # seed ids 0..K*per-1 with cluster = id % K: ids 0..63 are one per
    # cluster, so the k-smallest-ids init starts at the 64 centers and
    # Lloyd converges immediately — frozen assignment routes by center
    seed = _vecs(spark, [(i, i % K) for i in range(K * per)], rng)
    tmp = tempfile.mkdtemp(prefix="semdedup_probe_")
    out: dict = {"k": K, "seed_vectors": K * per, "batch_size": 256}
    try:
        t0 = time.perf_counter()
        build_semdedup_index(spark, seed, tmp, K, 2, store_assignments=True)
        out["build_s"] = round(time.perf_counter() - t0, 2)
        next_id = K * per

        def _batch(t: int):
            nonlocal next_id
            pairs = [(next_id + j, j % t) for j in range(256)]
            next_id += 256
            return _vecs(spark, pairs, rng)

        # untimed warmup append absorbs one-time plan/JVM cost
        append_semdedup_index(spark, _batch(1), tmp)
        rows = []
        last = None
        for t in (1, 4, 16, 64):
            b = _batch(t)
            t0 = time.perf_counter()
            n = append_semdedup_index(spark, b, tmp)
            rows.append(
                {"clusters_touched": t, "appended": n,
                 "wall_s": round(time.perf_counter() - t0, 2)}
            )
            last = b
        out["appends"] = rows
        t0 = time.perf_counter()
        out["redeliver_appended"] = append_semdedup_index(spark, last, tmp)
        out["redeliver_s"] = round(time.perf_counter() - t0, 2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
