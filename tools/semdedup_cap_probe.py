"""Adversarial probe for the SemDeDup hot-cluster cap (max_pivots):
synthesize the exact corpus the cap exists for — one degenerate cluster
of near-identical vectors — and measure the within-cluster pair join
capped vs uncapped on the SAME (checkpointed) assignment.

The claim under test: uncapped, a degenerate cluster of c vectors costs
c*(c-1)/2 cosine pairs (quadratic — the 100 TB scale-killer); capped at
P pivots it costs <= P*c (linear), while the DROP SET is unchanged
(every non-pivot vector still matches pivot #1 at cosine ~1 — the cap
bounds pair count, not dedup coverage; only attribution can shift to an
earlier neighbor).

Run: python tools/semdedup_cap_probe.py [n_degenerate] [n_background]
Prints one JSON line with structural pair counts (from the realized
cluster sizes), measured walls, and the coverage-equality check.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from pyspark.sql import functions as F

from hnarchive_spark.operators.kmeans import kmeans_assign
from hnarchive_spark.operators.similarity import semdedup_prune
from hnarchive_spark.plans.similarity import (
    KMEANS_ITERS,
    KMEANS_K,
    SEMDEDUP_MAX_PIVOTS,
    SEMDEDUP_T_E6,
)
from hnarchive_spark.session import get_spark

DIM = 64


def main() -> None:
    n_deg = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    n_bg = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    p = SEMDEDUP_MAX_PIVOTS
    spark = get_spark("semdedup-cap-probe")
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(14)
    deg = np.tile(np.eye(1, DIM, 0), (n_deg, 1)) + rng.normal(0, 1e-4, (n_deg, DIM))
    bg = rng.normal(0, 1.0, (n_bg, DIM))
    vecs = np.vstack([deg, bg])
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # train once, checkpoint the assignment so both prune runs time ONLY
    # the pair join (the operator under test), not the clustering
    assign = kmeans_assign(e, KMEANS_K, KMEANS_ITERS, keep_vec=True)
    assign = assign.localCheckpoint(eager=True)
    sizes = [
        r["c"]
        for r in assign.groupBy("list_id").agg(F.count(F.lit(1)).alias("c")).collect()
    ]
    pairs_uncapped = sum(c * (c - 1) // 2 for c in sizes)
    pairs_capped = sum(sum(c - i for i in range(1, min(p, c) + 1)) for c in sizes)

    t0 = time.perf_counter()
    capped = semdedup_prune(assign, SEMDEDUP_T_E6, max_pivots=p).collect()
    wall_capped = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    uncapped = semdedup_prune(assign, SEMDEDUP_T_E6).collect()
    wall_uncapped = round(time.perf_counter() - t0, 2)

    # decompose coverage: in the DEGENERATE cluster the cap must lose
    # nothing (every later vector matches pivot #1 at cosine ~1); in the
    # background clusters the cap trades recall for the linear bound —
    # the same candidate-loss trade q_embed_dup_capped makes per bucket
    deg_un = {r["vec_id"] for r in uncapped if r["vec_id"] < n_deg}
    deg_cap = {r["vec_id"] for r in capped if r["vec_id"] < n_deg}
    print(
        json.dumps(
            {
                "n_degenerate": n_deg,
                "n_background": n_bg,
                "max_pivots": p,
                "cluster_sizes": sorted(sizes, reverse=True),
                "pairs_uncapped": pairs_uncapped,
                "pairs_capped": pairs_capped,
                "pair_ratio": round(pairs_uncapped / max(pairs_capped, 1), 1),
                "wall_uncapped_s": wall_uncapped,
                "wall_capped_s": wall_capped,
                "drops_uncapped": len(uncapped),
                "drops_capped": len(capped),
                "degenerate_drops_uncapped": len(deg_un),
                "degenerate_drops_capped": len(deg_cap),
                "degenerate_coverage_preserved": deg_un == deg_cap
                and len(deg_cap) == n_deg - 1,
                "background_drops_uncapped": len(uncapped) - len(deg_un),
                "background_drops_capped": len(capped) - len(deg_cap),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
