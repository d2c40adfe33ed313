"""Arrow-vectorized argmin A/B (VERDICT r18 #4, guide §4.2).

Equality sweep: for each SF dir, run the full kmeans_assign and pq_assign
chains under BOTH implementations (operators/kmeans.ARGMIN_IMPL "fold" =
the r18 literal HOF fold, "arrow" = the numpy pandas-UDF argmin) in ONE
process and assert row-for-row identical outputs — the decisive check that
the exactness contract (_np_round6_e6 / _np_argmin docstrings) holds on
every actual fixture value.

Timing: run tools/isolated_probe.py twice in SEPARATE processes with
SPARK_GRAFT_ARGMIN_IMPL=fold|arrow (interleaved, with a code-untouched
control query — the BENCH_NOTES adjudication recipe).

Run: python tools/argmin_arrow_probe.py [sf_dirs...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hnarchive_spark.session import get_spark


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("argmin-arrow-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from hnarchive_spark.operators import kmeans as K
    from hnarchive_spark.plans.similarity import (
        KMEANS_ITERS,
        KMEANS_K,
        PQ_ITERS,
        PQ_K,
        PQ_M,
    )

    out: dict = {}
    for sf_dir in sf_dirs:
        e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        res = {}
        for impl in ("fold", "arrow"):
            K.ARGMIN_IMPL = impl
            km = sorted(
                tuple(r) for r in K.kmeans_assign(e, KMEANS_K, KMEANS_ITERS).collect()
            )
            pq = sorted(
                tuple(r) for r in K.pq_assign(e, PQ_M, PQ_K, PQ_ITERS).collect()
            )
            res[impl] = (km, pq)
        km_eq = res["fold"][0] == res["arrow"][0]
        pq_eq = res["fold"][1] == res["arrow"][1]
        out[sf_dir] = {
            "kmeans_rows": len(res["fold"][0]),
            "kmeans_equal": km_eq,
            "pq_rows": len(res["fold"][1]),
            "pq_equal": pq_eq,
        }
        if not (km_eq and pq_eq):
            bad = [
                (a, b)
                for a, b in zip(res["fold"][0], res["arrow"][0])
                if a != b
            ][:5]
            out[sf_dir]["first_kmeans_diffs"] = bad
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
