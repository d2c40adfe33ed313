"""Growth probe for the COMPOSED streaming VECTOR ingest
(streaming/ingest_vectors.py): per-batch wall must stay FLAT as the vec
store, the SemDeDup membership, and the IVF-PQ index grow — the gate is
O(batch + pruned cluster members) and every append is bucket/list-
pruned, so batch k should cost the same as batch 1 even though the
archive now holds k-1 batches.  Finishes with a full re-delivery of the
last batch (the at-least-once restart case): the gate re-counts
advisorily, nothing appends anywhere.

Method: split the embeddings corpus into K equal batches by id % K;
seed all three artifacts from batch 0 (vec store + membership-bearing
SemDeDup index + IVF-PQ), then push batches 1..K-1 through ONE
maintain_vector_ingest closure with the gate on at an exact-copy
threshold (organic vectors pass; the gate still pays its real probe
cost per batch), timing each call.  Ledger conservation
(rows == neardup + appended + skipped) is asserted at the end.

Run: python tools/vector_ingest_probe.py [SF_DIR] [K]
Output: one JSON line per batch + a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hnarchive_spark.plans.similarity import KMEANS_ITERS, KMEANS_K, PQ_ITERS, PQ_K, PQ_M
from hnarchive_spark.scratch import scratch_dir
from hnarchive_spark.session import get_spark
from hnarchive_spark.sources.ann_index import build_ivfpq_index
from hnarchive_spark.sources.semdedup_index import build_semdedup_index
from hnarchive_spark.sources.vec_store import build_vec_store, read_vec_store
from hnarchive_spark.streaming.index_maint import _MAINT_STATS
from hnarchive_spark.streaming.ingest_vectors import maintain_vector_ingest
from hnarchive_spark.tables import load

T_EXACT_E6 = 1_000_000  # exact-copy gate: organic vectors pass, probe still runs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("vector-ingest-probe")
    spark.sparkContext.setLogLevel("ERROR")

    e = load(spark, sf_dir, "embeddings")
    root = scratch_dir("vingest_probe")
    vs = os.path.join(root, "vs")
    sd = os.path.join(root, "sd")
    ivf = os.path.join(root, "ivf")

    batch0 = e.filter(F.col("vec_id") % k == 0)
    build_vec_store(spark, batch0, vs)
    build_semdedup_index(
        spark, batch0, sd, KMEANS_K, KMEANS_ITERS, store_assignments=True
    )
    build_ivfpq_index(batch0, ivf, PQ_M, PQ_K, PQ_ITERS)
    print(json.dumps({"seed_batch": 0, "rows": batch0.count()}), flush=True)

    process = maintain_vector_ingest(
        vs,
        ivfpq_path=ivf,
        n_sub=PQ_M,
        semdedup_index_path=sd,
        t_e6=T_EXACT_E6,
    )
    # the production loop includes the SCHEDULER: appends accrete one
    # file per touched bucket per batch, and the gate's archive read +
    # the presence checks open every file — without compaction the
    # per-batch wall creeps with FILE COUNT (not rows).  Compact the
    # vec store on the standard batch budget, exactly what
    # run_maintenance does from the same ledger.
    from hnarchive_spark.sources.index_version import prune_index_versions
    from hnarchive_spark.sources.vec_store import compact_vec_store

    compact_every = 3
    walls = []
    for b in range(1, k):
        batch = e.filter(F.col("vec_id") % k == b)
        t0 = time.perf_counter()
        appended = process(batch, batch_id=b)
        wall = time.perf_counter() - t0
        walls.append(wall)
        line = {
            "batch": b,
            "rows": batch.count(),
            "appended": appended,
            "wall": round(wall, 3),
            "store_rows": read_vec_store(spark, vs).count(),
        }
        if b % compact_every == 0:
            t0 = time.perf_counter()
            compact_vec_store(spark, vs)
            prune_index_versions(vs)
            line["compact_wall"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(line), flush=True)

    # at-least-once extreme: full re-delivery of the last batch
    last = e.filter(F.col("vec_id") % k == k - 1)
    t0 = time.perf_counter()
    reappended = process(last, batch_id=k - 1)
    rewall = time.perf_counter() - t0

    with open(os.path.join(vs, _MAINT_STATS)) as fh:
        st = json.load(fh)
    conserved = st["vingest_rows"] == (
        st.get("vingest_neardup", 0)
        + st["vingest_appended"]
        + st["vingest_skipped"]
    )
    print(
        json.dumps(
            {
                "summary": True,
                "first_batch_wall": round(walls[0], 3),
                "last_batch_wall": round(walls[-1], 3),
                "growth_ratio": round(walls[-1] / walls[0], 3),
                "redelivery_appended": reappended,
                "redelivery_wall": round(rewall, 3),
                "ledger": st,
                "ledger_conserved": conserved,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
