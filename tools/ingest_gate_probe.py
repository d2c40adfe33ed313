"""Growth probe for the COMPOSED streaming ingest gate
(streaming/ingest.py): per-batch wall must stay FLAT as the store and
the MinHash archive grow — every stage is O(batch + pruned candidates),
so batch k should cost the same as batch 1 even though the archive now
holds k-1 batches.  Finishes with a full re-delivery of the last batch
(the at-least-once restart case): gates re-count advisorily, the merge
must append nothing.

Method: split the documents corpus into K equal batches by id % K;
build the contamination index from a disjoint synthetic eval set and
the MinHash index + store seed from batch 0 (through the verb itself),
then push batches 1..K-1 through ONE maintain_ingest closure with all
four stages on, timing each call.  Ledger conservation is asserted at
the end (rows == sum of fates).

Run: python tools/ingest_gate_probe.py [SF_DIR] [K]
Output: one JSON line per batch + a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hnarchive_spark.scratch import scratch_dir
from hnarchive_spark.session import get_spark
from hnarchive_spark.sources.contamination_index import build_contamination_index
from hnarchive_spark.sources.minhash_index import build_minhash_index
from hnarchive_spark.streaming.index_maint import maintenance_stats
from hnarchive_spark.streaming.ingest import maintain_ingest, read_ingested_docs
from hnarchive_spark.tables import load


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("ingest-gate-probe")
    spark.sparkContext.setLogLevel("ERROR")

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    root = scratch_dir("ingest_probe")
    store = os.path.join(root, "store")
    mh = os.path.join(root, "mh")
    ct = os.path.join(root, "ct")

    # disjoint synthetic eval set (so the contamination stage probes a
    # real index without rejecting the whole corpus)
    ev = spark.range(64).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(f"evw{j}x"), F.col("id").cast("string")) for j in range(12)],
        ).alias("text"),
    )
    build_contamination_index(spark, ev, ct)

    batch0 = d.filter(F.col("doc_id") % k == 0)
    build_minhash_index(spark, batch0, mh)
    seeded = maintain_ingest(store, minhash_index_path=mh)(batch0, batch_id=0)
    print(json.dumps({"seed_batch": 0, "merged": seeded}), flush=True)

    process = maintain_ingest(
        store,
        quality_threshold_e4=1,  # gate on, nothing plausibly rejected
        contamination_index_path=ct,
        contamination_threshold_e4=0,
        minhash_index_path=mh,
        jaccard_threshold=0.8,
    )
    walls = []
    for b in range(1, k):
        batch = d.filter(F.col("doc_id") % k == b)
        t0 = time.perf_counter()
        merged = process(batch, batch_id=b)
        wall = time.perf_counter() - t0
        walls.append(wall)
        print(
            json.dumps(
                {
                    "batch": b,
                    "rows": batch.count(),
                    "merged": merged,
                    "wall": round(wall, 3),
                    "store_rows": read_ingested_docs(spark, store).count(),
                }
            ),
            flush=True,
        )

    # at-least-once extreme: full re-delivery of the last batch
    last = d.filter(F.col("doc_id") % k == k - 1)
    t0 = time.perf_counter()
    remerged = process(last, batch_id=k - 1)
    rewall = time.perf_counter() - t0

    st = maintenance_stats(store)
    conserved = st["ingest_rows"] == (
        st.get("ingest_unscored", 0)
        + st.get("ingest_quality_rejected", 0)
        + st.get("ingest_contaminated", 0)
        + st.get("ingest_neardup", 0)
        + st["ingest_merged"]
        + st["ingest_skipped"]
    )
    print(
        json.dumps(
            {
                "summary": True,
                "first_batch_wall": round(walls[0], 3),
                "last_batch_wall": round(walls[-1], 3),
                "growth_ratio": round(walls[-1] / walls[0], 3),
                "redelivery_merged": remerged,
                "redelivery_wall": round(rewall, 3),
                "ledger": st,
                "ledger_conserved": conserved,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
