"""Amplified-volume scaling probe for the join-shaped round-8 operators
(SCALE.md; VERDICT r8 next-round #6 asked for one more octave past the
round-8 4-5x runs).

Amplifies the sf0.1 inputs N-fold by id-offset union, writes them as a
scratch table directory, and times the REGISTERED queries on it — the
exact plan the driver runs, not a reimplementation:

* q_interval_overlap — orders amplified with DISJOINT custkeys/orderkeys
  per copy (organic growth: candidate volume should scale linearly);
* q_multimodal_phash_dup — documents amplified as EXACT COPIES under new
  doc_ids (adversarial: every band bucket holds N x the members, the
  within-bucket pair space grows ~N^2, and every pair is a real
  Hamming-0 duplicate, so output volume itself is ~N^2).

Run: python tools/amplify_probe.py [N] [sf_dir]   (default N=10, sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from hnarchive_spark.scratch import scratch_dir
from hnarchive_spark.session import get_spark
from hnarchive_spark.tables import load


def timed_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("amplify-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from hnarchive_spark.plans.registry import all_queries

    qs = all_queries()
    amp = scratch_dir(f"amplify_{n}x")

    # orders: disjoint key spaces per copy (ids and custkeys offset far
    # beyond the originals)
    o = load(spark, sf_dir, "orders")
    off_key = 10_000_000
    off_cust = 1_000_000
    copies = [
        o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * off_key)).withColumn(
            "o_custkey", F.col("o_custkey") + F.lit(i * off_cust)
        )
        for i in range(n)
    ]
    amp_orders = copies[0]
    for c in copies[1:]:
        amp_orders = amp_orders.unionAll(c)
    amp_orders.write.mode("overwrite").parquet(os.path.join(amp, "orders.parquet"))

    # documents: exact copies under offset doc_ids
    d = load(spark, sf_dir, "documents")
    off_doc = 1_000_000
    dcopies = [d.withColumn("doc_id", F.col("doc_id") + F.lit(i * off_doc)) for i in range(n)]
    amp_docs = dcopies[0]
    for c in dcopies[1:]:
        amp_docs = amp_docs.unionAll(c)
    amp_docs.write.mode("overwrite").parquet(os.path.join(amp, "documents.parquet"))

    # embeddings: copies under offset vec_ids, SAME label (each inverted
    # list grows N-fold — the axis IVF-PQ must absorb: routing cost is
    # unchanged, candidate volume per probe grows linearly)
    v = load(spark, sf_dir, "embeddings")
    off_vec = 1_000_000
    vcopies = [v.withColumn("vec_id", F.col("vec_id") + F.lit(i * off_vec)) for i in range(n)]
    amp_vecs = vcopies[0]
    for c in vcopies[1:]:
        amp_vecs = amp_vecs.unionAll(c)
    amp_vecs.write.mode("overwrite").parquet(os.path.join(amp, "embeddings.parquet"))

    # q_ann_ivfpq_indexed: the one-time index build runs EAGERLY inside
    # qs[name](...) at query construction, i.e. before either timer starts —
    # every timed sample below is the probe-only wall (the production
    # number; the build cost is the inline form's whole point of comparison)
    # q_substring_dedup under exact-copy documents is the adversarial axis
    # for the gram groupBy: every gram's df grows N-fold (partial-agg must
    # absorb it) while per-doc output rows grow only linearly
    for name in (
        "q_interval_overlap",
        "q_multimodal_phash_dup",
        "q_ann_ivfpq",
        "q_ann_ivfpq_indexed",
        "q_substring_dedup",
        "q_substring_dedup_clean",
        "q_substring_dedup_incremental",
        "q_substring_dedup_indexed",
    ):
        base = qs[name](spark, sf_dir)
        t1 = timed_noop(base)  # warm (first run also JIT-warms the plan)
        t1 = min(t1, timed_noop(base))
        rows1 = base.count()
        ampdf = qs[name](spark, amp)
        tn = timed_noop(ampdf)
        tn = min(tn, timed_noop(ampdf))
        rowsn = ampdf.count()
        print(
            f"{name}: 1x {t1:.2f}s ({rows1} rows) -> {n}x {tn:.2f}s "
            f"({rowsn} rows); wall ratio {tn / t1:.2f}x at {n}x data"
        )

    spark.stop()


if __name__ == "__main__":
    main()
