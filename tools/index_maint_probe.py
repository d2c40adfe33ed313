"""Measure the streaming-maintenance claim: per-micro-batch index append
cost is O(batch) — FLAT as the index grows — and a re-delivered batch
(the at-least-once restart case) costs only the partition-pruned
anti-join, not a write.

Method: split the documents (and embeddings) corpus into K equal batches
by ``id % K``; build the index on batch 0, then append batches 1..K-1
through the SAME per-batch function streaming maintenance uses
(``maintain_text_index`` / ``maintain_ivfpq_index``,
``on_conflict="skip"``), timing each.  If appends scanned the index, the
per-batch times would grow ~linearly in the number of prior batches; the
O(batch) design predicts a flat profile.  Finally, re-deliver the LAST
batch and time the resulting no-op.

After the appends, the families with a compaction verb (text, LSH) run
it and report the small-file collapse: parquet file count before/after
and the compaction wall — the measured form of the lifecycle claim that
K appends leave ~K files per touched partition until compacted.

Run: python tools/index_maint_probe.py [SF_DIR] [K]
Output: one JSON line per index family.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hnarchive_spark.session import get_spark
from hnarchive_spark.sources.ann_index import (
    build_index,
    build_ivfpq_index,
    compact_lsh_index,
)
from hnarchive_spark.sources.text_index import build_text_index, compact_text_index
from hnarchive_spark.streaming.index_maint import (
    maintain_ivfpq_index,
    maintain_lsh_index,
    maintain_text_index,
)
from hnarchive_spark.tables import load


def _n_parquet_files(root):
    return sum(
        1
        for _dir, _sub, names in os.walk(root)
        for n in names
        if n.endswith(".parquet")
    )


def probe(name, build, process, batches, compact=None, data_sub=""):
    t0 = time.perf_counter()
    build(batches[0])
    built = round(time.perf_counter() - t0, 3)
    per_batch = []
    for i, b in enumerate(batches[1:], start=1):
        t0 = time.perf_counter()
        n = process(b, batch_id=i)
        per_batch.append(round(time.perf_counter() - t0, 3))
        assert n > 0, f"batch {i} appended nothing"
    t0 = time.perf_counter()
    n = process(batches[-1], batch_id=len(batches) - 1)  # re-delivery
    redeliver = round(time.perf_counter() - t0, 3)
    assert n == 0, "re-delivered batch appended rows"
    out = {
        "family": name,
        "build_s": built,
        "append_s_per_batch": per_batch,
        "redeliver_noop_s": redeliver,
    }
    if compact is not None:
        before = _n_parquet_files(data_sub)
        t0 = time.perf_counter()
        vdir = compact()
        out["compact_s"] = round(time.perf_counter() - t0, 3)
        out["files_before_compact"] = before
        out["files_after_compact"] = _n_parquet_files(vdir)
    print(json.dumps(out), flush=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("index-maint-probe")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="index_maint_probe_")

    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    tpath = os.path.join(tmp, "text")
    probe(
        "bm25_text",
        lambda b: build_text_index(b, tpath),
        maintain_text_index(tpath),
        [d.filter(F.col("doc_id") % k == m) for m in range(k)],
        compact=lambda: compact_text_index(spark, tpath),
        data_sub=os.path.join(tpath, "postings"),
    )

    lpath = os.path.join(tmp, "lsh")
    probe(
        "lsh",
        lambda b: build_index(b, lpath),
        maintain_lsh_index(lpath),
        [e.filter(F.col("vec_id") % k == m) for m in range(k)],
    )
    # LSH compaction measured separately so the file count excludes v-dirs
    t0 = time.perf_counter()
    vdir = compact_lsh_index(spark, lpath)
    print(
        json.dumps(
            {
                "family": "lsh",
                "compact_s": round(time.perf_counter() - t0, 3),
                "files_before_compact": _n_parquet_files(lpath) - _n_parquet_files(vdir),
                "files_after_compact": _n_parquet_files(vdir),
            }
        ),
        flush=True,
    )

    apath = os.path.join(tmp, "ivfpq")
    probe(
        "ivfpq",
        lambda b: build_ivfpq_index(b, apath, 4, 8, 2),
        maintain_ivfpq_index(apath, 4),
        [e.filter(F.col("vec_id") % k == m) for m in range(k)],
    )

    # MinHash signature index: the append profile like the others, PLUS
    # the claim the others can't show — a FIXED batch's PROBE wall must
    # stay flat while the archive grows k-fold (probe cost is O(batch +
    # candidates), never a re-signature of the archive)
    from hnarchive_spark.plans.dedup import JACCARD_T
    from hnarchive_spark.sources.minhash_index import (
        build_minhash_index,
        compact_minhash_index,
        probe_minhash_pairs,
    )
    from hnarchive_spark.streaming.index_maint import maintain_minhash_index

    mpath = os.path.join(tmp, "minhash")
    arch = d.filter(F.col("doc_id") % (k + 1) != k)  # archive slices
    fixed_batch = d.filter(F.col("doc_id") % (k + 1) == k)  # never indexed
    batches = [arch.filter(F.col("doc_id") % (k + 1) == m) for m in range(k)]
    probe_walls = []

    def _probe_wall():
        t0 = time.perf_counter()
        n = (
            probe_minhash_pairs(spark, fixed_batch, mpath, arch, JACCARD_T)
            .write.mode("overwrite").format("noop").save()
        )
        probe_walls.append(round(time.perf_counter() - t0, 3))
        return n

    build_wall_t0 = time.perf_counter()
    build_minhash_index(spark, batches[0], mpath)
    built = round(time.perf_counter() - build_wall_t0, 3)
    _probe_wall()
    per_batch = []
    proc = maintain_minhash_index(mpath)
    for i, b in enumerate(batches[1:], start=1):
        t0 = time.perf_counter()
        n = proc(b, batch_id=i)
        per_batch.append(round(time.perf_counter() - t0, 3))
        assert n > 0
        _probe_wall()
    t0 = time.perf_counter()
    assert proc(batches[-1], batch_id=k) == 0  # re-delivery
    redeliver = round(time.perf_counter() - t0, 3)
    before_files = _n_parquet_files(mpath)
    t0 = time.perf_counter()
    vdir = compact_minhash_index(spark, mpath)
    print(
        json.dumps(
            {
                "family": "minhash",
                "build_s": built,
                "append_s_per_batch": per_batch,
                "redeliver_noop_s": redeliver,
                "fixed_batch_probe_s_as_archive_grows": probe_walls,
                "compact_s": round(time.perf_counter() - t0, 3),
                "files_before_compact": before_files - _n_parquet_files(vdir),
                "files_after_compact": _n_parquet_files(vdir),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
