"""Incremental IVF append (sources/ann_index.py append_ivf_index): adding a
batch must be O(batch) — every pre-existing index file byte-untouched, new
rows only appended into list partitions, centroids frozen."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hnarchive_spark.sources.ann_index import (
    append_ivf_index,
    build_ivf_index,
    probe_ivf_topk,
)
from hnarchive_spark.tables import load

SF = "/root/testdata/sf0.001"


def _files(root: str) -> dict[str, tuple[int, int]]:
    out = {}
    for dirpath, _dirs, names in os.walk(root):
        for n in names:
            p = os.path.join(dirpath, n)
            if n.endswith(".parquet"):
                st = os.stat(p)
                out[os.path.relpath(p, root)] = (st.st_ino, st.st_size)
    return out


def test_append_leaves_existing_files_untouched(spark, tmp_path):
    e = load(spark, SF, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(e.filter(F.col("vec_id") % 2 == 0), path)
    before = _files(f"{path}/lists")
    cent_before = _files(f"{path}/centroids")
    assert before, "index build produced no list files"

    append_ivf_index(spark, e.filter(F.col("vec_id") % 2 == 1), path)

    after = _files(f"{path}/lists")
    # every original file still present, same inode and size (no rewrite)
    for rel, meta in before.items():
        assert after.get(rel) == meta, f"pre-existing file changed: {rel}"
    assert len(after) > len(before), "append added no files"
    # centroids frozen — not even re-written
    assert _files(f"{path}/centroids") == cent_before

    # the appended index serves all vectors: every corpus vector appears
    # exactly once in the lists
    lists = spark.read.parquet(f"{path}/lists")
    assert lists.count() == e.count()
    assert lists.select("vec_id").distinct().count() == e.count()

    # probing still prunes partitions on list_id
    probe = probe_ivf_topk(
        spark, path, e.filter(F.col("vec_id") < 5), 5, n_probe=2
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.split("\n") if "PartitionFilters" in ln]
    assert pf and any("list_id" in ln for ln in pf), pf
