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


def test_ivfpq_append_leaves_existing_files_untouched(spark, tmp_path):
    """IVF-PQ incremental append (append_ivfpq_index): O(batch) — frozen
    quantizers, pre-existing code files byte-untouched, new codes only
    appended into list partitions, and probes still partition-prune."""
    from hnarchive_spark.sources.ann_index import (
        append_ivfpq_index,
        build_ivfpq_index,
        probe_ivfpq_topk,
    )

    e = load(spark, SF, "embeddings")
    path = str(tmp_path / "ivfpq")
    n_sub, k, iters = 4, 8, 2
    build_ivfpq_index(e.filter(F.col("vec_id") % 2 == 0), path, n_sub, k, iters)
    before = _files(f"{path}/codes")
    cent_before = _files(f"{path}/centroids")
    cb_before = _files(f"{path}/codebooks")
    assert before, "index build produced no code files"

    append_ivfpq_index(spark, e.filter(F.col("vec_id") % 2 == 1), path, n_sub)

    after = _files(f"{path}/codes")
    for rel, meta in before.items():
        assert after.get(rel) == meta, f"pre-existing file changed: {rel}"
    assert len(after) > len(before), "append added no files"
    # both quantizers frozen — not even re-written
    assert _files(f"{path}/centroids") == cent_before
    assert _files(f"{path}/codebooks") == cb_before

    # the appended index serves all vectors, each encoded exactly once
    codes = spark.read.parquet(f"{path}/codes")
    assert codes.count() == e.count()
    assert codes.select("vec_id").distinct().count() == e.count()
    # appended codes are valid codebook entries
    for m in range(n_sub):
        bad = codes.filter((F.col(f"code_{m}") < 0) | (F.col(f"code_{m}") >= k)).count()
        assert bad == 0

    # probing still prunes partitions on list_id
    probe = probe_ivfpq_topk(
        spark, path, e.filter(F.col("vec_id") < 5), 5, n_sub, n_probe=2
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.split("\n") if "PartitionFilters" in ln]
    assert pf and any("list_id" in ln for ln in pf), pf


def test_ivfpq_indexed_probe_matches_inline(spark, tmp_path):
    """The persisted-index probe must return rows IDENTICAL to the inline
    ivf_pq_adc_topk composition (same quantizers, same metrics) — the
    contract that lets q_ann_ivfpq_indexed share the q_ann_ivfpq oracle."""
    from hnarchive_spark.operators.kmeans import ivf_pq_adc_topk
    from hnarchive_spark.sources.ann_index import build_ivfpq_index, probe_ivfpq_topk

    e = load(spark, SF, "embeddings")
    path = str(tmp_path / "ivfpq_ident")
    n_sub, k, iters, topk, n_probe, n_queries = 4, 8, 2, 5, 2, 5
    build_ivfpq_index(e, path, n_sub, k, iters)
    idx_rows = sorted(
        tuple(r) for r in probe_ivfpq_topk(
            spark, path, e.filter(F.col("vec_id") < n_queries), topk, n_sub,
            n_probe=n_probe,
        ).collect()
    )
    inline_rows = sorted(
        tuple(r) for r in ivf_pq_adc_topk(
            e, n_queries, n_sub, k, iters, topk, n_probe=n_probe
        ).collect()
    )
    assert idx_rows == inline_rows and idx_rows


def test_residual_index_probe_matches_inline_residual(spark, tmp_path):
    """build_ivfpq_index(by_residual=True): the persisted-index probe must
    return rows IDENTICAL to the inline ivf_pq_residual_topk composition
    (mode persisted in _META.json, probe auto-selects the per-(query,
    list) residual LUT), and a frozen-quantizer append on a residual
    index must leave pre-existing files byte-untouched."""
    from hnarchive_spark.operators.kmeans import ivf_pq_residual_topk
    from hnarchive_spark.sources.ann_index import (
        append_ivfpq_index,
        build_ivfpq_index,
        probe_ivfpq_topk,
    )

    e = load(spark, SF, "embeddings")
    n_sub, k, iters, topk, n_probe, n_queries = 4, 8, 2, 5, 2, 5
    path = str(tmp_path / "ivfpq_res")
    build_ivfpq_index(e, path, n_sub, k, iters, by_residual=True)
    idx_rows = sorted(
        tuple(r) for r in probe_ivfpq_topk(
            spark, path, e.filter(F.col("vec_id") < n_queries), topk, n_sub,
            n_probe=n_probe,
        ).collect()
    )
    inline_rows = sorted(
        tuple(r) for r in ivf_pq_residual_topk(
            e, n_queries, n_sub, k, iters, topk, n_probe=n_probe
        ).collect()
    )
    assert idx_rows == inline_rows and idx_rows

    # frozen-quantizer append on the residual index: files only added
    path2 = str(tmp_path / "ivfpq_res_app")
    build_ivfpq_index(
        e.filter(F.col("vec_id") % 2 == 0), path2, n_sub, k, iters, by_residual=True
    )
    before = _files(f"{path2}/codes")
    append_ivfpq_index(spark, e.filter(F.col("vec_id") % 2 == 1), path2, n_sub)
    after = _files(f"{path2}/codes")
    for rel, meta in before.items():
        assert after.get(rel) == meta, f"pre-existing file changed: {rel}"
    codes = spark.read.parquet(f"{path2}/codes")
    assert codes.count() == e.count()
    assert codes.select("vec_id").distinct().count() == e.count()


def test_residual_index_probe_partition_prunes(spark, tmp_path):
    """The residual-index probe's extra LUT key (list_id) must not cost
    the plan its shape: codes scan still partition-pruned to probed
    lists, no CartesianProduct, LUT still a broadcast join."""
    from hnarchive_spark.sources.ann_index import build_ivfpq_index, probe_ivfpq_topk

    e = load(spark, SF, "embeddings")
    path = str(tmp_path / "ivfpq_res_plan")
    build_ivfpq_index(e, path, 4, 8, 2, by_residual=True)
    probe = probe_ivfpq_topk(
        spark, path, e.filter(F.col("vec_id") < 5), 5, 4, n_probe=2
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    pf = [ln for ln in plan.split("\n") if "PartitionFilters" in ln]
    assert pf and any("list_id" in ln for ln in pf), pf
    assert "BroadcastHashJoin" in plan


def test_ivf_append_duplicate_ids_rejected(spark, tmp_path):
    """ADVICE r10: a re-delivered id appended into a frozen index silently
    doubles its contribution in probes. The guard rejects the batch before
    any write, pruned to the batch's own list partitions."""
    import pytest

    e = load(spark, SF, "embeddings")
    path = str(tmp_path / "ivf_dup")
    build_ivf_index(e.filter(F.col("vec_id") % 2 == 0), path)
    before = _files(f"{path}/lists")
    bad = e.filter((F.col("vec_id") % 2 == 1) | (F.col("vec_id") == 0))
    with pytest.raises(ValueError, match="already-indexed"):
        append_ivf_index(spark, bad, path)
    assert _files(f"{path}/lists") == before, "rejected append must not write"
    # a clean batch still appends fine afterwards
    append_ivf_index(spark, e.filter(F.col("vec_id") % 2 == 1), path)
    lists = spark.read.parquet(f"{path}/lists")
    assert lists.select("vec_id").distinct().count() == e.count()


def test_ivfpq_append_duplicate_ids_rejected(spark, tmp_path):
    """Same rail for the PQ-coded index: duplicate code rows would double a
    vector's ADC partial sums in probe_ivfpq_topk's groupBy-sum."""
    import pytest

    from hnarchive_spark.sources.ann_index import append_ivfpq_index, build_ivfpq_index

    e = load(spark, SF, "embeddings")
    path = str(tmp_path / "ivfpq_dup")
    n_sub, k, iters = 4, 8, 2
    build_ivfpq_index(e.filter(F.col("vec_id") % 2 == 0), path, n_sub, k, iters)
    before = _files(f"{path}/codes")
    bad = e.filter((F.col("vec_id") % 2 == 1) | (F.col("vec_id") == 2))
    with pytest.raises(ValueError, match="already-indexed"):
        append_ivfpq_index(spark, bad, path, n_sub)
    assert _files(f"{path}/codes") == before, "rejected append must not write"
