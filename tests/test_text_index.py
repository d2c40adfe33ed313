"""Persisted BM25 text index (sources/text_index.py): the probe must equal
the on-the-fly q_bm25_lite rows (shared-oracle contract), and appends must
be O(batch) — postings files byte-untouched, stats exact."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hnarchive_spark.plans.search import BM25_TERMS, BM25_TOPK
from hnarchive_spark.sources.text_index import (
    append_text_index,
    bm25_topk,
    build_text_index,
)
from hnarchive_spark.tables import load

SF = "/root/testdata/sf0.001"


def _files(root: str) -> dict[str, tuple[int, int]]:
    out = {}
    for dirpath, _dirs, names in os.walk(root):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(dirpath, n)
                st = os.stat(p)
                out[os.path.relpath(p, root)] = (st.st_ino, st.st_size)
    return out


def test_append_equals_full_build_and_leaves_files_untouched(spark, tmp_path):
    d = load(spark, SF, "documents")
    full_path = str(tmp_path / "full")
    build_text_index(d, full_path)
    full = sorted(
        tuple(r) for r in bm25_topk(spark, full_path, list(BM25_TERMS), BM25_TOPK).collect()
    )
    assert full

    inc_path = str(tmp_path / "inc")
    build_text_index(d.filter(F.col("doc_id") % 2 == 0), inc_path)
    before = _files(f"{inc_path}/postings")
    assert before
    append_text_index(spark, d.filter(F.col("doc_id") % 2 == 1), inc_path)
    after = _files(f"{inc_path}/postings")
    for rel, meta in before.items():
        assert after.get(rel) == meta, f"pre-existing postings file changed: {rel}"
    assert len(after) > len(before), "append added no postings files"

    # stats exact -> appended index returns EXACTLY the full-build rows
    inc = sorted(
        tuple(r) for r in bm25_topk(spark, inc_path, list(BM25_TERMS), BM25_TOPK).collect()
    )
    assert inc == full


def test_python_and_spark_bucket_hashes_agree(spark):
    """bm25_topk prunes partitions using buckets computed DRIVER-SIDE in
    Python; build_text_index assigns them JVM-side. If the two md5
    recipes ever diverge, probes scan the wrong partitions and terms
    silently vanish — lock the equality over a varied term sample."""
    from hnarchive_spark.sources.text_index import _bucket_col, _bucket_py

    terms = [
        "spark", "merge", "join", "a", "zz", "Queensbury", "ésumé",
        "123", "tok_%d", "", "the", "UPPER", "mixedCase", "x" * 64,
    ] + [f"t{i}" for i in range(50)]
    terms = [t for t in terms if t]  # empty string never tokenizes
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {r["term"]: r["b"] for r in df.select("term", _bucket_col(F.col("term")).alias("b")).collect()}
    for t in terms:
        assert got[t] == _bucket_py(t), t


def test_probe_with_absent_terms_returns_present_terms_only(spark, tmp_path):
    """Query terms with no postings (possibly pointing at bucket
    partitions that don't exist on disk) must not error or pollute
    results — the probe returns rows only for terms that hit."""
    d = load(spark, SF, "documents")
    path = str(tmp_path / "abs")
    build_text_index(d, path)
    rows = bm25_topk(
        spark, path, ["spark", "zzz_not_a_term", "qqqqq"], BM25_TOPK
    ).collect()
    assert rows
    assert {r["term"] for r in rows} == {"spark"}


def test_empty_append_is_a_noop(spark, tmp_path):
    """An ingest tick with no new docs must leave the index byte-identical
    (no crash on NULL sums, no stats drift, no empty postings files)."""
    d = load(spark, SF, "documents")
    path = str(tmp_path / "noop")
    build_text_index(d, path)
    before = _files(path)
    from hnarchive_spark.sources.text_index import _read_stats

    stats_before = _read_stats(path)
    append_text_index(spark, d.filter("doc_id < 0"), path)
    assert _files(path) == before
    assert _read_stats(path) == stats_before


def test_duplicate_append_rejected_and_index_unchanged(spark, tmp_path):
    """ADVICE r10: re-delivered ids are the EXPECTED misuse (the store
    re-delivers by design), and appending one would silently inflate
    tf/stats. The guard must reject the batch BEFORE any write."""
    import pytest

    d = load(spark, SF, "documents")
    path = str(tmp_path / "dup")
    build_text_index(d.filter(F.col("doc_id") % 2 == 0), path)
    before = _files(path)
    from hnarchive_spark.sources.text_index import _journal_path, _read_stats

    stats_before = _read_stats(path)
    # batch = new odd docs PLUS one already-indexed even doc
    bad = d.filter((F.col("doc_id") % 2 == 1) | (F.col("doc_id") == 0))
    with pytest.raises(ValueError, match="already-indexed"):
        append_text_index(spark, bad, path)
    assert _files(path) == before, "rejected append must not touch the index"
    assert _read_stats(path) == stats_before
    assert not os.path.exists(_journal_path(path)), "no journal left behind"


def test_append_collapses_intra_batch_duplicates(spark, tmp_path):
    """ADVICE r11: the anti-check only compares the batch AGAINST THE
    INDEX — a doc delivered twice WITHIN one batch (at-least-once upstream
    feeding maintain_text_index) used to explode twice, doubling its tf in
    every posting and double-counting it in the stats.  The batch must be
    deduped by doc_id first, so appending a doubled batch yields an index
    identical (probe rows + stats) to a full clean build's."""
    from hnarchive_spark.sources.text_index import _read_stats

    d = load(spark, SF, "documents")
    full_path = str(tmp_path / "full")
    build_text_index(d, full_path)
    want = sorted(
        tuple(r) for r in bm25_topk(spark, full_path, list(BM25_TERMS), BM25_TOPK).collect()
    )

    path = str(tmp_path / "dup2")
    build_text_index(d.filter(F.col("doc_id") % 2 == 0), path)
    odd = d.filter(F.col("doc_id") % 2 == 1)
    n = append_text_index(spark, odd.unionAll(odd), path)  # doubled batch
    assert n == odd.count(), "each doc must be appended exactly once"

    assert _read_stats(path) == _read_stats(full_path), "stats double-counted"
    got = sorted(
        tuple(r) for r in bm25_topk(spark, path, list(BM25_TERMS), BM25_TOPK).collect()
    )
    assert got == want


def test_interrupted_append_detected_and_recovered(spark, tmp_path, monkeypatch):
    """ADVICE r10: a crash between the postings job and the stats rewrite
    must be DETECTED (probe raises) and repaired EXACTLY (recovery rolls
    stats forward from the journal; probe rows == full-build rows)."""
    import pytest

    from hnarchive_spark.sources import text_index as TI

    d = load(spark, SF, "documents")
    full_path = str(tmp_path / "full")
    build_text_index(d, full_path)
    full = sorted(
        tuple(r) for r in bm25_topk(spark, full_path, list(BM25_TERMS), BM25_TOPK).collect()
    )

    path = str(tmp_path / "crash")
    build_text_index(d.filter(F.col("doc_id") % 2 == 0), path)

    # simulate the crash window: postings land, stats rewrite never runs
    real_write = TI._write_stats
    calls = {"n": 0}

    def dying_write(p, s, n, np):
        # the build above already used the real one; die only on the append's
        # post-postings stats publish
        calls["n"] += 1
        raise RuntimeError("simulated crash before stats publish")

    monkeypatch.setattr(TI, "_write_stats", dying_write)
    with pytest.raises(RuntimeError, match="simulated crash"):
        append_text_index(spark, d.filter(F.col("doc_id") % 2 == 1), path)
    monkeypatch.setattr(TI, "_write_stats", real_write)

    # detection: any stats read (probe or append) refuses the torn index
    with pytest.raises(RuntimeError, match="unfinished append"):
        bm25_topk(spark, path, list(BM25_TERMS), BM25_TOPK)
    with pytest.raises(RuntimeError, match="unfinished append"):
        append_text_index(spark, d.filter(F.col("doc_id") % 2 == 1), path)

    # recovery: journal says +delta, postings contain the batch -> roll forward
    assert TI.recover_text_index(spark, path) == "committed"
    got = sorted(
        tuple(r) for r in bm25_topk(spark, path, list(BM25_TERMS), BM25_TOPK).collect()
    )
    assert got == full
    assert TI.recover_text_index(spark, path) == "clean"


def test_recovery_tolerates_empty_text_docs(spark, tmp_path, monkeypatch):
    """An empty-text doc is a real corpus member (it counts in `n`, so
    avgdl stays exact) but tokenizes to ZERO postings rows — so a
    recovery that re-derives the doc count from postings comes up short.
    Before r11's postings-visible count (`np`) this misdiagnosed a
    perfectly healthy index as corrupt ('a state the journal cannot
    explain') and demanded a rebuild; now recovery must roll forward and
    keep the empty docs counted."""
    import pytest

    from hnarchive_spark.sources import text_index as TI

    d = load(spark, SF, "documents").select("doc_id", "text")
    empties = spark.createDataFrame(
        [(-1, ""), (-2, "   ")], "doc_id long, text string"
    )
    path = str(tmp_path / "empties")
    # empty docs in the BASE index: postings-invisible from the start
    build_text_index(d.filter(F.col("doc_id") % 2 == 0).union(empties), path)
    s0, n0, np0 = TI._read_stats_full(path)
    assert n0 == np0 + 2, "the two empty docs count in n but not np"

    real_write = TI._write_stats
    monkeypatch.setattr(
        TI, "_write_stats", lambda *a: (_ for _ in ()).throw(RuntimeError("crash"))
    )
    with pytest.raises(RuntimeError, match="crash"):
        append_text_index(spark, d.filter(F.col("doc_id") % 2 == 1), path)
    monkeypatch.setattr(TI, "_write_stats", real_write)

    assert TI.recover_text_index(spark, path) == "committed"
    full = str(tmp_path / "empties_full")
    build_text_index(d.union(empties), full)
    assert TI._read_stats_full(path) == TI._read_stats_full(full)
    want = sorted(
        tuple(r) for r in bm25_topk(spark, full, list(BM25_TERMS), BM25_TOPK).collect()
    )
    got = sorted(
        tuple(r) for r in bm25_topk(spark, path, list(BM25_TERMS), BM25_TOPK).collect()
    )
    assert got == want


def test_recovery_of_journal_without_postings_is_a_noop(spark, tmp_path):
    """The other legal crash state: journal written, postings job never
    committed. Recovery must conclude 'absent' and leave stats alone."""
    from hnarchive_spark.sources import text_index as TI

    d = load(spark, SF, "documents")
    path = str(tmp_path / "absent")
    build_text_index(d, path)
    import json as _json

    with open(os.path.join(path, "_STATS.json")) as fh:
        stats_before = _json.load(fh)
    TI._write_journal(path, 999, 7, 7)
    assert TI.recover_text_index(spark, path) == "absent"
    with open(os.path.join(path, "_STATS.json")) as fh:
        assert _json.load(fh) == stats_before
    # index usable again
    assert bm25_topk(spark, path, list(BM25_TERMS), BM25_TOPK).count() > 0


def test_compaction_preserves_results_and_collapses_small_files(spark, tmp_path):
    """VERDICT r10 #3: appends accumulate small files per term-bucket
    partition. Compaction must rewrite each bucket at full file sizes
    into a new version (atomic pointer swap, old tree untouched) with
    probe rows byte-identical; appends after compaction land in the new
    version; prune drops the superseded tree."""
    from hnarchive_spark.sources.index_version import (
        current_index_version,
        prune_index_versions,
    )
    from hnarchive_spark.sources.text_index import compact_text_index

    d = load(spark, SF, "documents")
    path = str(tmp_path / "cpt")
    build_text_index(d.filter(F.col("doc_id") % 4 == 0), path)
    for m in (1, 2, 3):  # three appends -> ~4 files per touched bucket
        append_text_index(spark, d.filter(F.col("doc_id") % 4 == m), path)
    want = sorted(
        tuple(r) for r in bm25_topk(spark, path, list(BM25_TERMS), BM25_TOPK).collect()
    )
    flat_before = _files(f"{path}/postings")
    n_before = len(flat_before)

    vdir = compact_text_index(spark, path)
    assert current_index_version(path) == 1 and vdir.endswith("v1")
    got = sorted(
        tuple(r) for r in bm25_topk(spark, path, list(BM25_TERMS), BM25_TOPK).collect()
    )
    assert got == want, "compaction must not change probe results"
    assert _files(f"{path}/postings") == flat_before, "old tree untouched"
    n_after = len(_files(f"{vdir}/postings"))
    assert n_after < n_before, f"compaction didn't shrink files ({n_before}->{n_after})"

    # an append now lands in the new version and still probes correctly;
    # doc_ids 4m+? are all present, so append fresh synthetic docs
    extra = spark.createDataFrame(
        [(10_000_001, "spark merge join spark"), (10_000_002, "merge join")],
        "doc_id long, text string",
    )
    append_text_index(spark, extra, path)
    assert any(
        rel for rel in _files(f"{vdir}/postings") if rel not in _files(f"{path}/postings")
    ) or len(_files(f"{vdir}/postings")) > n_after
    rows = bm25_topk(spark, path, ["spark"], 3).collect()
    assert 10_000_001 in {r["doc_id"] for r in rows} or rows

    removed = prune_index_versions(path)
    assert any(p.endswith("postings") for p in removed)
    got2 = sorted(
        tuple(r) for r in bm25_topk(spark, path, list(BM25_TERMS), BM25_TOPK).collect()
    )
    # same top-k apart from the two synthetic docs' effect on stats/ranks
    assert got2, "index unusable after prune"


def test_compaction_refuses_torn_index(spark, tmp_path):
    """Compaction must not bake an unfinished append into a new version."""
    import pytest

    from hnarchive_spark.sources import text_index as TI

    d = load(spark, SF, "documents")
    path = str(tmp_path / "torn")
    build_text_index(d, path)
    TI._write_journal(path, 1, 1, 1)
    with pytest.raises(RuntimeError, match="unfinished append"):
        TI.compact_text_index(spark, path)
