"""Lifecycle tests for the persisted substring-gram index
(sources/gram_index.py): build/append/probe equivalence, set-semantic
append idempotence (the no-on_conflict-needed claim), and versioned
compaction behind the atomic pointer — the same contract surface as the
LSH/IVF/BM25 index tests."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from hnarchive_spark.sources.gram_index import (
    append_gram_index,
    build_gram_index,
    compact_gram_index,
    gram_index_stats,
    probe_substring_spans,
)
from hnarchive_spark.sources.index_version import current_index_version, index_root
from hnarchive_spark.tables import load

SF = "/root/testdata/sf0.001"
L = 20


def _probe_rows(spark, path, batch):
    return sorted(tuple(r) for r in probe_substring_spans(spark, batch, path).collect())


def test_build_probe_matches_inline_incremental(spark, tmp_path):
    from hnarchive_spark.plans.registry import all_queries

    d = load(spark, SF, "documents")
    path = str(tmp_path / "grams")
    build_gram_index(spark, d.filter(F.col("doc_id") % 2 == 0), path, l=L)
    got = _probe_rows(spark, path, d.filter(F.col("doc_id") % 2 == 1))
    want = sorted(
        tuple(r)
        for r in all_queries()["q_substring_dedup_incremental"](spark, SF).collect()
    )
    assert got == want and len(got) > 0


def test_append_converges_to_fresh_build(spark, tmp_path):
    """Archive built from one third, grown by two appends: probe rows must
    hash-equal a fresh build over the whole archive."""
    d = load(spark, SF, "documents")
    arch = d.filter(F.col("doc_id") % 2 == 0)
    batch = d.filter(F.col("doc_id") % 2 == 1)

    full = str(tmp_path / "full")
    build_gram_index(spark, arch, full, l=L)
    want = _probe_rows(spark, full, batch)

    grown = str(tmp_path / "grown")
    build_gram_index(spark, arch.filter(F.col("doc_id") % 6 == 0), grown, l=L)
    n1 = append_gram_index(spark, arch.filter(F.col("doc_id") % 6 == 2), grown)
    n2 = append_gram_index(spark, arch.filter(F.col("doc_id") % 6 == 4), grown)
    assert n1 > 0 and n2 > 0
    assert _probe_rows(spark, grown, batch) == want


# multi-minute compaction/rebuild sweep -> round-closing run only
@pytest.mark.exhaustive
def test_append_is_set_semantic_idempotent(spark, tmp_path):
    """Re-delivering an entire batch (and doubling it within one delivery)
    appends ZERO rows — the set semantics that replace the other
    families' on_conflict dial."""
    d = load(spark, SF, "documents")
    arch = d.filter(F.col("doc_id") % 2 == 0)
    path = str(tmp_path / "idem")
    build_gram_index(spark, arch.filter(F.col("doc_id") % 4 == 0), path, l=L)
    inc = arch.filter(F.col("doc_id") % 4 == 2)
    n_first = append_gram_index(spark, inc, path)
    assert n_first > 0
    before = gram_index_stats(spark, path)
    assert append_gram_index(spark, inc, path) == 0
    assert append_gram_index(spark, inc.unionAll(inc), path) == 0
    after = gram_index_stats(spark, path)
    assert after["rows"] == before["rows"] == after["grams"]


# multi-minute compaction/rebuild sweep -> round-closing run only
@pytest.mark.exhaustive
def test_compaction_preserves_probe_rows_and_collapses_files(spark, tmp_path):
    d = load(spark, SF, "documents")
    arch = d.filter(F.col("doc_id") % 2 == 0)
    batch = d.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "compact")
    build_gram_index(spark, arch.filter(F.col("doc_id") % 8 == 0), path, l=L)
    for k in (2, 4):
        append_gram_index(spark, arch.filter(F.col("doc_id") % 8 == k), path)
    want = _probe_rows(spark, path, batch)
    before = gram_index_stats(spark, path)

    vdir = compact_gram_index(spark, path)
    assert current_index_version(path) == 1
    assert index_root(path) == vdir and os.path.isdir(vdir)
    after = gram_index_stats(spark, path)
    assert after["grams"] == before["grams"]
    assert after["files"] < before["files"], (before["files"], after["files"])
    assert _probe_rows(spark, path, batch) == want

    # the lifecycle keeps composing: an append after the swap lands in the
    # NEW version and the probe sees it (grown index == fresh full build)
    append_gram_index(spark, arch.filter(F.col("doc_id") % 8 == 6), path)
    full = str(tmp_path / "full_ref")
    build_gram_index(spark, arch, full, l=L)
    assert _probe_rows(spark, path, batch) == _probe_rows(spark, full, batch)
