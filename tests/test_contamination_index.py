"""Persisted contamination gate (sources/contamination_index.py):
probe == inline q_contamination, appended-eval-batch convergence,
idempotent re-delivery, torn-append superset safety, partition-pruned
probe, and the ev-derived recovery verb."""

from __future__ import annotations

from pyspark.sql import functions as F

from hnarchive_spark.plans.dedup import _is_eval_col
from hnarchive_spark.sources.contamination_index import (
    append_contamination_index,
    build_contamination_index,
    contamination_index_stats,
    probe_contamination,
    recover_contamination_index,
    _write_ev,
)
from hnarchive_spark.sources.index_version import current_index_version, index_root
from hnarchive_spark.tables import load

SF = "/root/testdata/sf0.001"


def _splits(spark):
    d = load(spark, SF, "documents")
    return d.filter(_is_eval_col()), d.filter(~_is_eval_col())


def _probe_rows(spark, path, train):
    return sorted(tuple(r) for r in probe_contamination(spark, train, path).collect())


def _inline_rows(spark):
    from hnarchive_spark.plans.registry import all_queries

    return sorted(
        tuple(r) for r in all_queries()["q_contamination"](spark, SF).collect()
    )


def test_probe_matches_inline(spark, tmp_path):
    ev, tr = _splits(spark)
    path = str(tmp_path / "gate")
    n = build_contamination_index(spark, ev, path)
    assert n > 0
    got = _probe_rows(spark, path, tr)
    want = _inline_rows(spark)
    assert got == want and len(got) > 0


def test_appended_eval_batch_converges(spark, tmp_path):
    """Build on half the eval suite, append the other half (the new-
    benchmark flow): the probe must equal a fresh full build — and a
    re-delivered append must write nothing."""
    import os

    ev, tr = _splits(spark)
    path = str(tmp_path / "grown")
    build_contamination_index(spark, ev.filter(F.col("doc_id") % 2 == 0), path)
    inc = ev.filter(F.col("doc_id") % 2 == 1)
    assert append_contamination_index(spark, inc, path) == inc.count()
    assert _probe_rows(spark, path, tr) == _inline_rows(spark)

    def _files(root):
        out = {}
        for dirpath, _dirs, names in os.walk(root):
            for nme in names:
                if nme.endswith(".parquet"):
                    p = os.path.join(dirpath, nme)
                    st = os.stat(p)
                    out[os.path.relpath(p, root)] = (st.st_ino, st.st_size)
        return out

    before = _files(index_root(path))
    assert append_contamination_index(spark, inc, path) == 0
    assert append_contamination_index(spark, inc.unionAll(inc), path) == 0
    assert _files(index_root(path)) == before


def test_probe_scan_is_partition_pruned(spark, tmp_path):
    """A small training batch's eval-shingle scan must carry
    PartitionFilters on s_bucket — only matching buckets are read."""
    ev, tr = _splits(spark)
    path = str(tmp_path / "prune")
    build_contamination_index(spark, ev, path)
    small = tr.orderBy("doc_id").limit(3)
    df = probe_contamination(spark, small, path)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.split("\n") if "PartitionFilters" in ln]
    assert pf and any("s_bucket" in ln for ln in pf), pf


def test_torn_duplicate_ev_rows_are_harmless_and_recoverable(spark, tmp_path):
    """Simulate the torn re-delivery worst case — a doc's ev rows
    appended twice: the probe's distinct guard keeps rows identical, and
    recovery rewrites a deduped v1 behind the pointer."""
    from hnarchive_spark.operators.dedup import word_shingles

    ev, tr = _splits(spark)
    path = str(tmp_path / "torn")
    build_contamination_index(spark, ev, path)
    want = _probe_rows(spark, path, tr)

    dup = word_shingles(ev.filter(F.col("doc_id") % 2 == 1))
    _write_ev(dup, path, "append")  # duplicate rows, no tot/bloom change
    before = contamination_index_stats(spark, path)
    assert _probe_rows(spark, path, tr) == want  # superset-safe

    vdir = recover_contamination_index(spark, path)
    assert current_index_version(path) == 1 and index_root(path) == vdir
    after = contamination_index_stats(spark, path)
    assert after["ev_rows"] < before["ev_rows"]
    assert after["eval_docs"] == before["eval_docs"]
    assert _probe_rows(spark, path, tr) == want


def test_empty_survivor_probe_returns_all_zero(spark, tmp_path):
    """A training batch sharing nothing with the eval suite still emits
    one row per eval doc, all zeros."""
    ev, _tr = _splits(spark)
    path = str(tmp_path / "zero")
    build_contamination_index(spark, ev, path)
    alien = spark.createDataFrame(
        [(10**9, "zzz qqq xxx yyy www vvv uuu")], "doc_id long, text string"
    )
    rows = probe_contamination(spark, alien, path).collect()
    assert len(rows) == spark.read.parquet(f"{index_root(path)}/tot").count()
    assert all(r["n_hits"] == 0 and r["contamination_e4"] == 0 for r in rows)
