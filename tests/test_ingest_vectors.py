"""Composed streaming VECTOR ingest (streaming/ingest_vectors.py): the
semantic near-dup gate must reject batch vectors with an archive
neighbor, survivors must land in the vec store + membership + IVF-PQ
together, the ledger must obey the conservation law, full redelivery
must append nothing anywhere, and a crash between the fetch-side and
search-side appends must self-heal on redelivery (the fetch-first write
order's claim)."""

from __future__ import annotations

import json
import os

import pytest

# Multi-minute vector ingest gate end-to-end integration sweeps (10-43 s per test): excluded
# from the DRIVER-SIZED default run, executed round-closing via
# `-m exhaustive` (pytest.ini; VERDICT r18 #1 suite-budget split).
pytestmark = pytest.mark.exhaustive
from pyspark.sql import functions as F

from hnarchive_spark.sources.ann_index import build_ivfpq_index
from hnarchive_spark.sources.semdedup_index import build_semdedup_index
from hnarchive_spark.sources.vec_store import build_vec_store, read_vec_store
from hnarchive_spark.streaming.index_maint import _MAINT_STATS
from hnarchive_spark.streaming.ingest_vectors import maintain_vector_ingest
from hnarchive_spark.tables import load

SF = "/root/testdata/sf0.001"
N_SUB = 4
T_EXACT_E6 = 1_000_000  # exact-copy gate: round(cos*1e6) == 1e6


def _vecs(spark):
    # label stays: build_ivfpq_index seeds its coarse lists from it
    return load(spark, SF, "embeddings").select("vec_id", "embedding", "label")


def _ledger(root: str) -> dict:
    with open(os.path.join(root, _MAINT_STATS)) as fh:
        return json.load(fh)


def _setup(spark, tmp_path):
    e = _vecs(spark)
    seed = e.filter(F.col("vec_id") % 2 == 0)
    vs = str(tmp_path / "vs")
    ivf = str(tmp_path / "ivf")
    sd = str(tmp_path / "sd")
    build_vec_store(spark, seed, vs, n_buckets=8)
    build_ivfpq_index(seed, ivf, N_SUB, 8, 2)
    build_semdedup_index(spark, seed, sd, k=8, iters=2, store_assignments=True)
    novel = e.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 200))
    # planted archive copies under fresh ids: the gate must reject them
    dups = seed.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1_000_001).alias("vec_id"), "embedding", "label"
    )
    return e, seed, vs, ivf, sd, novel, dups


def test_gate_fates_conservation_and_redelivery(spark, tmp_path):
    e, seed, vs, ivf, sd, novel, dups = _setup(spark, tmp_path)
    batch = novel.unionByName(dups)
    process = maintain_vector_ingest(
        vs, ivfpq_path=ivf, n_sub=N_SUB, semdedup_index_path=sd, t_e6=T_EXACT_E6
    )

    appended = process(batch, 0)
    assert appended == novel.count()
    led = _ledger(vs)
    assert led["vingest_neardup"] == dups.count()
    assert led["vingest_rows"] == (
        led["vingest_neardup"] + led["vingest_appended"] + led["vingest_skipped"]
    )

    # everything landed together: store, membership-gated archive, codes
    assert read_vec_store(spark, vs).count() == seed.count() + novel.count()
    codes = spark.read.parquet(os.path.join(ivf, "codes"))
    assert codes.select("vec_id").distinct().count() == seed.count() + novel.count()

    # full redelivery: gate re-counts advisorily, nothing appends
    assert process(batch, 0) == 0
    led2 = _ledger(vs)
    assert led2["vingest_appended"] == led["vingest_appended"]
    assert read_vec_store(spark, vs).count() == seed.count() + novel.count()
    # per-batch conservation still holds over the accumulated ledger
    assert led2["vingest_rows"] == (
        led2["vingest_neardup"] + led2["vingest_appended"] + led2["vingest_skipped"]
    )

    # the ingested novel vectors are now ARCHIVE: a later batch that
    # copies one of them is gated out
    copy_of_novel = novel.limit(3).select(
        (F.col("vec_id") + 2_000_001).alias("vec_id"), "embedding", "label"
    )
    assert process(copy_of_novel, 1) == 0
    assert _ledger(vs)["vingest_neardup"] - led2["vingest_neardup"] == 3


def test_crash_between_appends_self_heals(spark, tmp_path, monkeypatch):
    """Fetch-side-first order: a crash after the vec-store append but
    before the IVF-PQ append leaves vectors fetchable-not-searchable;
    the redelivered batch must repair the codes without duplicating the
    store — INCLUDING a batch-internal near-dup pair (review r15: the
    gate must reproduce first-delivery gating on redelivery, so it
    excludes the batch's own ids from the archive; otherwise the pair
    would gate itself out and never reach the repair append)."""
    import hnarchive_spark.sources.ann_index as AI

    e, seed, vs, ivf, sd, novel, _dups = _setup(spark, tmp_path)
    # plant a batch-INTERNAL near-dup pair: two fresh ids, same vector
    pair = seed.limit(1).select(
        (F.col("vec_id") + 3_000_001).alias("vec_id"), "embedding", "label"
    ).unionByName(
        seed.limit(1).select(
            (F.col("vec_id") + 3_000_002).alias("vec_id"), "embedding", "label"
        )
    )
    # use fresh vectors for the pair so the ARCHIVE gate doesn't reject
    # them on first delivery: negate the embedding (cosine -1 vs seed)
    pair = pair.select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
        "label",
    )
    batch = novel.unionByName(pair)
    n_batch = batch.count()
    real_append = AI.append_ivfpq_index

    def _crash(*a, **kw):
        raise RuntimeError("crash before search-side append")

    monkeypatch.setattr(AI, "append_ivfpq_index", _crash)
    process = maintain_vector_ingest(
        vs, ivfpq_path=ivf, n_sub=N_SUB, semdedup_index_path=sd, t_e6=T_EXACT_E6
    )
    with pytest.raises(RuntimeError, match="crash"):
        process(batch, 0)
    # fetchable (store has the rows, pair included: batch x batch is
    # never gated) but not searchable (codes don't)
    assert read_vec_store(spark, vs).count() == seed.count() + n_batch
    codes = spark.read.parquet(os.path.join(ivf, "codes"))
    assert codes.select("vec_id").distinct().count() == seed.count()

    monkeypatch.setattr(AI, "append_ivfpq_index", real_append)
    assert process(batch, 0) == 0  # store append is the no-op skip rail
    codes = spark.read.parquet(os.path.join(ivf, "codes"))
    got = {r[0] for r in codes.select("vec_id").distinct().collect()}
    # EVERY batch row is searchable after the repair — the near-dup pair
    # was not gated against its own store rows on redelivery
    assert {r["vec_id"] for r in batch.select("vec_id").collect()} <= got
    assert len(got) == seed.count() + n_batch


def test_ingested_store_serves_rerank_identically(spark, tmp_path, monkeypatch):
    """Ingest -> serve integration (VERDICT r15 #7): after the composed
    vector ingest — INCLUDING a crash between the fetch-side and
    search-side appends and the redelivery heal — q_hybrid_rerank's
    fetch path (_exact_refine over fetch_vectors, the shared serve
    code) run against the JUST-INGESTED vec store must produce output
    identical to the same shortlist served from a FULL-BUILD store over
    the same corpus.  The mid-crash assertion is the
    fetchable-not-searchable contract's point: a shortlist winner from
    the crashed batch is already servable before the heal."""
    import hnarchive_spark.sources.ann_index as AI
    from hnarchive_spark.plans.search import _exact_refine
    from hnarchive_spark.sources.vec_store import fetch_vectors

    e, seed, vs, ivf, sd, novel, _dups = _setup(spark, tmp_path)

    # a stage-1 shortlist naming BOTH seed docs and about-to-be-ingested
    # novel docs (ids 1,3 are in `novel`), queries from the seed (0,2,4)
    rows = [
        {"query_id": q, "doc_id": d, "rrf_rank": r}
        for q in (0, 2, 4)
        for r, d in enumerate([1, 3, 6, 8, 101], start=1)
        if d != q
    ]
    ids = sorted({r["doc_id"] for r in rows} | {0, 2, 4})

    # deliver the batch with a crash before the search-side append
    real_append = AI.append_ivfpq_index
    monkeypatch.setattr(
        AI, "append_ivfpq_index",
        lambda *a, **kw: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    process = maintain_vector_ingest(
        vs, ivfpq_path=ivf, n_sub=N_SUB, semdedup_index_path=sd, t_e6=T_EXACT_E6
    )
    with pytest.raises(RuntimeError, match="crash"):
        process(novel, 0)

    # the reference: a FULL BUILD over the final corpus in a fresh path
    full = str(tmp_path / "vs_full")
    build_vec_store(spark, seed.unionByName(novel), full, n_buckets=8)

    def serve(path):
        return sorted(
            tuple(r)
            for r in _exact_refine(
                spark, rows, fetch_vectors(spark, path, ids)
            ).collect()
        )

    want = serve(full)
    assert len(want) == len(rows)  # every shortlist row served
    # MID-CRASH: the ingested store already serves the full rerank —
    # batch winners are fetchable even though not yet searchable
    assert serve(vs) == want

    # heal (redelivery repairs the codes), then the serve is unchanged
    monkeypatch.setattr(AI, "append_ivfpq_index", real_append)
    assert process(novel, 0) == 0
    assert serve(vs) == want
    codes = spark.read.parquet(os.path.join(ivf, "codes"))
    assert codes.select("vec_id").distinct().count() == seed.count() + novel.count()
