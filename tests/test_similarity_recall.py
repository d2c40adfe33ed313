"""Recall guarantee for the canonical (LSH-blocked) embedding near-dup
operator: the unregistered brute-force all-pairs join is the exact oracle.

The registered q_embed_dup is the banded-LSH plan (bounded pair space — the
100 TB-safe shape); this test is what keeps its approximation honest:
* precision is exactly 1.0 by construction (candidates are verified with
  exact cosine, so LSH pairs are always a subset of brute-force pairs);
* recall must stay high (OR-construction over 4 two-bit sign bands).
"""

from __future__ import annotations

import pytest

from hnarchive_spark.operators import similarity as S
from hnarchive_spark.tables import load

from tests.conftest import SF_ORACLE

COS_DUP_T = 0.45  # matches plans/similarity.py


def test_ivf_probe_monotone_and_full_probe_equals_exact(spark):
    """IVF quality guarantees vs the exact brute-force top-k:

    * recall@k is MONOTONE in n_probe (widening the probe set only adds
      candidates, never removes them);
    * probing ALL lists is exactly brute force — the approximate operator
      degrades gracefully into the exact one, so its only error source is
      skipped lists, never scoring or ranking.

    (On this near-uniform corpus true neighbors sit at ~60 degrees, where
    single-bucket sign-LSH retains almost nothing — the honest regime note
    lives in the operator docstrings; these invariants are what holds on
    ANY corpus.)
    """
    from pyspark.sql import functions as F

    e = load(spark, SF_ORACLE, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    k = 5
    exact = {
        (r.query_id, r.neighbor_id) for r in S.cosine_topk(e, queries, k).collect()
    }
    assert exact, "exact baseline must be non-empty"

    hits = []
    for n_probe in (1, 2, 4):
        got = {
            (r.query_id, r.neighbor_id)
            for r in S.ivf_topk(e, queries, k, n_probe=n_probe).collect()
        }
        hits.append(len(got & exact))
    assert hits == sorted(hits), f"recall not monotone in n_probe: {hits}"

    n_lists = e.select("label").distinct().count()
    full = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(e, queries, k, n_probe=n_lists).collect()
    }
    assert full == exact, "full probe must equal exact top-k"


# multi-minute compaction/rebuild sweep -> round-closing run only
@pytest.mark.exhaustive
def test_multi_table_lsh_recall_monotone_in_tables(spark):
    """Table sets are prefixes (table t's planes don't change with L), so
    the candidate union — and therefore recall — is monotone in n_tables."""
    from pyspark.sql import functions as F

    e = load(spark, SF_ORACLE, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id) for r in S.cosine_topk(e, queries, 5).collect()
    }
    hits = []
    for n_tables in (1, 4, 8):
        got = {
            (r.query_id, r.neighbor_id)
            for r in S.lsh_topk_multi(e, queries, 5, n_tables).collect()
        }
        hits.append(len(got & exact))
    assert hits == sorted(hits), f"recall not monotone in n_tables: {hits}"


def test_lsh_dup_pairs_subset_and_recall(spark):
    e = load(spark, SF_ORACLE, "embeddings")
    brute = {(r.d1, r.d2) for r in S.cosine_dup_pairs(e, COS_DUP_T).collect()}
    lsh = {(r.d1, r.d2) for r in S.lsh_dup_pairs(e, COS_DUP_T).collect()}
    # exact-verify step => no false positives, ever
    assert lsh <= brute
    # planted near-dup pairs exist at every SF; recall 1.0 at sf0.001,
    # 13/14 at sf0.01 — the bound leaves headroom without going vacuous
    assert len(brute) > 0
    assert len(lsh & brute) / len(brute) >= 0.9


def test_ivfpq_full_probe_equals_pq_adc(spark):
    """IVF-PQ graceful degradation: probing ALL lists must make the
    composed operator row-identical to plain PQ-ADC search (same codes,
    same LUTs, same ranking) — so, as with IVF-over-exact above, the
    composition's ONLY error source vs q_ann_pq_search is skipped lists,
    never the coarse routing, encoding, or ADC arithmetic. Also locks
    recall-monotonicity in n_probe against the PQ-ADC reference."""
    from pyspark.sql import functions as F

    from hnarchive_spark.operators.kmeans import ivf_pq_adc_topk, pq_adc_topk

    e = load(spark, SF_ORACLE, "embeddings")
    n_queries, n_sub, k, iters, topk = 5, 4, 8, 2, 5
    ref = {
        (r.query_id, r.neighbor_id, r.adc_e6, r.rank)
        for r in pq_adc_topk(e, n_queries, n_sub, k, iters, topk).collect()
        if r.query_id < n_queries
    }
    assert ref, "PQ-ADC reference must be non-empty"

    hits = []
    for n_probe in (1, 2):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_pq_adc_topk(
                e, n_queries, n_sub, k, iters, topk, n_probe=n_probe
            ).collect()
        }
        hits.append(len(got & {(q, n) for q, n, _, _ in ref}))
    assert hits == sorted(hits), f"recall not monotone in n_probe: {hits}"

    n_lists = e.select("label").distinct().count()
    full = {
        (r.query_id, r.neighbor_id, r.adc_e6, r.rank)
        for r in ivf_pq_adc_topk(
            e, n_queries, n_sub, k, iters, topk, n_probe=n_lists
        ).collect()
    }
    assert full == ref, "full probe must equal PQ-ADC exactly (values and ranks)"


def test_int8_quantize_zero_vector_gives_zero_codes(spark):
    """ADVICE r10 data edge: an all-zero embedding made the 127/max|v|
    divisor NULL on Spark (NaN on DuckDB). The guard must pin the edge to
    all-zero codes — defined, identical on both engines — while leaving
    nonzero vectors' codes untouched."""
    import duckdb
    from pyspark.sql import functions as F

    rows = [(0, [0.0, 0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["q"]
        for r in df.select(
            "vec_id", S.int8_quantize(F.col("embedding")).alias("q")
        ).collect()
    }
    assert got[0] == [0, 0, 0, 0]
    assert got[1] == [64, -127, 32, 0]
    # the SQL oracle's guard produces the same codes
    duck = duckdb.sql(
        """
        SELECT list_transform(v, x -> CAST(round(x * 127 /
                 (CASE WHEN maxabs = 0 THEN 1 ELSE maxabs END)) AS BIGINT)) AS q
        FROM (SELECT v, list_max(list_transform(v, x -> abs(x))) AS maxabs
              FROM (VALUES ([0.0,0.0,0.0,0.0]), ([1.0,-2.0,0.5,0.0])) t(v))
        ORDER BY q[2] DESC
        """
    ).fetchall()
    assert [list(r[0]) for r in duck] == [got[0], got[1]]


def test_residual_beats_plain_on_clustered_fixture(spark):
    """VERDICT r10 #2: on the near-uniform embeddings table the residual-
    vs-plain comparison is honestly flat (BENCH_NOTES r10) — the clustered
    fixture exists to measure the regime where FAISS-default residual
    encoding actually pays. Lock the win: mean recall@5 of the residual
    arm must strictly beat the plain arm (both arms are oracle-hashed
    registered queries, so the values themselves are driver-checked)."""
    import hnarchive_spark.plans.similarity  # noqa: F401 -- registers the queries
    from hnarchive_spark.plans.registry import REGISTRY

    def mean_recall(name):
        rows = REGISTRY[name].spark(spark, SF_ORACLE).collect()
        assert len(rows) == 5
        return sum(r["recall_e4"] for r in rows) / len(rows)

    plain = mean_recall("q_ann_clustered_recall_plain")
    resid = mean_recall("q_ann_clustered_recall_residual")
    assert resid > plain, (plain, resid)
    # the fixture is built to make the gap decisive, not marginal
    assert resid >= 2 * plain, (plain, resid)
