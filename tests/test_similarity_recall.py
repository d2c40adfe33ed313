"""Recall guarantee for the canonical (LSH-blocked) embedding near-dup
operator: the unregistered brute-force all-pairs join is the exact oracle.

The registered q_embed_dup is the banded-LSH plan (bounded pair space — the
100 TB-safe shape); this test is what keeps its approximation honest:
* precision is exactly 1.0 by construction (candidates are verified with
  exact cosine, so LSH pairs are always a subset of brute-force pairs);
* recall must stay high (OR-construction over 4 two-bit sign bands).
"""

from __future__ import annotations

from hnarchive_spark.operators import similarity as S
from hnarchive_spark.tables import load

from tests.conftest import SF_ORACLE

COS_DUP_T = 0.45  # matches plans/similarity.py


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
