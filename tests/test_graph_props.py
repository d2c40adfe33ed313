"""Structural invariants for the graph / indexing operators — properties the
oracle parity check cannot express (it only proves equality with DuckDB,
not that BOTH engines satisfy the algorithm's contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hnarchive_spark.plans.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_pagerank_mass_and_floor(spark):
    """Ranks respect the damped floor (150000 = 0.15 * 1e6) and total mass
    never exceeds the initial n_nodes * 1e6 (dangling loss + floor division
    only ever REMOVE mass)."""
    df = all_queries()["q_pagerank"](spark, SF)
    rows = df.collect()
    assert rows, "empty rank table"
    assert all(r.rank_e6 >= 150_000 for r in rows)
    assert sum(r.rank_e6 for r in rows) <= len(rows) * 1_000_000


def test_global_index_is_contiguous_and_consistent(spark):
    """global_idx must be exactly 0..N-1 in doc_id order, and token_offset
    must telescope: offset[i+1] - offset[i] == n_tokens[i]."""
    rows = sorted(
        all_queries()["q_global_index"](spark, SF).collect(), key=lambda r: r.doc_id
    )
    assert [r.global_idx for r in rows] == list(range(len(rows)))
    for a, b in zip(rows, rows[1:]):
        assert b.token_offset - a.token_offset == a.n_tokens
    assert rows[0].token_offset == 0


def test_triangle_count_matches_bruteforce(spark):
    """Per-node counts must equal a pure-Python enumeration over the same
    edge set (guards the wedge-close join against double counting)."""
    from itertools import combinations

    from hnarchive_spark.plans.graph_ml import _und_edges

    edges = {(r.a, r.b) for r in _und_edges(spark, SF).collect()}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected: dict[int, int] = {}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if a < b < c:
                for n in (a, b, c):
                    expected[n] = expected.get(n, 0) + 1
    got = {
        r.node: r.n_triangles
        for r in all_queries()["q_triangle_count"](spark, SF).collect()
    }
    assert got == expected


def test_knn_classify_one_prediction_per_holdout(spark):
    df = all_queries()["q_knn_classify"](spark, SF)
    rows = df.collect()
    ids = [r.vec_id for r in rows]
    assert len(ids) == len(set(ids)), "duplicate predictions"
    assert all(r.vec_id % 10 == 0 for r in rows)
    assert all(1 <= r.n_votes <= 5 for r in rows)
    assert all(r.correct in (0, 1) for r in rows)


def test_link_prediction_excludes_existing_edges(spark):
    from hnarchive_spark.plans.graph_ml import _und_edges

    edges = {(r.a, r.b) for r in _und_edges(spark, SF).collect()}
    for r in all_queries()["q_link_prediction"](spark, SF).collect():
        assert r.u < r.v
        assert (r.u, r.v) not in edges, "predicted pair already adjacent"
        assert r.cn >= 1


def test_power_iteration_matches_numpy_same_steps(spark):
    """The oracle mirrors the same integer algorithm, so it cannot catch an
    algorithmic mistake (transposed Gram, wrong normalization...) — numpy
    running the SAME five float power steps is the independent reference;
    the integer iterate must align with it up to quantization."""
    import numpy as np

    from hnarchive_spark.plans.graph_ml import PCA_ITERS
    from hnarchive_spark.tables import load

    rows = all_queries()["q_power_iteration"](spark, SF).collect()
    v = np.array([r.comp_e3 for r in sorted(rows, key=lambda r: r.dim)], dtype=float)

    X = np.array([r.embedding for r in load(spark, SF, "embeddings").collect()])
    Xq = np.round(X * 1000.0)
    G = Xq.T @ Xq
    ref = np.ones(G.shape[0])
    for _ in range(PCA_ITERS):
        ref = G @ ref
        ref = ref / np.max(np.abs(ref))
    cos = abs(float(v @ ref) / (np.linalg.norm(v) * np.linalg.norm(ref)))
    assert cos > 0.999, cos


def test_kcore_peel_matches_python_reference(spark):
    """Independent pure-Python peel over the same edge set and threshold."""
    from hnarchive_spark.plans.graph_ml import KCORE_ROUNDS, _und_edges

    edges = {(r.a, r.b) for r in _und_edges(spark, SF).collect()}
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    k = (2 * len(edges) + len(nodes)) // (2 * len(nodes))
    surv = set(nodes)
    for _ in range(KCORE_ROUNDS):
        deg = {n: 0 for n in surv}
        for a, b in edges:
            if a in surv and b in surv:
                deg[a] += 1
                deg[b] += 1
        surv = {n for n in surv if deg.get(n, 0) >= k}
    final_deg = {n: 0 for n in surv}
    for a, b in edges:
        if a in surv and b in surv:
            final_deg[a] += 1
            final_deg[b] += 1
    got = {r.node: r.core_deg for r in all_queries()["q_kcore_peel"](spark, SF).collect()}
    assert got == final_deg
