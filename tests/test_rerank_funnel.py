"""Semantic invariants for the round-15 additions: the exact-refine
hybrid rerank (q_hybrid_rerank) and the curation-funnel loss accounting
(q_curation_funnel).  The DuckDB oracle proves value parity; these lock
the CONTRACTS a serving/auditing caller relies on — the rerank is a
permutation of the served shortlist, and the funnel is monotone with
its final stage equal to the pipeline's output."""

from __future__ import annotations

from hnarchive_spark.plans.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_rerank_is_a_permutation_of_the_shortlist(spark):
    qs = all_queries()
    served = {
        (r["query_id"], r["doc_id"])
        for r in qs["q_hybrid_search_rrf_indexed"](spark, SF).collect()
    }
    rer = qs["q_hybrid_rerank"](spark, SF).collect()
    assert {(r["query_id"], r["doc_id"]) for r in rer} == served
    # per query: rerank is exactly 1..k and ordered by (cos_e6 desc, doc_id)
    by_q: dict[int, list] = {}
    for r in rer:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rerank"])
        assert [r["rerank"] for r in rows] == list(range(1, len(rows) + 1)), q
        assert rows == sorted(rows, key=lambda r: (-r["cos_e6"], r["doc_id"])), q


def test_funnel_is_monotone_and_ends_at_the_pipeline(spark):
    qs = all_queries()
    rows = sorted(qs["q_curation_funnel"](spark, SF).collect(), key=lambda r: r["stage"])
    names = [r["stage_name"] for r in rows]
    assert names == ["raw", "url_dedup", "quality_gate", "exact_dedup", "domain_cap"]
    docs = [r["n_docs"] for r in rows]
    toks = [r["n_tokens"] for r in rows]
    assert docs == sorted(docs, reverse=True)
    assert toks == sorted(toks, reverse=True)
    assert rows[0]["docs_pct_e4"] == rows[0]["tokens_pct_e4"] == 10000
    assert all(r["docs_pct_e4"] <= 10000 for r in rows)
    # the funnel's last stage IS the pipeline's output cardinality
    assert docs[-1] == qs["q_curation_pipeline_url"](spark, SF).count()
    # the two early gates bite on this fixture (the later ones legitimately
    # may not at sf0.001: no exact dups among quality survivors, domains
    # under cap — the sf0.01 oracle run covers the full-bite case)
    assert docs[1] < docs[0] and docs[2] < docs[1]
