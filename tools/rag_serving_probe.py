"""Amplified-archive probe for the RAG SERVING path (VERDICT r14 #8):
does the indexed hybrid's query cost track the query terms' postings +
the probed lists, or the archive size?

Method (the r13 index_maint_probe methodology applied to serving):
amplify the sf corpus x{1,2,4,8} the ORGANIC way —

* documents: each extra copy's tokens are prefixed ``g<copy>`` (new
  doc_ids, DISJOINT vocabulary), so the text index grows x G while the
  QUERY DOCS' terms keep their base-corpus postings — the design
  predicts the lexical probe flat, and any growth isolates to the
  bucket-partition scan share (postings for other terms hashing into
  the query terms' buckets);
* embeddings: each extra copy lands in FRESH IVF lists (label offset
  per copy) — the production recipe where nlist grows with the corpus
  and per-list size stays constant, so the probed n_probe lists cost
  the same at every G.  (Growing the archive INTO fixed lists instead
  would grow every list x G and the probe with it — that is a sizing
  decision, not a plan property, and rebuild_ivfpq_index re-lists on
  rebuild.)

Per G, each leg + the fusion + the stage-2 exact refine is timed
min-of-3 on the REGISTERED serving functions (bm25_query_topk with the
stop-term guard, probe_ivfpq_topk, _rrf_fuse, _exact_refine against a
size-G vector store), with the matched-postings row count, the
probed-codes row count, and the fetched-vector count reported next to
the walls so "tracks the pruned work, not the archive" is a read-off,
not an inference.

Run: python tools/rag_serving_probe.py [SF_DIR]
Output: one JSON line per growth factor.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hnarchive_spark.functions import text as T
from hnarchive_spark.plans.search import (
    HYBRID_CAND_K,
    HYBRID_MAX_DF_PCT,
    HYBRID_QUERIES,
    _rrf_fuse,
)
from hnarchive_spark.plans.similarity import IVFPQ_N_PROBE, PQ_ITERS, PQ_K, PQ_M
from hnarchive_spark.scratch import scratch_dir
from hnarchive_spark.session import get_spark
from hnarchive_spark.sources.ann_index import build_ivfpq_index, probe_ivfpq_topk
from hnarchive_spark.sources.text_index import build_text_index, bm25_query_topk
from hnarchive_spark.tables import load

GROWTHS = (1, 2, 4, 8)
REPEAT = 3


def _amplified_docs(d, g: int, max_id: int):
    copies = [d]
    for c in range(1, g):
        copies.append(
            d.select(
                (F.col("doc_id") + c * (max_id + 1)).alias("doc_id"),
                # disjoint vocabulary per copy: every token prefixed
                F.regexp_replace("text", r"(^|\s)(\S)", f"$1g{c}x$2").alias("text"),
            )
        )
    out = copies[0].select("doc_id", "text")
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _amplified_vecs(e, g: int, max_id: int, n_labels: int):
    copies = [e]
    for c in range(1, g):
        copies.append(
            e.select(
                (F.col("vec_id") + c * (max_id + 1)).alias("vec_id"),
                "embedding",
                # fresh lists per copy: nlist grows with the corpus,
                # per-list size constant
                (F.col("label") + c * n_labels).alias("label"),
            )
        )
    out = copies[0].select("vec_id", "embedding", "label")
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _min_wall(fn) -> float:
    walls = []
    for _ in range(REPEAT):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return min(walls)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("rag-serving-probe")
    spark.sparkContext.setLogLevel("ERROR")

    d0 = load(spark, sf_dir, "documents").select("doc_id", "text")
    e0 = load(spark, sf_dir, "embeddings")
    max_did = d0.agg(F.max("doc_id")).collect()[0][0]
    max_vid = e0.agg(F.max("vec_id")).collect()[0][0]
    n_labels = e0.select("label").distinct().count()

    qrows = (
        d0.filter(F.col("doc_id") < HYBRID_QUERIES)
        .select("doc_id", T.tokens(F.col("text")).alias("ws"))
        .collect()
    )
    queries = [(r["doc_id"], r["ws"]) for r in qrows]
    qterms = sorted({t for _qid, ws in queries for t in ws})
    qvecs = e0.filter(F.col("vec_id") < HYBRID_QUERIES)

    for g in GROWTHS:
        root = scratch_dir(f"rag_probe_{g}x")
        d = _amplified_docs(d0, g, max_did)
        e = _amplified_vecs(e0, g, max_vid, n_labels)
        n_docs, n_vecs = d.count(), e.count()
        tpath = os.path.join(root, "text")
        apath = os.path.join(root, "ivfpq")
        t0 = time.perf_counter()
        build_text_index(d, tpath)
        build_ivfpq_index(e, apath, PQ_M, PQ_K, PQ_ITERS)
        build_wall = time.perf_counter() - t0

        lex = lambda: bm25_query_topk(  # noqa: E731
            spark, tpath, queries, HYBRID_CAND_K, max_df_pct=HYBRID_MAX_DF_PCT
        ).collect()
        dense = lambda: probe_ivfpq_topk(  # noqa: E731
            spark, apath, qvecs, HYBRID_CAND_K, PQ_M, n_probe=IVFPQ_N_PROBE
        ).collect()

        def fused():
            lx = bm25_query_topk(
                spark, tpath, queries, HYBRID_CAND_K,
                max_df_pct=HYBRID_MAX_DF_PCT,
            ).select("query_id", "doc_id", F.col("rank").alias("lex_rank"))
            dn = probe_ivfpq_topk(
                spark, apath, qvecs, HYBRID_CAND_K, PQ_M, n_probe=IVFPQ_N_PROBE
            ).select(
                "query_id",
                F.col("neighbor_id").alias("doc_id"),
                F.col("rank").alias("dense_rank"),
            )
            _rrf_fuse(lx, dn).collect()

        lex()  # warm (JVM/codegen/footers)
        dense()
        lex_wall = _min_wall(lex)
        dense_wall = _min_wall(dense)
        fuse_wall = _min_wall(fused)

        # stage-2 exact refine (q_hybrid_rerank's _exact_refine + the
        # id-bucketed vec store, the SAME functions the registered query
        # serves): shortlist computed ONCE outside the timed arm, the
        # size-G store built like production — the design predicts this
        # arm FLAT in G (bucket PartitionFilter + pushed In(vec_id,...)).
        from hnarchive_spark.plans.search import HYBRID_QUERIES as _HQ
        from hnarchive_spark.plans.search import _exact_refine
        from hnarchive_spark.sources.vec_store import build_vec_store, fetch_vectors

        vroot = os.path.join(root, "vec_store")
        build_vec_store(spark, e, vroot)
        lx = bm25_query_topk(
            spark, tpath, queries, HYBRID_CAND_K, max_df_pct=HYBRID_MAX_DF_PCT
        ).select("query_id", "doc_id", F.col("rank").alias("lex_rank"))
        dn = probe_ivfpq_topk(
            spark, apath, qvecs, HYBRID_CAND_K, PQ_M, n_probe=IVFPQ_N_PROBE
        ).select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").alias("dense_rank"),
        )
        sl_rows = (
            _rrf_fuse(lx, dn)
            .select("query_id", "doc_id", F.col("rank").cast("long").alias("rrf_rank"))
            .collect()
        )
        sl_ids = sorted({int(r["doc_id"]) for r in sl_rows} | set(range(_HQ)))
        rerank = lambda: _exact_refine(  # noqa: E731
            spark, sl_rows, fetch_vectors(spark, vroot, sl_ids)
        ).collect()
        rerank()  # warm
        rerank_wall = _min_wall(rerank)
        fetched_vecs = len(sl_ids)

        # the pruned work the walls should track
        from hnarchive_spark.sources.index_version import index_root

        postings = spark.read.parquet(
            os.path.join(index_root(tpath), "postings")
        )
        matched_postings = postings.filter(F.col("term").isin(qterms)).count()
        total_postings = postings.count()
        probed_codes = (
            g * HYBRID_QUERIES * IVFPQ_N_PROBE * 0  # placeholder, exact below
        )
        # exact probed-codes count: n_probe nearest lists per query, each
        # list holds ~n_vecs/nlist codes — report list size directly
        codes = spark.read.parquet(os.path.join(index_root(apath), "codes"))
        avg_list = (
            codes.groupBy("list_id").count().agg(F.avg("count")).collect()[0][0]
        )
        probed_codes = int(round(avg_list * IVFPQ_N_PROBE * HYBRID_QUERIES))

        print(
            json.dumps(
                {
                    "g": g,
                    "n_docs": n_docs,
                    "n_vecs": n_vecs,
                    "build_wall": round(build_wall, 3),
                    "lex_wall": round(lex_wall, 3),
                    "dense_wall": round(dense_wall, 3),
                    "fuse_wall": round(fuse_wall, 3),
                    "rerank_wall": round(rerank_wall, 3),
                    "fetched_vecs": fetched_vecs,
                    "matched_postings": matched_postings,
                    "total_postings": total_postings,
                    "avg_list_codes": round(avg_list, 1),
                    "probed_codes_est": probed_codes,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
