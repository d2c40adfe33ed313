"""Python UDTF API parity: a user-defined table function producing the
same document chunks as the built-in array-expression plan
(q_chunk_documents). The UDTF is the API-surface demonstration — the
built-in form is canonical at scale (no Python boundary); this test locks
their row-identity so the two can never drift."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from hnarchive_spark.plans.registry import all_queries
from hnarchive_spark.plans.textops import CHUNK_TOKENS
from hnarchive_spark.tables import load

SF = "/root/testdata/sf0.001"


@udtf(returnType="doc_id: long, chunk_id: long, n_tokens: long, chunk_text: string")
class ChunkDoc:
    def eval(self, doc_id: int, text: str):
        ws = [w for w in text.split(" ") if w != ""]
        for c in range((len(ws) + CHUNK_TOKENS - 1) // CHUNK_TOKENS):
            piece = ws[c * CHUNK_TOKENS : (c + 1) * CHUNK_TOKENS]
            yield doc_id, c, len(piece), " ".join(piece)


def test_udtf_chunks_match_builtin_plan(spark):
    d = load(spark, SF, "documents")
    spark.udtf.register("chunk_doc", ChunkDoc)
    d.select("doc_id", "text").createOrReplaceTempView("docs_for_chunking")
    via_udtf = spark.sql(
        "SELECT c.* FROM docs_for_chunking d, "
        "LATERAL chunk_doc(d.doc_id, d.text) c"
    )
    builtin = all_queries()["q_chunk_documents"](spark, SF)
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, builtin.collect()))
    assert a == b and len(a) > 0


def test_chunks_cover_document_exactly(spark):
    """Chunk invariants: chunks tile the token stream (no loss, no overlap),
    every chunk except the last is full-size."""
    out = all_queries()["q_chunk_documents"](spark, SF)
    agg = (
        out.groupBy("doc_id")
        .agg(
            F.sum("n_tokens").alias("total"),
            F.max("chunk_id").alias("last"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .collect()
    )
    docs = {
        r["doc_id"]: r["n"]
        for r in load(spark, SF, "documents")
        .select("doc_id", F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias("n"))
        .collect()
    }
    for r in agg:
        n = docs[r["doc_id"]]
        assert r["total"] == n
        assert r["n_chunks"] == (n + CHUNK_TOKENS - 1) // CHUNK_TOKENS
        assert r["last"] == r["n_chunks"] - 1
