"""Search / retrieval wave: tf-saturation relevance scoring (BM25 without
the idf log), an inverted-index build, and a bigram language model.

Log-free by design: ln/log2 doubles are the one thing two engines' libm
builds may disagree on at the last ulp, so every score here is an exact
integer rational — BM25's tf-saturation term is already a ratio of integer
polynomials once avgdl is pinned to its round-half-up integer, and bigram
conditional probabilities are (count, count) pairs scaled to e6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hnarchive_spark.functions import text as T
from hnarchive_spark.plans.registry import query
from hnarchive_spark.tables import load

BM25_TERMS = ("spark", "merge", "join")
BM25_TOPK = 10

# ---- the ONE definition of the BM25 integer score (ADVICE r10) -----------
# k1 = 1.2 = 6/5, b = 0.75 = 3/4:
#   score = tf*(k1+1) / (tf + k1*(1 - b + b*dl/A)),  A = round_half_up(avgdl)
# cleared of denominators, e6-scaled, with round-half-up division:
#   score_e6 = (2*44e6*tf*A + D) div (2*D),   D = 20*tf*A + 6*A + 18*dl.
# The whole family — q_bm25_lite, the persisted-index probe
# (sources/text_index.bm25_topk), and the shared DuckDB oracle — renders
# these SAME strings (Spark `div`, DuckDB `//`; identical semantics here
# because every operand is nonnegative), so a constant can't drift in one
# copy and silently break the shared-oracle contract.


def bm25_avgdl_sql(div: str = "div", s: str = "s", n: str = "n") -> str:
    """Round-half-up integer avgdl ``A`` from corpus stats (s, n)."""
    return f"(2 * {s} + {n}) {div} (2 * {n})"


def bm25_score_sql(div: str = "div") -> str:
    """e6-scaled integer BM25 score from columns (tf, dl, a) — BIGINT on
    both engines."""
    return (
        "CAST((2 * 44000000 * tf * a + (20 * tf * a + 6 * a + 18 * dl))"
        f" {div} (2 * (20 * tf * a + 6 * a + 18 * dl)) AS BIGINT)"
    )



# One oracle for the whole BM25 family: the on-the-fly form, the
# persisted-index probe, and the appended-index probe all contract to
# return IDENTICAL rows (same tokenizer, same integer scoring, same
# corpus stats), so they share this SQL verbatim.
_BM25_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w != '') AS ws
      FROM documents
    ),
    st AS (
      SELECT CAST(sum(len(ws)) AS BIGINT) AS s, count(*) AS n FROM toks
    ),
    terms(term) AS (VALUES {", ".join(f"({t!r})" for t in BM25_TERMS)}),
    scored AS (
      SELECT t.term, k.doc_id,
             CAST(len(list_filter(k.ws, w -> w = t.term)) AS BIGINT) AS tf,
             CAST(len(k.ws) AS BIGINT) AS dl,
             {bm25_avgdl_sql(div='//', s='st.s', n='st.n')} AS a
      FROM toks k CROSS JOIN terms t CROSS JOIN st
    ),
    s2 AS (
      SELECT term, doc_id, tf,
             {bm25_score_sql(div='//')} AS score_e6
      FROM scored WHERE tf > 0
    )
    SELECT term, doc_id, tf, score_e6, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY term
                                   ORDER BY score_e6 DESC, doc_id) AS rank
      FROM s2
    ) WHERE rank <= {BM25_TOPK}
    """

@query(
    "q_bm25_lite",
    oracle=_BM25_ORACLE,
    doc=f"BM25-style relevance top-{BM25_TOPK} per query term (k1=1.2, "
    "b=0.75) WITHOUT the idf log — the tf-saturation + length-"
    "normalization core, cleared of denominators into the exact integer "
    "rational 44*tf*A / (20*tf*A + 6*A + 18*dl) with A the round-half-up "
    "integer avgdl (the only corpus statistic, a broadcast scalar). "
    "idf's ln() is deliberately out: libm doubles are the one non-"
    "portable primitive across engines, and for a FIXED term idf is a "
    "constant that cannot change the per-term ranking anyway. Per-doc tf "
    "comes from an array filter on the already-tokenized row — no token "
    "explode, no shuffle until the per-term top-k window over matching "
    "docs only.",
)
def q_bm25_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", T.tokens(F.col("text")).alias("ws"))
    st = d.agg(
        F.sum(F.size("ws")).cast("long").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    terms = spark.createDataFrame([(t,) for t in BM25_TERMS], "term string")
    scored = (
        d.crossJoin(F.broadcast(terms))
        .crossJoin(F.broadcast(st))
        .select(
            "term",
            "doc_id",
            F.size(F.expr("filter(ws, w -> w = term)")).cast("long").alias("tf"),
            F.size("ws").cast("long").alias("dl"),
            F.expr(bm25_avgdl_sql()).alias("a"),
        )
        .filter(F.col("tf") > 0)
        .withColumn(
            "score_e6",
            F.expr(bm25_score_sql()),
        )
    )
    w = Window.partitionBy("term").orderBy(F.col("score_e6").desc(), "doc_id")
    return (
        scored.select("term", "doc_id", "tf", "score_e6")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
    )


IDX_MIN_TERM_LEN = 4  # content-ish terms only
IDX_POSTINGS = 10  # capped postings sample per term


@query(
    "q_inverted_index",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w != '') AS ws
      FROM documents
    ),
    td AS (SELECT doc_id, unnest(ws) AS term FROM toks),
    tc AS (
      SELECT term, doc_id, count(*) AS c
      FROM td WHERE length(term) >= {IDX_MIN_TERM_LEN}
      GROUP BY term, doc_id
    ),
    rk AS (
      SELECT *, row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM tc
    )
    SELECT term, count(*) AS df, CAST(sum(c) AS BIGINT) AS cf,
           string_agg(CASE WHEN rn <= {IDX_POSTINGS}
                           THEN CAST(doc_id AS VARCHAR) END,
                      ',' ORDER BY doc_id) AS postings
    FROM rk GROUP BY term
    """,
    doc="Inverted-index build: per term, document frequency, collection "
    f"frequency, and the first {IDX_POSTINGS} postings (ascending doc_id) "
    "as a csv sample. The postings cap is applied with a per-term window "
    "BEFORE any collection — collect_list only ever sees <= "
    f"{IDX_POSTINGS} rows per term, so a stop-word with a billion "
    "postings cannot blow an executor (the naive collect-then-slice "
    "does). One shuffle for (term, doc) counts; the window and final agg "
    "share the term clustering. Postings are emitted as a csv string "
    "sorted numerically on both engines — portable across list-"
    "formatting differences.",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", T.tokens(F.col("text")).alias("ws"))
    td = d.select("doc_id", F.explode("ws").alias("term")).filter(
        F.length("term") >= IDX_MIN_TERM_LEN
    )
    tc = td.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    wr = Window.partitionBy("term").orderBy("doc_id")
    rk = tc.withColumn("rn", F.row_number().over(wr))
    return rk.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("c").alias("cf"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("rn") <= IDX_POSTINGS, F.col("doc_id"))
                    )
                ),
                lambda x: x.cast("string"),
            ),
        ).alias("postings"),
    )


BIGRAM_TOPK = 50


@query(
    "q_bigram_lm",
    oracle=f"""
    WITH toks AS (
      SELECT list_filter(string_split(text, ' '), w -> w != '') AS ws
      FROM documents
    ),
    bi AS (
      SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
             unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
      FROM toks WHERE len(ws) >= 2
    ),
    c12 AS (SELECT w1, w2, count(*) AS n12 FROM bi GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM c12 GROUP BY w1)
    SELECT c12.w1, c12.w2, c12.n12, c1.n1,
           (2000000 * c12.n12 + c1.n1) // (2 * c1.n1) AS p_e6
    FROM c12 JOIN c1 ON c1.w1 = c12.w1
    ORDER BY c12.n12 DESC, c12.w1, c12.w2
    LIMIT {BIGRAM_TOPK}
    """,
    doc=f"Bigram language model, top-{BIGRAM_TOPK} pairs: P(w2|w1) as the "
    "exact round-half-up e6 integer n12/n1 — the count-based conditional "
    "a data pipeline uses for boilerplate detection and cheap perplexity "
    "proxies. Pairs come from one array zip per document (no posexplode "
    "self-join); the unigram denominators reuse the bigram counts "
    "(sum over w2), so the corpus is tokenized exactly once. The top-k "
    "is orderBy+limit — Spark plans TakeOrderedAndProject (per-partition "
    "heaps + driver merge of k rows), never a single-partition global "
    "sort; ties are impossible in the (n12 desc, w1, w2) total order. "
    "The unigram denominators are a window over the bigram counts (one "
    "corpus pass; a second aggregate branch would re-scan and re-"
    "tokenize — AQE does not reuse exchanges across a join's sides).",
)
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(T.tokens(F.col("text")).alias("ws"))
    bi = (
        d.filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws) - 2),"
                    " i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    # unigram denominators as a window over the bigram aggregate: ONE corpus
    # tokenize/explode pass (a second groupBy branch re-scans the corpus —
    # AQE does not reuse the exchange across the join's build side), at the
    # cost of one metadata-sized re-partition of the w1/w2 counts.
    wn = Window.partitionBy("w1")
    return (
        c12.select(
            "w1",
            "w2",
            "n12",
            F.sum("n12").over(wn).alias("n1"),
        )
        .withColumn("p_e6", F.expr("(2000000 * n12 + n1) div (2 * n1)"))
        .orderBy(F.col("n12").desc(), "w1", "w2")
        .limit(BIGRAM_TOPK)
    )


NOVELTY_RARE_MAX = 1  # a bigram occurring <= this many times corpus-wide is "rare"


@query(
    "q_bigram_novelty",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w != '') AS ws
      FROM documents
    ),
    bi AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
             unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
      FROM toks WHERE len(ws) >= 2
    ),
    corpus AS (SELECT w1, w2, count(*) AS n12 FROM bi GROUP BY w1, w2),
    per_doc AS (
      SELECT b.doc_id,
             count(*) AS n_bigrams,
             CAST(sum(CASE WHEN c.n12 <= {NOVELTY_RARE_MAX} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_rare
      FROM bi b JOIN corpus c ON c.w1 = b.w1 AND c.w2 = b.w2
      GROUP BY b.doc_id
    )
    SELECT doc_id, n_bigrams, n_rare,
           (20000 * n_rare + n_bigrams) // (2 * n_bigrams) AS novelty_e4
    FROM per_doc
    """,
    doc=f"Per-document LM-novelty score: the fraction of a doc's bigrams "
    f"seen <= {NOVELTY_RARE_MAX} time(s) corpus-wide, as round-half-up e4 "
    "BIGINT — the count-based stand-in for the perplexity filter (CCNet-"
    "style): high novelty flags gibberish / OCR noise / wrong-language "
    "text whose word transitions the corpus LM has never seen, with no "
    "log() (not bit-portable across engines) anywhere. One tokenize "
    "pass feeds both the corpus bigram table and the per-doc join; the "
    "join key is the bigram (uniform-ish; the same max_df-style cap "
    "applies if a corpus had degenerate repeated bigrams).",
)
def q_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", T.tokens(F.col("text")).alias("ws")
    )
    bi = (
        d.filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws) - 2),"
                    " i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
        .persist()
    )
    corpus = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    per_doc = (
        bi.join(corpus, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.when(F.col("n12") <= NOVELTY_RARE_MAX, 1).otherwise(0)
            ).alias("n_rare"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "n_rare",
        F.expr("(20000 * n_rare + n_bigrams) div (2 * n_bigrams)").alias("novelty_e4"),
    )


@query(
    "q_bm25_indexed",
    oracle=_BM25_ORACLE,
    doc=f"BM25 top-{BM25_TOPK} against a PERSISTED full-text index "
    "(sources/text_index.py build_text_index/bm25_topk) — the production "
    "form of q_bm25_lite, which re-tokenizes the whole corpus per query "
    "(the text-side twin of the per-query IVF-training critique): "
    "postings (term, doc_id, tf, dl) are written ONCE partitioned by "
    "md5-term bucket, the one-row corpus stats beside them, and a query "
    "scans only its terms' bucket partitions (buckets computed "
    "driver-side — no job) with the exact-term filter pushed to the "
    "reader. Scoring is the identical integer rational, so rows equal "
    "q_bm25_lite's and the oracle is shared. Query cost scales with the "
    "query's postings, not the corpus.",
)
def q_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.scratch import built_once
    from hnarchive_spark.sources.text_index import bm25_topk, build_text_index

    # build-once cache (hnarchive_spark.scratch.built_once, the shared
    # q_*_indexed discipline): first invocation builds, later ones probe —
    # bench.py's warmup pays the build, min-of-3 measures the probe path.
    path = built_once(
        "text_index",
        sf_dir,
        lambda p: build_text_index(load(spark, sf_dir, "documents"), p),
    )
    return bm25_topk(spark, path, list(BM25_TERMS), BM25_TOPK)


@query(
    "q_bm25_append",
    oracle=_BM25_ORACLE,
    doc=f"Incremental text-index maintenance as a hash-checked query: the "
    "BM25 index is built from half the corpus (even doc_ids), the other "
    "half arrives via sources/text_index.py append_text_index — postings "
    "appended into the existing term-bucket partitions (pre-existing "
    "files byte-untouched, inode-locked in tests/test_text_index.py), "
    "corpus stats rewritten exactly — then probed. Because postings are "
    "complete and stats exact, the appended index returns EXACTLY the "
    "full-build rows, so this query shares the whole BM25 family's "
    "oracle: a green row proves the ingest path end-to-end against SQL, "
    "not just against the repo's own full build.",
)
def q_bm25_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.scratch import scratch_dir
    from hnarchive_spark.sources.text_index import (
        append_text_index,
        bm25_topk,
        build_text_index,
    )

    d = load(spark, sf_dir, "documents")
    path = scratch_dir("text_index_append")
    build_text_index(d.filter(F.col("doc_id") % 2 == 0), path)
    append_text_index(spark, d.filter(F.col("doc_id") % 2 == 1), path)
    return bm25_topk(spark, path, list(BM25_TERMS), BM25_TOPK)


@query(
    "q_bm25_compacted",
    oracle=_BM25_ORACLE,
    doc="Text-index COMPACTION as a hash-checked query (VERDICT r10 #3): "
    "the index is built from a quarter of the corpus and grown by three "
    "appends (each drops another small file into every touched term-"
    "bucket partition — the small-files tax months of ingest pay), then "
    "sources/text_index.py compact_text_index rewrites the postings "
    "clustered by bucket into <path>/v1 and publishes it with an atomic "
    "_CURRENT pointer swap; pre-compaction files stay byte-untouched for "
    "concurrent readers and file count strictly drops "
    "(tests/test_text_index.py). Postings rows and stats are unchanged, "
    "so the probe returns EXACTLY the full-build rows and the query "
    "shares the whole BM25 family's oracle — 'compaction changes layout, "
    "never results' becomes a per-round hash check.",
)
def q_bm25_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.scratch import scratch_dir
    from hnarchive_spark.sources.text_index import (
        append_text_index,
        bm25_topk,
        build_text_index,
        compact_text_index,
    )

    d = load(spark, sf_dir, "documents")
    path = scratch_dir("text_index_compact")
    build_text_index(d.filter(F.col("doc_id") % 4 == 0), path)
    for m in (1, 2, 3):
        append_text_index(spark, d.filter(F.col("doc_id") % 4 == m), path)
    compact_text_index(spark, path)
    return bm25_topk(spark, path, list(BM25_TERMS), BM25_TOPK)


# ---- hybrid retrieval: reciprocal rank fusion ----------------------------

HYBRID_QUERIES = 5  # query docs = doc_id < 5 (the ANN query-set convention)
HYBRID_CAND_K = 20  # per-ranker candidate depth
HYBRID_TOPK = 10
RRF_K = 60  # the standard RRF dampening constant (Cormack et al.)
# stop-term guard for the indexed lexical leg: query terms appearing in
# more than this % of the corpus are dropped before scoring — binds at
# both test scales (the fixture vocab is small and uniform: median query
# term df ~78% of docs) and doubles as the poor-man's idf
HYBRID_MAX_DF_PCT = 79


def _rrf_fuse(
    lex: DataFrame, dense: DataFrame, topk: int = HYBRID_TOPK
) -> DataFrame:
    """Reciprocal rank fusion of two (query_id, doc_id, *_rank) legs —
    exact integer math (floor-div reciprocals, missing-leg contribution
    0), final top-k per query with doc_id tiebreak.  Shared by the inline
    and the persisted-index hybrid so the fusion cannot drift between
    them; both legs are k-rows-per-query frames, so the full-outer join
    and the window are metadata-width.  ``topk`` widens the served depth
    for rerank-shortlist consumers (q_rerank_recall10 reranks a deeper
    fused list before serving the head)."""
    fused = lex.join(dense, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        "lex_rank",
        "dense_rank",
        (
            F.coalesce(F.expr(f"1000000000 div ({RRF_K} + lex_rank)"), F.lit(0))
            + F.coalesce(F.expr(f"1000000000 div ({RRF_K} + dense_rank)"), F.lit(0))
        ).alias("rrf_e9"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("rrf_e9").desc(), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= topk)
    )


def _hybrid_cte_body() -> str:
    """The inline hybrid's CTE chain through ``fused`` — shared by the
    ranked-output oracle and the recall harness (which appends the
    exact-cosine arm and the overlap count on top of the same chain)."""
    from hnarchive_spark.plans.dedup import _SHINGLES_RAW

    return f"""{_SHINGLES_RAW},
    qsh AS (SELECT doc_id AS query_id, shingle FROM sh WHERE doc_id < {HYBRID_QUERIES}),
    ovl AS (
      SELECT q.query_id, sh.doc_id, CAST(count(*) AS BIGINT) AS common
      FROM qsh q JOIN sh ON sh.shingle = q.shingle AND sh.doc_id != q.query_id
      GROUP BY q.query_id, sh.doc_id
    ),
    lex_r AS (
      SELECT query_id, doc_id, rnk AS lex_rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY common DESC, doc_id) AS rnk
        FROM ovl
      ) WHERE rnk <= {HYBRID_CAND_K}
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {HYBRID_QUERIES}),
    scored AS (
      SELECT q.query_id, a.vec_id AS doc_id,
             CAST(round(list_cosine_similarity(q.qv, a.v) * 1000000) AS BIGINT) AS cos_e6
      FROM e a CROSS JOIN q
      WHERE a.vec_id != q.query_id
    ),
    dense_r AS (
      SELECT query_id, doc_id, rnk AS dense_rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_e6 DESC, doc_id) AS rnk
        FROM scored
      ) WHERE rnk <= {HYBRID_CAND_K}
    ),
    fused AS (
      SELECT coalesce(l.query_id, d.query_id) AS query_id,
             coalesce(l.doc_id, d.doc_id) AS doc_id,
             l.lex_rank, d.dense_rank,
             coalesce(1000000000 // ({RRF_K} + l.lex_rank), 0)
               + coalesce(1000000000 // ({RRF_K} + d.dense_rank), 0) AS rrf_e9
      FROM lex_r l FULL JOIN dense_r d
        ON l.query_id = d.query_id AND l.doc_id = d.doc_id
    )"""


def _hybrid_oracle() -> str:
    return f"""
    WITH {_hybrid_cte_body()}
    SELECT query_id, doc_id, lex_rank, dense_rank, rrf_e9, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_e9 DESC, doc_id) AS rank
      FROM fused
    ) WHERE rank <= {HYBRID_TOPK}
    """


def _hybrid_recall_oracle() -> str:
    """Recall@{topk} of the fused ranking against the exact-cosine top-k:
    the hybrid chain's own ``e``/``q`` CTEs feed the exact arm, the
    q_ann_recall left-join overlap tail keeps zero-recall queries."""
    return f"""
    WITH {_hybrid_cte_body()},
    hyb AS (
      SELECT query_id, doc_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rrf_e9 DESC, doc_id) AS rank
        FROM fused
      ) WHERE rank <= {HYBRID_TOPK}
    ),
    exact AS (
      SELECT query_id, doc_id FROM (
        SELECT q.query_id, a.vec_id AS doc_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY CAST(round(list_cosine_similarity(q.qv, a.v) * 1000000) AS BIGINT) DESC,
                          a.vec_id) AS rank
        FROM e a CROSS JOIN q WHERE a.vec_id != q.query_id
      ) WHERE rank <= {HYBRID_TOPK}
    )
    SELECT x.query_id, count(h.doc_id) AS n_hits,
           CAST((count(h.doc_id) * 10000) // {HYBRID_TOPK} AS BIGINT) AS recall_e4
    FROM exact x
    LEFT JOIN hyb h ON h.query_id = x.query_id AND h.doc_id = x.doc_id
    GROUP BY x.query_id
    """


@query(
    "q_hybrid_search_rrf",
    oracle=_hybrid_oracle(),
    doc=f"Hybrid retrieval with reciprocal rank fusion — the RAG-stack "
    f"compound: per query doc, a LEXICAL more-like-this ranking (distinct "
    f"word-3gram overlap via the inverted shingle index — the sparse leg) "
    f"and a DENSE cosine ranking (brute-force here; at scale the leg swaps "
    f"for the persisted IVF-PQ probe, same (query_id, doc_id, rank) "
    f"contract) fuse as score = sum over legs of 1e9 div ({RRF_K} + rank) "
    f"(Cormack et al.'s RRF with the standard k={RRF_K}), candidates = the "
    f"union of each leg's top-{HYBRID_CAND_K}, missing-leg contribution 0, "
    f"final top-{HYBRID_TOPK} per query with doc_id tiebreak. The fusion "
    "is exact integer math end to end (floor-div reciprocals), so the "
    "compound two-retriever operator is value-hash-checked, nullable "
    "per-leg ranks included. Scale shape: the sparse leg shuffles on the "
    "shingle (the inverted index, max_df-guardable), the dense leg is one "
    "broadcast-query corpus pass, the fusion joins two k-row-per-query "
    "frames — metadata-width.",
)
def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.operators import dedup as D
    from hnarchive_spark.operators.similarity import cosine_topk

    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")

    sh = D.word_shingles(d)
    qsh = sh.filter(F.col("doc_id") < HYBRID_QUERIES).select(
        F.col("doc_id").alias("query_id"), "shingle"
    )
    ovl = (
        qsh.join(sh, "shingle")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    wl = Window.partitionBy("query_id").orderBy(F.col("common").desc(), "doc_id")
    lex = (
        ovl.withColumn("lex_rank", F.row_number().over(wl))
        .filter(F.col("lex_rank") <= HYBRID_CAND_K)
        .select("query_id", "doc_id", "lex_rank")
    )
    dense = (
        cosine_topk(e, e.filter(F.col("vec_id") < HYBRID_QUERIES), HYBRID_CAND_K)
        .select("query_id", F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("dense_rank"))
    )
    return _rrf_fuse(lex, dense)


@query(
    "q_hybrid_recall",
    oracle=_hybrid_recall_oracle(),
    doc=f"Hybrid-retrieval quality harness: recall@{HYBRID_TOPK} of the "
    "RRF-fused ranking against the exact-cosine top-k ground truth, per "
    "query, as a floor-divided e4 integer — the q_ann_recall companion "
    "for the compound two-retriever operator (it evaluates what fusion "
    "actually buys: a doc the dense leg's candidate depth missed can "
    "still fuse in via the lexical leg and vice versa). Both arms are "
    "registered operators; the left join keeps zero-recall queries. At "
    "100 TB the exact arm is the one corpus pass a quality audit pays "
    "offline; the hybrid arm is the serving path being audited.",
)
def q_hybrid_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.operators.similarity import cosine_topk

    e = load(spark, sf_dir, "embeddings")
    exact = cosine_topk(
        e, e.filter(F.col("vec_id") < HYBRID_QUERIES), HYBRID_TOPK
    ).select("query_id", F.col("neighbor_id").alias("doc_id"))
    hyb = q_hybrid_search_rrf(spark, sf_dir).select(
        F.col("query_id").alias("h_qid"), F.col("doc_id").alias("h_did")
    )
    return (
        exact.join(
            hyb,
            (exact.query_id == hyb.h_qid) & (exact.doc_id == hyb.h_did),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("h_did").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.expr(f"(n_hits * 10000) div {HYBRID_TOPK}").alias("recall_e4"),
        )
    )


def _hybrid_indexed_oracle() -> str:
    """The indexed hybrid's oracle: the IVF-PQ CTE chain (through ``adc``,
    the exact chain q_ann_ivfpq_indexed verifies) as the dense leg, the
    BM25 family's tokenize/stats/score chain generalized per-query as the
    lexical leg, spliced onto the same RRF fusion SQL as the inline
    form.  CTE namespaces are disjoint (el/cent/probes/s{m}*/qd{m}/adc vs
    toks/st/qterms/lxp/lxsc*) so the generators compose verbatim."""
    parts = _hybrid_indexed_parts()
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT query_id, doc_id, lex_rank, dense_rank, rrf_e9, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_e9 DESC, doc_id) AS rank
      FROM fused
    ) WHERE rank <= {HYBRID_TOPK}"""
    )


def _hybrid_indexed_parts() -> list[str]:
    """The indexed hybrid's CTE chain through ``fused`` — shared by the
    ranked-output oracle and the per-leg recall-arms harness."""
    from hnarchive_spark.plans.similarity import (
        IVFPQ_N_PROBE,
        PQ_ITERS,
        PQ_K,
        PQ_M,
        _ivfpq_parts,
    )
    from hnarchive_spark.plans import similarity as SIM

    parts = _ivfpq_parts(
        PQ_K, PQ_ITERS, PQ_M, SIM.S.DIM // PQ_M, HYBRID_QUERIES, IVFPQ_N_PROBE
    )
    parts.append(f"""dense_r AS (
      SELECT query_id, vec_id AS doc_id, rnk AS dense_rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc_e6, vec_id) AS rnk
        FROM adc
      ) WHERE rnk <= {HYBRID_CAND_K}
    )""")
    parts.append("""toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w != '') AS ws
      FROM documents
    ),
    st AS (
      SELECT CAST(sum(len(ws)) AS BIGINT) AS s, count(*) AS n FROM toks
    )""")
    parts.append(f"""qterms AS (
      SELECT DISTINCT query_id, term FROM (
        SELECT doc_id AS query_id, unnest(ws) AS term FROM toks
        WHERE doc_id < {HYBRID_QUERIES}
      )
    ),
    lxp AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
             CAST(any_value(dl) AS BIGINT) AS dl
      FROM (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM toks)
      GROUP BY doc_id, term
    ),
    lxdf AS (SELECT term, count(*) AS df FROM lxp GROUP BY term),
    lxsc0 AS (
      SELECT q.query_id, p.doc_id, p.tf, p.dl,
             {bm25_avgdl_sql(div='//', s='st.s', n='st.n')} AS a
      FROM qterms q JOIN lxp p USING (term)
      JOIN lxdf USING (term) CROSS JOIN st
      WHERE p.doc_id != q.query_id
        AND lxdf.df <= (st.n * {HYBRID_MAX_DF_PCT}) // 100
    ),
    lxsc AS (
      SELECT query_id, doc_id,
             CAST(sum({bm25_score_sql(div='//')}) AS BIGINT) AS lex_score_e6
      FROM lxsc0 GROUP BY query_id, doc_id
    ),
    lex_r AS (
      SELECT query_id, doc_id, rnk AS lex_rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY lex_score_e6 DESC, doc_id) AS rnk
        FROM lxsc
      ) WHERE rnk <= {HYBRID_CAND_K}
    ),
    fused AS (
      SELECT coalesce(l.query_id, d.query_id) AS query_id,
             coalesce(l.doc_id, d.doc_id) AS doc_id,
             l.lex_rank, d.dense_rank,
             coalesce(1000000000 // ({RRF_K} + l.lex_rank), 0)
               + coalesce(1000000000 // ({RRF_K} + d.dense_rank), 0) AS rrf_e9
      FROM lex_r l FULL JOIN dense_r d
        ON l.query_id = d.query_id AND l.doc_id = d.doc_id
    )""")
    return parts


@query(
    "q_hybrid_search_rrf_indexed",
    oracle=_hybrid_indexed_oracle(),
    doc=f"Hybrid retrieval on the PERSISTED indexes — the production RAG "
    "serving path q_hybrid_search_rrf's docstring promises: the lexical "
    "leg is a per-query-doc BM25 ranking against the persisted text index "
    "(sources/text_index.py bm25_query_topk — bucket scan pruned driver-"
    "side to the union of the query docs' terms, exact-term filter pushed "
    "to the reader, score = sum of the family's exact per-term e6 "
    f"rationals, stop-term guard dropping terms in > {HYBRID_MAX_DF_PCT}% "
    "of the corpus before scoring — the text analog of max_band_df, and "
    "the poor-man's idf since the integer BM25 is deliberately log-free; "
    "replayed exactly in the oracle), the dense leg is the persisted "
    "IVF-PQ probe "
    "(probe_ivfpq_topk — partition-pruned list scan, broadcast ADC LUT, "
    "zero training), and the two (query, doc, rank) frames fuse with the "
    f"same RRF integer math (k={RRF_K}) via the shared _rrf_fuse. Both "
    "indexes are built_once (shared with q_bm25_indexed / "
    "q_ann_ivfpq_indexed — ONE physical index each per session; bench "
    "warmup pays the builds, min-of-3 measures the serving path). Query "
    "cost at 100 TB: the query terms' postings + the probed lists' codes "
    "+ two k-row-per-query fusion frames — never a corpus pass.",
)
def q_hybrid_search_rrf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    lex, dense = _indexed_hybrid_legs(spark, sf_dir)
    return _rrf_fuse(lex, dense)


def _indexed_hybrid_legs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The persisted-index serving legs: (lex, dense) as (query_id,
    doc_id, *_rank) frames — shared by the indexed hybrid and its
    per-leg recall-arms harness so the audited legs ARE the served
    legs."""
    from hnarchive_spark.plans.similarity import (
        IVFPQ_N_PROBE,
        PQ_ITERS,
        PQ_K,
        PQ_M,
    )
    from hnarchive_spark.scratch import built_once
    from hnarchive_spark.sources.ann_index import build_ivfpq_index, probe_ivfpq_topk
    from hnarchive_spark.sources.text_index import bm25_query_topk, build_text_index

    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    tpath = built_once("text_index", sf_dir, lambda p: build_text_index(d, p))
    apath = built_once(
        "ivfpq_index", sf_dir, lambda p: build_ivfpq_index(e, p, PQ_M, PQ_K, PQ_ITERS)
    )
    # query-sized collect (HYBRID_QUERIES rows): the query docs' token
    # lists must reach the driver anyway for bm25_query_topk's driver-side
    # bucket pruning — the bm25_topk discipline, terms known before the job
    qrows = (
        d.filter(F.col("doc_id") < HYBRID_QUERIES)
        .select("doc_id", T.tokens(F.col("text")).alias("ws"))
        .collect()
    )
    lex = bm25_query_topk(
        spark,
        tpath,
        [(r["doc_id"], r["ws"]) for r in qrows],
        HYBRID_CAND_K,
        max_df_pct=HYBRID_MAX_DF_PCT,
    ).select("query_id", "doc_id", F.col("rank").alias("lex_rank"))
    dense = probe_ivfpq_topk(
        spark,
        apath,
        e.filter(F.col("vec_id") < HYBRID_QUERIES),
        HYBRID_CAND_K,
        PQ_M,
        n_probe=IVFPQ_N_PROBE,
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("dense_rank"),
    )
    return lex, dense


def _hybrid_recall_arms_oracle() -> str:
    """Three recall arms against the exact-cosine top-k: the indexed
    chain's own lex_r / dense_r / fused CTEs feed per-leg top-k arms, a
    standalone exact arm (ex_a / ex_q, disjoint namespace) supplies the
    ground truth, and the three per-query hit counts join on query_id
    (separate aggregates — a single multi-left-join would multiply
    rows)."""
    parts = _hybrid_indexed_parts()
    arm = "SELECT x.query_id, count({a}.doc_id) AS {n} FROM exact x LEFT JOIN {t} {a} ON {a}.query_id = x.query_id AND {a}.doc_id = x.doc_id GROUP BY x.query_id"
    parts.append(f"""ex_q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
      WHERE vec_id < {HYBRID_QUERIES}
    ),
    exact AS (
      SELECT query_id, doc_id FROM (
        SELECT q.query_id, a.vec_id AS doc_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY CAST(round(list_cosine_similarity(q.qv, a.embedding::DOUBLE[]) * 1000000) AS BIGINT) DESC,
                          a.vec_id) AS rank
        FROM embeddings a CROSS JOIN ex_q q WHERE a.vec_id != q.query_id
      ) WHERE rank <= {HYBRID_TOPK}
    ),
    lex10 AS (SELECT query_id, doc_id FROM lex_r WHERE lex_rank <= {HYBRID_TOPK}),
    dense10 AS (SELECT query_id, doc_id FROM dense_r WHERE dense_rank <= {HYBRID_TOPK}),
    hyb AS (
      SELECT query_id, doc_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rrf_e9 DESC, doc_id) AS rank
        FROM fused
      ) WHERE rank <= {HYBRID_TOPK}
    ),
    la AS ({arm.format(a="l", n="lex_hits", t="lex10")}),
    da AS ({arm.format(a="d", n="dense_hits", t="dense10")}),
    fa AS ({arm.format(a="h", n="fused_hits", t="hyb")})""")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT la.query_id,
           CAST(lex_hits AS BIGINT) AS lex_hits,
           CAST(dense_hits AS BIGINT) AS dense_hits,
           CAST(fused_hits AS BIGINT) AS fused_hits,
           CAST((lex_hits * 10000) // {HYBRID_TOPK} AS BIGINT) AS lex_recall_e4,
           CAST((dense_hits * 10000) // {HYBRID_TOPK} AS BIGINT) AS dense_recall_e4,
           CAST((fused_hits * 10000) // {HYBRID_TOPK} AS BIGINT) AS fused_recall_e4
    FROM la JOIN da ON da.query_id = la.query_id
    JOIN fa ON fa.query_id = la.query_id"""
    )


@query(
    "q_hybrid_recall_arms",
    oracle=_hybrid_recall_arms_oracle(),
    doc=f"Per-LEG recall arms for the indexed hybrid serving path "
    "(VERDICT r14 #5): recall@"
    f"{HYBRID_TOPK} of the lexical-only (BM25-index top-k), dense-only "
    "(IVF-PQ probe top-k) and RRF-fused rankings against the exact-"
    "cosine ground truth, per query — 'what fusion buys over a single "
    "leg' as three recorded integers per round instead of a docstring "
    "claim. The legs are _indexed_hybrid_legs, the SAME frames the "
    "serving query fuses (audited path = served path); each arm's hits "
    "aggregate separately and join on query_id (a single multi-left-"
    "join would multiply rows). At 100 TB the exact arm is the one "
    "corpus pass a quality audit pays offline; the legs stay pruned "
    "index probes.",
)
def q_hybrid_recall_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.operators.similarity import cosine_topk

    e = load(spark, sf_dir, "embeddings")
    exact = cosine_topk(
        e, e.filter(F.col("vec_id") < HYBRID_QUERIES), HYBRID_TOPK
    ).select("query_id", F.col("neighbor_id").alias("doc_id"))
    lex, dense = _indexed_hybrid_legs(spark, sf_dir)
    arms = {
        "lex_hits": lex.filter(F.col("lex_rank") <= HYBRID_TOPK),
        "dense_hits": dense.filter(F.col("dense_rank") <= HYBRID_TOPK),
        "fused_hits": _rrf_fuse(lex, dense),
    }
    out = None
    for name, arm in arms.items():
        a = arm.select(
            F.col("query_id").alias("a_qid"), F.col("doc_id").alias("a_did")
        )
        agg = (
            exact.join(
                a,
                (exact.query_id == a.a_qid) & (exact.doc_id == a.a_did),
                "left",
            )
            .groupBy("query_id")
            .agg(F.count("a_did").alias(name))
        )
        out = agg if out is None else out.join(agg, "query_id")
    return out.select(
        "query_id",
        "lex_hits",
        "dense_hits",
        "fused_hits",
        F.expr(f"(lex_hits * 10000) div {HYBRID_TOPK}").alias("lex_recall_e4"),
        F.expr(f"(dense_hits * 10000) div {HYBRID_TOPK}").alias("dense_recall_e4"),
        F.expr(f"(fused_hits * 10000) div {HYBRID_TOPK}").alias("fused_recall_e4"),
    )


def _hybrid_rerank_oracle() -> str:
    """The rerank oracle: the indexed chain's own ``fused`` CTE supplies
    the stage-1 shortlist, then the exact-cosine refine replays as a
    plain join of the shortlist against the query and candidate vectors
    (namespaces rq/rr, disjoint from the chain's)."""
    parts = _hybrid_indexed_parts()
    parts.append(f"""hyb AS (
      SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rrf_rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rrf_e9 DESC, doc_id) AS rank
        FROM fused
      ) WHERE rank <= {HYBRID_TOPK}
    ),
    rq AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
      WHERE vec_id < {HYBRID_QUERIES}
    ),
    rr AS (
      SELECT h.query_id, h.doc_id, h.rrf_rank,
             CAST(round(list_cosine_similarity(q.qv, a.embedding::DOUBLE[])
                        * 1000000) AS BIGINT) AS cos_e6
      FROM hyb h JOIN rq q ON q.query_id = h.query_id
      JOIN embeddings a ON a.vec_id = h.doc_id
    )""")
    return (
        "WITH "
        + ",\n".join(parts)
        + """
    SELECT query_id, doc_id, rrf_rank, cos_e6,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_e6 DESC, doc_id) AS BIGINT)
             AS rerank
    FROM rr"""
    )


@query(
    "q_hybrid_rerank",
    oracle=_hybrid_rerank_oracle(),
    doc=f"Second-stage EXACT-REFINE rerank over the indexed hybrid "
    "serving path — the stage the RAG stack runs between retrieval and "
    f"the context window: stage 1 serves the fused top-{HYBRID_TOPK} "
    "per query from the persisted BM25 + IVF-PQ indexes "
    "(q_hybrid_search_rrf_indexed's exact frames), stage 2 fetches the "
    "candidates' FULL-PRECISION vectors and re-orders the shortlist by "
    "exact cosine (doc_id tiebreak) — repairing the rank error the "
    "PQ-compressed ADC distances and the integer RRF introduce, at a "
    "cost that is O(queries x k), never a corpus pass. The stage-1 "
    "shortlist is collected app-side (bounded: HYBRID_QUERIES x "
    f"{HYBRID_TOPK} rows — in a serving system it lives there anyway) "
    "so stage 2 pushes an explicit In(vec_id, ...) id-list filter into "
    "the vector-store scan: a point-list fetch with row-group pruning, "
    "not a join against the corpus. Output carries both orders "
    "(rrf_rank, rerank) plus cos_e6, so the refine's effect is "
    "auditable per query.",
)
def q_hybrid_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.scratch import built_once
    from hnarchive_spark.sources.vec_store import build_vec_store, fetch_vectors

    lex, dense = _indexed_hybrid_legs(spark, sf_dir)
    shortlist = _rrf_fuse(lex, dense).select(
        "query_id", "doc_id", F.col("rank").cast("long").alias("rrf_rank")
    )
    # bounded collect (HYBRID_QUERIES * HYBRID_TOPK rows, the :774
    # discipline): materializing the stage-1 shortlist is what makes the
    # stage-2 fetch a PUSHED point-list read instead of a corpus join.
    rows = shortlist.collect()
    ids = sorted({int(r["doc_id"]) for r in rows} | set(range(HYBRID_QUERIES)))
    # stage 2 serves from the id-bucketed raw-vector store (built_once —
    # the warmup pays the build, like the text/IVF-PQ indexes): the fetch
    # carries a bucket PartitionFilter AND the pushed In(vec_id, ...), so
    # at scale it reads only the shortlist's own buckets.
    vpath = built_once(
        "vec_store",
        sf_dir,
        lambda p: build_vec_store(spark, load(spark, sf_dir, "embeddings"), p),
    )
    return _exact_refine(spark, rows, fetch_vectors(spark, vpath, ids))


def _exact_refine(spark: SparkSession, rows, vectors: DataFrame) -> DataFrame:
    """Stage 2 of the retrieve->rerank serve, shared by q_hybrid_rerank
    and the amplified-archive probe (tools/rag_serving_probe.py) so the
    measured path IS the served path: re-order a COLLECTED shortlist
    (query_id, doc_id, rrf_rank rows) by full-precision exact cosine
    against ``vectors`` (vec_id, embedding).  The id-list filter is
    built from the bounded shortlist, so the fetch is a pushed
    point-list scan — cost O(queries x k), independent of archive
    size."""
    from hnarchive_spark.operators.similarity import as_double, cosine

    cand_ids = sorted({int(r["doc_id"]) for r in rows})
    cand = spark.createDataFrame(
        [(int(r["query_id"]), int(r["doc_id"]), int(r["rrf_rank"])) for r in rows],
        "query_id long, doc_id long, rrf_rank long",
    )
    qv = vectors.filter(F.col("vec_id") < HYBRID_QUERIES).select(
        F.col("vec_id").alias("query_id"), as_double(F.col("embedding")).alias("qv")
    )
    cv = vectors.filter(F.col("vec_id").isin(cand_ids)).select(
        F.col("vec_id").alias("doc_id"), as_double(F.col("embedding")).alias("cv")
    )
    cos_e6 = F.round(cosine(F.col("qv"), F.col("cv")) * 1_000_000, 0).cast("long")
    wr = Window.partitionBy("query_id").orderBy(F.col("cos_e6").desc(), "doc_id")
    return (
        F.broadcast(cand)
        .join(qv, "query_id")
        .join(F.broadcast(cv), "doc_id")
        .select("query_id", "doc_id", "rrf_rank", cos_e6.alias("cos_e6"))
        .withColumn("rerank", F.row_number().over(wr).cast("long"))
    )


def _rerank_top1_oracle() -> str:
    """Three top-1 arms over the rerank chain's own CTEs: the fused
    top-1 (rrf_rank = 1), the reranked top-1 (exact-cosine re-order of
    the shortlist), and the offline exact-cosine top-1 over the WHOLE
    corpus (ground truth) — namespaces rr2/f1/r1/xq/x1, disjoint from
    the chain's."""
    parts = _hybrid_indexed_parts()
    parts.append(f"""hyb AS (
      SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rrf_rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rrf_e9 DESC, doc_id) AS rank
        FROM fused
      ) WHERE rank <= {HYBRID_TOPK}
    ),
    rq AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
      WHERE vec_id < {HYBRID_QUERIES}
    ),
    rr AS (
      SELECT h.query_id, h.doc_id, h.rrf_rank,
             CAST(round(list_cosine_similarity(q.qv, a.embedding::DOUBLE[])
                        * 1000000) AS BIGINT) AS cos_e6
      FROM hyb h JOIN rq q ON q.query_id = h.query_id
      JOIN embeddings a ON a.vec_id = h.doc_id
    ),
    rr2 AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_e6 DESC, doc_id) AS rerank
      FROM rr
    ),
    f1 AS (SELECT query_id, doc_id AS fused_top1 FROM rr2 WHERE rrf_rank = 1),
    r1 AS (SELECT query_id, doc_id AS rerank_top1 FROM rr2 WHERE rerank = 1),
    x1 AS (
      SELECT query_id, doc_id AS exact_top1 FROM (
        SELECT q.query_id, a.vec_id AS doc_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY CAST(round(list_cosine_similarity(q.qv, a.embedding::DOUBLE[]) * 1000000) AS BIGINT) DESC,
                          a.vec_id) AS rk
        FROM embeddings a CROSS JOIN rq q WHERE a.vec_id != q.query_id
      ) WHERE rk = 1
    )""")
    return (
        "WITH "
        + ",\n".join(parts)
        + """
    SELECT f1.query_id, fused_top1, rerank_top1, exact_top1,
           CAST(CASE WHEN fused_top1 = exact_top1 THEN 1 ELSE 0 END AS BIGINT)
             AS fused_correct,
           CAST(CASE WHEN rerank_top1 = exact_top1 THEN 1 ELSE 0 END AS BIGINT)
             AS rerank_correct
    FROM f1
    JOIN r1 ON r1.query_id = f1.query_id
    JOIN x1 ON x1.query_id = f1.query_id"""
    )


RERANK_DEPTH = HYBRID_CAND_K  # stage-1 shortlist depth the rerank re-orders


def _rerank_recall10_oracle() -> str:
    """Recall@{topk} arms for the reranked serve: the indexed chain's own
    ``fused`` CTE ranked to RERANK_DEPTH (hyb20), the exact-cosine
    re-order (rr2), head-10 of each order (f10/g10), the exact-cosine
    top-10 ground truth (x10), per-arm hit counts aggregated separately
    and joined on query_id (the q_hybrid_recall_arms discipline)."""
    parts = _hybrid_indexed_parts()
    parts.append(f"""hyb20 AS (
      SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rrf_rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rrf_e9 DESC, doc_id) AS rank
        FROM fused
      ) WHERE rank <= {RERANK_DEPTH}
    ),
    rq AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
      WHERE vec_id < {HYBRID_QUERIES}
    ),
    rr2 AS (
      SELECT query_id, doc_id, rrf_rank,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_e6 DESC, doc_id) AS rerank
      FROM (
        SELECT h.query_id, h.doc_id, h.rrf_rank,
               CAST(round(list_cosine_similarity(q.qv, a.embedding::DOUBLE[])
                          * 1000000) AS BIGINT) AS cos_e6
        FROM hyb20 h JOIN rq q ON q.query_id = h.query_id
        JOIN embeddings a ON a.vec_id = h.doc_id
      )
    ),
    f10 AS (SELECT query_id, doc_id FROM rr2 WHERE rrf_rank <= {HYBRID_TOPK}),
    g10 AS (SELECT query_id, doc_id FROM rr2 WHERE rerank <= {HYBRID_TOPK}),
    x10 AS (
      SELECT query_id, doc_id FROM (
        SELECT q.query_id, a.vec_id AS doc_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY CAST(round(list_cosine_similarity(q.qv, a.embedding::DOUBLE[]) * 1000000) AS BIGINT) DESC,
                          a.vec_id) AS rk
        FROM embeddings a CROSS JOIN rq q WHERE a.vec_id != q.query_id
      ) WHERE rk <= {HYBRID_TOPK}
    ),
    fa AS (
      SELECT x.query_id, count(f.doc_id) AS fused_hits FROM x10 x
      LEFT JOIN f10 f ON f.query_id = x.query_id AND f.doc_id = x.doc_id
      GROUP BY x.query_id
    ),
    ga AS (
      SELECT x.query_id, count(g.doc_id) AS rerank_hits FROM x10 x
      LEFT JOIN g10 g ON g.query_id = x.query_id AND g.doc_id = x.doc_id
      GROUP BY x.query_id
    )""")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT fa.query_id,
           CAST(fused_hits AS BIGINT) AS fused_hits,
           CAST(rerank_hits AS BIGINT) AS rerank_hits,
           CAST((fused_hits * 10000) // {HYBRID_TOPK} AS BIGINT) AS fused_recall_e4,
           CAST((rerank_hits * 10000) // {HYBRID_TOPK} AS BIGINT) AS rerank_recall_e4
    FROM fa JOIN ga ON ga.query_id = fa.query_id"""
    )


@query(
    "q_rerank_recall10",
    oracle=_rerank_recall10_oracle(),
    doc=f"Recall@{HYBRID_TOPK} AFTER the exact-refine rerank (VERDICT r15 "
    "#6) — the refine's effect on the FULL served list, beside "
    "q_rerank_top1_fix's top-1 arms: stage 1 serves a DEEPER fused "
    f"shortlist (top-{RERANK_DEPTH}, the per-leg candidate depth), "
    "stage 2 re-orders it by full-precision cosine from the vec store, "
    "and the arms compare the head-10 of the FUSED order (what stage 1 "
    "alone would serve) vs the head-10 of the RERANKED order against "
    "the exact-cosine top-10 ground truth. The deeper shortlist is what "
    "gives the refine room to work: it can PROMOTE true neighbors that "
    f"RRF over PQ-compressed distances ranked 11..{RERANK_DEPTH} into "
    "the served 10 — rerank_hits >= fused_hits whenever the truth is "
    "anywhere in the shortlist. Same bounded-collect + point-fetch "
    "serve shape as q_hybrid_rerank; the exact arm is the one corpus "
    "pass a quality audit pays offline.",
)
def q_rerank_recall10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.operators.similarity import cosine_topk
    from hnarchive_spark.scratch import built_once
    from hnarchive_spark.sources.vec_store import build_vec_store, fetch_vectors

    lex, dense = _indexed_hybrid_legs(spark, sf_dir)
    shortlist = _rrf_fuse(lex, dense, topk=RERANK_DEPTH).select(
        "query_id", "doc_id", F.col("rank").cast("long").alias("rrf_rank")
    )
    rows = shortlist.collect()  # bounded: HYBRID_QUERIES x RERANK_DEPTH
    ids = sorted({int(r["doc_id"]) for r in rows} | set(range(HYBRID_QUERIES)))
    vpath = built_once(
        "vec_store",
        sf_dir,
        lambda p: build_vec_store(spark, load(spark, sf_dir, "embeddings"), p),
    )
    rr = _exact_refine(spark, rows, fetch_vectors(spark, vpath, ids))

    e = load(spark, sf_dir, "embeddings")
    exact = cosine_topk(
        e, e.filter(F.col("vec_id") < HYBRID_QUERIES), HYBRID_TOPK
    ).select("query_id", F.col("neighbor_id").alias("doc_id"))
    # Both arms from ONE left join + ONE aggregate (guide §1.2: the old
    # per-arm loop referenced `exact` — the offline corpus cross-join
    # ground truth, the query's dominant pass — and the refine subtree
    # once PER ARM, so the corpus pass ran twice per action.  (query_id,
    # doc_id) is unique in both `exact` (row_number top-k) and `rr` (the
    # shortlist is distinct per query), so the left join yields exactly
    # one row per exact row and counting rank-conditioned matches is
    # bit-identical to the per-arm filtered joins: plans/r18/
    # q_rerank_recall10_{before,after}.txt — 2 -> 1 BroadcastNestedLoop
    # corpus joins, 15 -> 8 Exchange, 8 -> 4 parquet scans.)
    a = rr.select(
        F.col("query_id").alias("a_qid"),
        F.col("doc_id").alias("a_did"),
        "rrf_rank",
        "rerank",
    )
    out = (
        exact.join(
            a,
            (exact.query_id == a.a_qid) & (exact.doc_id == a.a_did),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.when(F.col("rrf_rank") <= HYBRID_TOPK, F.lit(1))).alias(
                "fused_hits"
            ),
            F.count(F.when(F.col("rerank") <= HYBRID_TOPK, F.lit(1))).alias(
                "rerank_hits"
            ),
        )
    )
    return out.select(
        "query_id",
        "fused_hits",
        "rerank_hits",
        F.expr(f"(fused_hits * 10000) div {HYBRID_TOPK}").alias("fused_recall_e4"),
        F.expr(f"(rerank_hits * 10000) div {HYBRID_TOPK}").alias("rerank_recall_e4"),
    )


@query(
    "q_rerank_top1_fix",
    oracle=_rerank_top1_oracle(),
    doc="What the exact-refine rerank BUYS, recorded as integers per "
    "round (the q_hybrid_recall_arms discipline applied to stage 2): "
    "per query, the fused top-1 (what RRF over PQ-compressed distances "
    "would serve first), the reranked top-1 (after the full-precision "
    "re-order), and the offline exact-cosine top-1 over the whole "
    "corpus (ground truth), with correctness flags for both arms. "
    "rerank_correct >= fused_correct by construction whenever the true "
    "top-1 is anywhere in the shortlist — the refine turns candidate "
    "recall into top-rank precision, which is exactly its job in a RAG "
    "stack. The audited path IS the served path (the arms derive from "
    "q_hybrid_rerank's own output); the exact arm is the one corpus "
    "pass a quality audit pays offline.",
)
def q_rerank_top1_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.operators.similarity import cosine_topk

    # Run q_hybrid_rerank's exact-refine stage-2 ONCE (guide §1.2, VERDICT
    # r18 #5): the old per-arm filters referenced the refine frame twice,
    # so its whole subtree (two point-list vec-store scans + two broadcast
    # joins + the rerank window) sat in the plan once PER ARM.  The refine
    # output is serving-bounded (HYBRID_QUERIES x HYBRID_TOPK rows), so an
    # eager localCheckpoint materializes it in one pass and both arms
    # replay 50 in-memory rows (plans/r19/q_rerank_top1_fix_{before,
    # after}.txt — the refine subtree appears once, arms scan ExistingRDD).
    rr = q_hybrid_rerank(spark, sf_dir).localCheckpoint(eager=True)
    f1 = rr.filter(F.col("rrf_rank") == 1).select(
        "query_id", F.col("doc_id").alias("fused_top1")
    )
    r1 = rr.filter(F.col("rerank") == 1).select(
        "query_id", F.col("doc_id").alias("rerank_top1")
    )
    e = load(spark, sf_dir, "embeddings")
    x1 = cosine_topk(e, e.filter(F.col("vec_id") < HYBRID_QUERIES), 1).select(
        "query_id", F.col("neighbor_id").alias("exact_top1")
    )
    return (
        f1.join(r1, "query_id")
        .join(x1, "query_id")
        .select(
            "query_id",
            "fused_top1",
            "rerank_top1",
            "exact_top1",
            F.when(F.col("fused_top1") == F.col("exact_top1"), 1)
            .otherwise(0)
            .cast("long")
            .alias("fused_correct"),
            F.when(F.col("rerank_top1") == F.col("exact_top1"), 1)
            .otherwise(0)
            .cast("long")
            .alias("rerank_correct"),
        )
    )
