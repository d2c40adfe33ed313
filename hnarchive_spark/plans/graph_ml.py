"""Graph + embedding-ML wave: PageRank, scalable global indexing, kNN
classification, hard-negative mining, and an embedding-health datacard.

Determinism rules of the house apply: similarity scores leave both engines
as ``CAST(round(cos * 1e6) AS BIGINT)`` and every ranking ORDER BY uses that
integer (never the raw double), so neighbor ranks cannot flip on a 1-ulp
cosine difference between engines; PageRank runs entirely in scaled-integer
arithmetic (rank_e6), so a fixed iteration count yields bit-identical ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hnarchive_spark.functions import text as T
from hnarchive_spark.operators import similarity as S
from hnarchive_spark.plans.registry import query
from hnarchive_spark.tables import load

PR_ITERS = 3  # fixed iteration count => deterministic scaled-integer ranks
PR_SCALE = 1_000_000  # rank unit: 1.0 == 1_000_000

_EDGES_SQL = """
    seq AS (
      SELECT event_type, user_id,
             lead(user_id) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    edges AS (
      SELECT DISTINCT user_id AS src, nxt AS dst
      FROM seq WHERE nxt IS NOT NULL AND nxt != user_id
    ),
    nodes AS (SELECT DISTINCT user_id FROM events),
    deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)
"""


def _pr_iter_sql(i: int) -> str:
    prev = f"r{i - 1}"
    return f"""
    c{i} AS (
      SELECT e.dst, CAST(sum({prev}.r // deg.d) AS BIGINT) AS m
      FROM edges e JOIN deg ON deg.src = e.src
      JOIN {prev} ON {prev}.user_id = e.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT n.user_id,
             CAST(150000 + (17 * coalesce(c{i}.m, 0)) // 20 AS BIGINT) AS r
      FROM nodes n LEFT JOIN c{i} ON c{i}.dst = n.user_id
    )
"""


def _consecutive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, nxt) for every consecutive event pair within an event_type
    stream — SCALABLY.

    The naive ``lead() OVER (PARTITION BY event_type ORDER BY ts)`` puts the
    ENTIRE corpus sort on n_event_types partitions (5 here) — the one-hot-
    partition anti-pattern that cannot scale past one executor per type.
    Instead the window partitions by (event_type, day) — parallelism =
    types x days — and the day-boundary pairs are stitched back from a
    METADATA-SIZED per-(type, day) table of first/last users: day d's last
    event links to the first event of the next day that has data (a lead()
    over the tiny table).  The union is EXACTLY the global consecutive-pair
    multiset; the q_pagerank / q_triangle_count oracles keep the global-
    window formulation and hash-match it."""
    e = load(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "user_id", F.date_trunc("day", "ts").alias("day")
    )
    wb = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    ranked = e.select(
        "event_type",
        "day",
        "user_id",
        F.lead("user_id").over(wb).alias("nxt"),
        F.row_number().over(wb).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type", "day")).alias("nn"),
    )
    within = ranked.filter(F.col("nxt").isNotNull()).select("user_id", "nxt")
    # per-(type, day) endpoints: tiny (types x days rows)
    ends = (
        ranked.filter((F.col("rn") == 1) | (F.col("rn") == F.col("nn")))
        .groupBy("event_type", "day")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("user_id"))).alias("first_u"),
            F.max(F.when(F.col("rn") == F.col("nn"), F.col("user_id"))).alias("last_u"),
        )
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    boundary = (
        ends.select("event_type", "last_u", F.lead("first_u").over(wd).alias("nxt"))
        .filter(F.col("nxt").isNotNull())
        .select(F.col("last_u").alias("user_id"), "nxt")
    )
    return within.unionAll(boundary)


@query(
    "q_pagerank",
    oracle=f"""
    WITH {_EDGES_SQL},
    r0 AS (SELECT user_id, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes),
    {",".join(_pr_iter_sql(i).strip() for i in range(1, PR_ITERS + 1))}
    SELECT user_id, r AS rank_e6 FROM r{PR_ITERS}
    """,
    doc=f"PageRank ({PR_ITERS} iterations, damping 0.85) over the user "
    "interaction graph — an edge links each user to the next user acting "
    "in the same event_type stream. Edges derive via the DAY-BUCKETED "
    "window + boundary stitch (_consecutive_pairs): parallelism is "
    "types x days, not n_types hot partitions; the oracle keeps the "
    "equivalent global-window formulation. All "
    "arithmetic is scaled-integer: ranks start at 1e6, each hop "
    "contributes rank div out_degree, and the damped update is "
    "150000 + (17*in_sum) div 20 — floor division matches between "
    "engines, so a FIXED iteration count gives bit-identical ranks "
    "(float PageRank would drift with summation order). Dangling-node "
    "mass is dropped, the standard simplification for a deterministic "
    "audit rank. Spark side: edges/deg build once (the reused-exchange "
    "subtree), each iteration is one join-aggregate shuffled on user id "
    "— the classic Pregel-as-DataFrame loop; at 100 TB the rank table is "
    "one row per user (tiny next to events) and every join is key-"
    "partitioned, nothing ever collects to the driver.",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    seq = _consecutive_pairs(spark, sf_dir)
    edges = (
        seq.filter(F.col("nxt") != F.col("user_id"))
        .select(F.col("user_id").alias("src"), F.col("nxt").alias("dst"))
        .distinct()
    )
    # materialize the iteration-invariant frames ONCE (the _und_edges
    # working-set discipline): un-materialized, every one of the PR_ITERS
    # contrib joins replays the full events-window + distinct edge
    # derivation per reference — the before-plan carried 86 Exchanges for
    # a 3-iteration loop (guide §2.4: remove repeated subtree passes).
    # Edge/degree/node tables are |E|-/|V|-sized, tiny next to events.
    edges = edges.localCheckpoint(eager=True)
    nodes = e.select("user_id").distinct().localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")).localCheckpoint(eager=True)
    ranks = nodes.select("user_id", F.lit(PR_SCALE).cast("long").alias("r"))
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(deg, "src")
            .join(ranks.withColumnRenamed("user_id", "src"), "src")
            .select("dst", F.expr("r div d").alias("c"))
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("m"))
        ranks = (
            nodes.join(sums, nodes["user_id"] == sums["dst"], "left")
            .select(
                "user_id",
                (F.lit(150000) + F.expr("(17 * coalesce(m, 0)) div 20"))
                .cast("long")
                .alias("r"),
            )
        )
    return ranks.select("user_id", F.col("r").alias("rank_e6"))


IDX_BUCKET = 64  # doc_id div IDX_BUCKET => order-preserving metadata buckets


@query(
    "q_global_index",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), w -> w != ''))
                  AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS global_idx,
           CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS token_offset,
           n_tokens
    FROM t
    """,
    doc="Contiguous global row index + corpus token offset per document — "
    "what a pretraining loader needs to map sample i to a document and a "
    "token position. The oracle is the trivial single-partition window; "
    "the Spark plan is the SCALABLE two-phase form: docs bucket by "
    f"doc_id div {IDX_BUCKET} (order-preserving), phase 1 computes "
    "per-bucket row/token counts plus intra-bucket running sums (window "
    "partitioned BY BUCKET — parallel), phase 2 turns the tiny per-bucket "
    "totals into exclusive prefix offsets and broadcasts them back. "
    f"global_idx = bucket_row_offset + local_rn - 1; token_offset "
    f"likewise. Bucket-table sizing: at {IDX_BUCKET} docs/bucket the "
    "offset table is n_docs/64 rows — fine at test scale and up to ~1e8 "
    "docs; at 1e10 docs grow the bucket width (1e4-1e5 docs/bucket keeps "
    "the table ~1e5-1e6 rows) so the single-partition offset window stays "
    "metadata-sized and the broadcast stays a few MB — past broadcast "
    "comfort, replace F.broadcast with a plain shuffle join on bucket. "
    "No global sort, no single-partition pass over data rows — the "
    "anti-pattern row_number() OVER (ORDER BY doc_id) on the full corpus "
    "is exactly what this avoids.",
)
def q_global_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(T.tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    b = d.withColumn("bucket", F.expr(f"doc_id div {IDX_BUCKET}"))
    wb = Window.partitionBy("bucket").orderBy("doc_id")
    local = b.select(
        "doc_id",
        "bucket",
        "n_tokens",
        F.row_number().over(wb).alias("rn"),
        F.coalesce(
            F.sum("n_tokens").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("tok_before"),
    )
    totals = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("n_tokens").alias("toks")
    )
    wo = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("cnt").over(wo), F.lit(0)).alias("row_off"),
        F.coalesce(F.sum("toks").over(wo), F.lit(0)).alias("tok_off"),
    )
    return local.join(F.broadcast(offsets), "bucket").select(
        "doc_id",
        (F.col("row_off") + F.col("rn") - 1).cast("long").alias("global_idx"),
        (F.col("tok_off") + F.col("tok_before")).cast("long").alias("token_offset"),
        "n_tokens",
    )


KNN_K = 5
_E2 = "e2 AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings)"


@query(
    "q_knn_classify",
    oracle=f"""
    WITH {_E2},
    q AS (SELECT vec_id, v, label FROM e2 WHERE vec_id % 10 = 0),
    t AS (SELECT vec_id, v, label FROM e2 WHERE vec_id % 10 != 0),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS true_label,
             t.vec_id AS neighbor_id, t.label AS nl,
             CAST(round(list_cosine_similarity(q.v, t.v) * 1000000) AS BIGINT)
               AS cos_e6
      FROM q CROSS JOIN t
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_e6 DESC, neighbor_id) AS rk
      FROM scored
    ),
    votes AS (
      SELECT query_id, true_label, nl AS label, count(*) AS n_votes
      FROM ranked WHERE rk <= {KNN_K} GROUP BY query_id, true_label, nl
    ),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY n_votes DESC, label) AS vr
      FROM votes
    )
    SELECT query_id AS vec_id, true_label, label AS predicted_label, n_votes,
           CASE WHEN label = true_label THEN 1 ELSE 0 END AS correct
    FROM best WHERE vr = 1
    """,
    doc=f"{KNN_K}-NN majority-vote classification: hold out vec_id %% 10 = 0 "
    "as the labeled eval set, classify each by its nearest train "
    "neighbors' majority label (ties: more votes wins, then smaller "
    "label). Distances rank by integer cos_e6 with a neighbor_id "
    "tiebreak — fully deterministic. The eval set broadcasts against one "
    "train-corpus pass (eval sets are small by construction; a 10%%-of-"
    "corpus holdout at 100 TB would instead chunk the query side through "
    "the same plan). Norms are computed once per vector BEFORE the join, "
    "not per pair.",
)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", S.as_double(F.col("embedding")).alias("v"), "label"
    )
    q = (
        e.filter(F.col("vec_id") % 10 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("label").alias("true_label"),
        )
        .withColumn("qn", S.norm(F.col("qv")))
    )
    t = (
        e.filter(F.col("vec_id") % 10 != 0)
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("v").alias("cv"),
            F.col("label").alias("nl"),
        )
        .withColumn("cn", S.norm(F.col("cv")))
    )
    scored = t.crossJoin(F.broadcast(q)).select(
        "query_id",
        "true_label",
        "neighbor_id",
        "nl",
        F.round(S.dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")) * 1e6, 0)
        .cast("long")
        .alias("cos_e6"),
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("cos_e6").desc(), "neighbor_id")
    votes = (
        scored.select("*", F.row_number().over(wr).alias("rk"))
        .filter(F.col("rk") <= KNN_K)
        .groupBy("query_id", "true_label", F.col("nl").alias("label"))
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    wv = Window.partitionBy("query_id").orderBy(F.col("n_votes").desc(), "label")
    return (
        votes.select("*", F.row_number().over(wv).alias("vr"))
        .filter(F.col("vr") == 1)
        .select(
            F.col("query_id").alias("vec_id"),
            "true_label",
            F.col("label").alias("predicted_label"),
            "n_votes",
            F.when(F.col("label") == F.col("true_label"), 1).otherwise(0).alias("correct"),
        )
    )


HN_QUERIES = 25  # query vectors for hard-negative mining
HN_K = 3


@query(
    "q_hard_negatives",
    oracle=f"""
    WITH {_E2},
    q AS (SELECT vec_id AS query_id, v AS qv, label AS ql FROM e2
          WHERE vec_id < {HN_QUERIES}),
    scored AS (
      SELECT q.query_id, a.vec_id AS neighbor_id, a.label AS neg_label,
             CAST(round(list_cosine_similarity(q.qv, a.v) * 1000000) AS BIGINT)
               AS cos_e6
      FROM e2 a CROSS JOIN q
      WHERE a.label != q.ql
    )
    SELECT query_id, neighbor_id, neg_label, cos_e6, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_e6 DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {HN_K}
    """,
    doc=f"Hard-negative mining for contrastive training: for each of "
    f"{HN_QUERIES} anchor vectors, the {HN_K} most-similar vectors with a "
    "DIFFERENT label — the highest-value negatives for a triplet/infoNCE "
    "batch. Same broadcast-anchor one-corpus-pass shape as q_ann_topk "
    "with the label-mismatch predicate applied before ranking; ranks by "
    "integer cos_e6 with neighbor_id tiebreak. At scale the anchor set "
    "is a training batch (small) and the corpus pass shards freely; an "
    "LSH/IVF-blocked variant drops in exactly like q_ann_lsh vs "
    "q_ann_topk.",
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", S.as_double(F.col("embedding")).alias("v"), "label"
    )
    q = (
        e.filter(F.col("vec_id") < HN_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("label").alias("ql"),
        )
        .withColumn("qn", S.norm(F.col("qv")))
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("label").alias("neg_label"),
    ).withColumn("cn", S.norm(F.col("cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neg_label") != F.col("ql"))
        .select(
            "query_id",
            "neighbor_id",
            "neg_label",
            F.round(
                S.dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")) * 1e6, 0
            )
            .cast("long")
            .alias("cos_e6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_e6").desc(), "neighbor_id")
    return scored.select("*", F.row_number().over(w).alias("rank")).filter(
        F.col("rank") <= HN_K
    )


@query(
    "q_embed_dim_audit",
    oracle="""
    WITH vals AS (
      SELECT unnest(range(0, len(embedding))) AS dim,
             CAST(round(unnest(embedding::DOUBLE[]) * 1000000) AS BIGINT) AS xe6
      FROM embeddings
    )
    SELECT dim, count(*) AS n,
           min(xe6) AS min_e6, max(xe6) AS max_e6,
           CAST(sum(xe6) AS BIGINT) AS sum_e6,
           CAST(sum(CASE WHEN abs(xe6) < 100 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_near_zero
    FROM vals GROUP BY dim
    """,
    doc="Embedding-health datacard: per-dimension count/min/max/sum plus a "
    "near-zero tally (|x| < 1e-4) — the audit that catches dead or "
    "saturated dimensions before a training run. Values leave the scan "
    "as scaled BIGINTs (round(x*1e6)), so min/max/sum are exact and "
    "hash-stable. posexplode fans each vector into 64 (dim, value) rows, "
    "but partial aggregation collapses them per partition before the "
    "exchange — shuffle volume is n_partitions x n_dims tiny rows, never "
    "n_vectors x n_dims. 64 distinct keys on 32+ reducers is acceptable "
    "skew for a pure-agg stage; salting (operators/skew.py) drops in if "
    "a cluster shows stragglers.",
)
def q_embed_dim_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    vals = e.select(
        F.posexplode(S.as_double(F.col("embedding"))).alias("dim", "x")
    ).select(
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("x") * 1e6, 0).cast("long").alias("xe6"),
    )
    return vals.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("xe6").alias("min_e6"),
        F.max("xe6").alias("max_e6"),
        F.sum("xe6").alias("sum_e6"),
        F.sum(F.when(F.abs(F.col("xe6")) < 100, 1).otherwise(0)).alias("n_near_zero"),
    )


def _und_edges(spark: SparkSession, sf_dir: str, materialize: bool = True) -> DataFrame:
    """Undirected (a < b) edge set of the interaction graph, from the
    day-bucketed scalable pair derivation (see _consecutive_pairs).

    ``materialize`` localCheckpoints the deduped edge set: the wedge/
    triangle consumers reference it 3-4x in one plan and Spark re-derives
    an un-materialized subtree per reference (exchange reuse does not
    cross join sides) — for a graph query the edge list IS the working
    set, so cut lineage once and join against the materialized rows."""
    seq = _consecutive_pairs(spark, sf_dir)
    und = (
        seq.filter(F.col("nxt") != F.col("user_id"))
        .select(
            F.least("user_id", "nxt").alias("a"),
            F.greatest("user_id", "nxt").alias("b"),
        )
        .distinct()
    )
    return und.localCheckpoint(eager=True) if materialize else und


_UND_SQL = """
    seq AS (
      SELECT event_type, user_id,
             lead(user_id) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    und AS (
      SELECT DISTINCT least(user_id, nxt) AS a, greatest(user_id, nxt) AS b
      FROM seq WHERE nxt IS NOT NULL AND nxt != user_id
    )
"""


@query(
    "q_triangle_count",
    oracle=f"""
    WITH {_UND_SQL},
    tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    member AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT node, count(*) AS n_triangles
    FROM member GROUP BY node
    """,
    doc="Per-node triangle counts over the undirected interaction graph — "
    "the clustering-coefficient numerator and the classic abuse/cohesion "
    "signal — via DEGREE-ORDERED orientation (the Latapy/cohen "
    "forward-algorithm shape): every edge points from its lower-(degree, "
    "id) endpoint to the higher, wedges enumerate only at their lowest-"
    "degree vertex over ordered out-neighbor pairs, and the closing edge "
    "lookup is orientation-consistent, so each triangle is found EXACTLY "
    "once — no 6x duplication, no post-dedup — and per-pivot join fanout "
    "is bounded by the oriented out-degree <= sqrt(2E) even when a "
    "celebrity vertex has 1e8 neighbors (a plain a<b canonicalization "
    "leaves low-id hubs with full fanout). The degree table (one row per "
    "vertex, so |V|-sized — 25M+ rows at 100x) joins in WITHOUT a "
    "broadcast hint; AQE picks broadcast when it fits and shuffle when "
    "it doesn't. The oracle keeps the orientation-"
    "free formulation: the triangle multiset is orientation-invariant, "
    "so the scalable plan is hash-checked against the direct one. Each "
    "node in a triangle is credited via a 3-way unpivot + count.",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _und_edges(spark, sf_dir)
    adj = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # orient: src = lower (degree, id) endpoint, dst = higher
    da, db = F.col("da"), F.col("db")
    a_first = (da < db) | ((da == db) & (F.col("a") < F.col("b")))
    # deg is one row per vertex — small at test SF but 25M+ rows at 100x
    # scale, so no forced broadcast: plain joins, AQE size-gates the
    # strategy at runtime (broadcast when it fits, shuffle when it doesn't).
    oriented = (
        und.join(deg.select(F.col("u").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("u").alias("b"), F.col("d").alias("db")), "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
            F.when(a_first, db).otherwise(da).alias("dst_deg"),
        )
    )
    e1 = oriented.select("src", F.col("dst").alias("v"), F.col("dst_deg").alias("dv"))
    e2 = oriented.select("src", F.col("dst").alias("w"), F.col("dst_deg").alias("dw"))
    wedge = e1.join(e2, "src").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    close = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedge.join(close, ["v", "w"])
    member = (
        tri.select(F.col("src").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
    )
    return member.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


LP_TOPK = 20


@query(
    "q_link_prediction",
    oracle=f"""
    WITH {_UND_SQL},
    adj AS (
      SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und
    ),
    deg AS (SELECT u, count(*) AS d FROM adj GROUP BY u),
    cand AS (
      SELECT x.u AS u, y.v AS v, count(*) AS cn
      FROM adj x JOIN adj y ON y.u = x.v AND x.u < y.v
      GROUP BY x.u, y.v
    ),
    new_pairs AS (
      SELECT c.u, c.v, c.cn FROM cand c
      WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.a = c.u AND e.b = c.v)
    ),
    scored AS (
      SELECT p.u, p.v, p.cn, du.d AS deg_u, dv.d AS deg_v,
             (2000000 * p.cn + (du.d + dv.d - p.cn))
               // (2 * (du.d + dv.d - p.cn)) AS jaccard_e6
      FROM new_pairs p
      JOIN deg du ON du.u = p.u JOIN deg dv ON dv.u = p.v
    )
    SELECT u, v, cn, deg_u, deg_v, jaccard_e6
    FROM scored
    ORDER BY cn DESC, jaccard_e6 DESC, u, v
    LIMIT {LP_TOPK}
    """,
    doc=f"Link prediction, top-{LP_TOPK} candidate pairs by common-neighbor "
    "count with neighborhood-Jaccard (round-half-up e6 integer) as the "
    "tiebreak — non-adjacent pairs most likely to interact next. The "
    "wedge join (adj x adj pivoting on the shared neighbor) generates "
    "candidates with their counts in ONE shuffle; existing edges drop "
    "via anti-join; degrees join in one-row-per-user tables. Top-k is "
    "orderBy+limit (TakeOrderedAndProject). The wedge fanout is the "
    "same hot-vertex quadratic every triangle/wedge algorithm has — at "
    "scale the mitigation is capping or orienting by degree exactly as "
    "in q_triangle_count / q_embed_dup_capped.",
)
def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _und_edges(spark, sf_dir)
    adj = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    x = adj.select(F.col("u").alias("u"), F.col("v").alias("w"))
    y = adj.select(F.col("u").alias("w"), F.col("v").alias("v"))
    cand = (
        x.join(y, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    new_pairs = cand.join(
        und, (cand["u"] == und["a"]) & (cand["v"] == und["b"]), "left_anti"
    )
    scored = (
        new_pairs.join(deg.withColumnRenamed("u", "ju"), F.col("u") == F.col("ju"))
        .withColumnRenamed("d", "deg_u")
        .drop("ju")
        .join(deg.withColumnRenamed("u", "jv"), F.col("v") == F.col("jv"))
        .withColumnRenamed("d", "deg_v")
        .drop("jv")
        .select(
            "u",
            "v",
            "cn",
            "deg_u",
            "deg_v",
            F.expr(
                "(2000000 * cn + (deg_u + deg_v - cn)) div (2 * (deg_u + deg_v - cn))"
            ).alias("jaccard_e6"),
        )
    )
    return scored.orderBy(
        F.col("cn").desc(), F.col("jaccard_e6").desc(), "u", "v"
    ).limit(LP_TOPK)


LP_PIVOT_CAP_X = 4  # wedge pivots (shared neighbors) with degree above
# LP_PIVOT_CAP_X * mean_degree are skipped: a mega-hub pivot contributes
# deg^2 candidate rows while carrying almost no linkage signal (everyone
# co-occurs with the celebrity). Data-dependent (vs a fixed cap) so the
# same query is lossless on dense-but-uniform graphs and bounded on
# celebrity graphs.


@query(
    "q_link_prediction_capped",
    oracle=f"""
    WITH {_UND_SQL},
    adj AS (
      SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und
    ),
    deg AS (SELECT u, count(*) AS d FROM adj GROUP BY u),
    cap AS (SELECT ({LP_PIVOT_CAP_X} * sum(d)) // count(*) AS maxd FROM deg),
    cand AS (
      SELECT x.u AS u, y.v AS v, count(*) AS cn
      FROM adj x
      JOIN deg dw ON dw.u = x.v AND dw.d <= (SELECT maxd FROM cap)
      JOIN adj y ON y.u = x.v AND x.u < y.v
      GROUP BY x.u, y.v
    ),
    new_pairs AS (
      SELECT c.u, c.v, c.cn FROM cand c
      WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.a = c.u AND e.b = c.v)
    ),
    scored AS (
      SELECT p.u, p.v, p.cn, du.d AS deg_u, dv.d AS deg_v,
             (2000000 * p.cn + (du.d + dv.d - p.cn))
               // (2 * (du.d + dv.d - p.cn)) AS jaccard_e6
      FROM new_pairs p
      JOIN deg du ON du.u = p.u JOIN deg dv ON dv.u = p.v
    )
    SELECT u, v, cn, deg_u, deg_v, jaccard_e6
    FROM scored
    ORDER BY cn DESC, jaccard_e6 DESC, u, v
    LIMIT {LP_TOPK}
    """,
    doc=f"Link prediction with a data-dependent pivot-degree cap — the "
    "registered 100 TB scale path for q_link_prediction: wedges are "
    f"generated only through shared neighbors of degree <= "
    f"{LP_PIVOT_CAP_X}x the mean degree, bounding the per-pivot "
    "candidate fanout at cap^2 instead of the celebrity vertex's deg^2 "
    "(SCALE.md: 1668x fewer wedge rows on the 10k-node hub graph, "
    "lossless on the uniform organic graph where no node exceeds the "
    "cap). The excluded evidence is the weakest kind — co-occurrence "
    "through a mega-hub — the same reasoning as max_df n-gram blocking "
    "and the embed-dup hot-bucket cap; degrees in the Jaccard tiebreak "
    "stay UNCAPPED so scores for surviving pairs are unchanged. The "
    "cap is one broadcast scalar row; the oracle replays it, so parity "
    "holds on any input.",
)
def q_link_prediction_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _und_edges(spark, sf_dir)
    adj = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    cap = deg.agg(F.expr(f"({LP_PIVOT_CAP_X} * sum(d)) div count(*)").alias("maxd"))
    # keep only edges whose neighbor endpoint (the wedge pivot) is sub-cap
    adjc = (
        adj.join(
            deg.select(F.col("u").alias("v"), F.col("d").alias("dv")), "v"
        )
        .crossJoin(F.broadcast(cap))
        .filter(F.col("dv") <= F.col("maxd"))
        .select("u", "v")
    )
    x = adjc.select(F.col("u").alias("u"), F.col("v").alias("w"))
    y = adjc.select(F.col("v").alias("w"), F.col("u").alias("v"))
    cand = (
        x.join(y, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    new_pairs = cand.join(
        und, (cand["u"] == und["a"]) & (cand["v"] == und["b"]), "left_anti"
    )
    scored = (
        new_pairs.join(deg.withColumnRenamed("u", "ju"), F.col("u") == F.col("ju"))
        .withColumnRenamed("d", "deg_u")
        .drop("ju")
        .join(deg.withColumnRenamed("u", "jv"), F.col("v") == F.col("jv"))
        .withColumnRenamed("d", "deg_v")
        .drop("jv")
        .select(
            "u",
            "v",
            "cn",
            "deg_u",
            "deg_v",
            F.expr(
                "(2000000 * cn + (deg_u + deg_v - cn)) div (2 * (deg_u + deg_v - cn))"
            ).alias("jaccard_e6"),
        )
    )
    return scored.orderBy(
        F.col("cn").desc(), F.col("jaccard_e6").desc(), "u", "v"
    ).limit(LP_TOPK)


KCORE_ROUNDS = 3


def _kcore_round_sql(i: int) -> str:
    prev = f"s{i - 1}"
    return f"""
    d{i} AS (
      SELECT n.node, count(e.a) AS deg
      FROM {prev} n LEFT JOIN (
        SELECT u1.node AS a, u2.node AS b
        FROM und JOIN {prev} u1 ON u1.node = und.a
        JOIN {prev} u2 ON u2.node = und.b
      ) e ON e.a = n.node OR e.b = n.node
      GROUP BY n.node
    ),
    s{i} AS (SELECT d{i}.node FROM d{i}, kk WHERE d{i}.deg >= kk.k)
"""


@query(
    "q_kcore_peel",
    oracle=f"""
    WITH {_UND_SQL},
    nodes AS (SELECT a AS node FROM und UNION SELECT b FROM und),
    kk AS (SELECT (2 * (SELECT count(*) FROM und) + (SELECT count(*) FROM nodes))
                  // (2 * (SELECT count(*) FROM nodes)) AS k),
    s0 AS (SELECT node FROM nodes),
    {",".join(_kcore_round_sql(i).strip() for i in range(1, KCORE_ROUNDS + 1))}
    SELECT n.node,
           CAST((SELECT count(*) FROM und, s{KCORE_ROUNDS} x, s{KCORE_ROUNDS} y
                 WHERE x.node = und.a AND y.node = und.b
                   AND (und.a = n.node OR und.b = n.node)) AS BIGINT) AS core_deg
    FROM s{KCORE_ROUNDS} n
    """,
    doc=f"Iterated k-core peeling ({KCORE_ROUNDS} rounds, k = round-half-up "
    "HALF the average degree — data-derived, so the threshold tracks the "
    "graph; the synthetic interaction graph is near-regular, so peeling "
    "rarely drops nodes here and the hash check rides on the within-core "
    "degrees — on a skewed real graph the same plan prunes hard): "
    "each round drops nodes whose degree among SURVIVORS falls below k, "
    "converging toward the k-core (full convergence is a fixpoint; the "
    "fixed round count keeps both engines bit-identical, exactly the "
    "q_pagerank determinism contract). Output: surviving nodes with "
    "their within-core degree. Spark side: each round is one "
    "semi-join-degree-filter over the materialized edge set, state is "
    "one row per surviving node; the oracle unrolls the rounds as "
    "chained CTEs. The dense-core extraction behind spam-ring and "
    "community-seed mining.",
)
def q_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _und_edges(spark, sf_dir)
    nodes = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .distinct()
    )
    n_edges = und.count()
    n_nodes = nodes.count()
    k = (2 * n_edges + n_nodes) // (2 * n_nodes)
    surv = nodes
    for _ in range(KCORE_ROUNDS):
        alive_edges = (
            und.join(surv.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(surv.withColumnRenamed("node", "b"), "b", "left_semi")
        )
        deg = (
            alive_edges.select(F.col("a").alias("node"))
            .unionAll(alive_edges.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        surv = (
            surv.join(deg, "node", "left")
            .filter(F.coalesce(F.col("deg"), F.lit(0)) >= k)
            .select("node")
            # one row per surviving node (metadata-sized, the q_pagerank /
            # q_power_iteration contract): cut the lineage each round —
            # un-checkpointed, round i's plan re-evaluates round i-1's
            # joins once per reference (surv appears 3x per round), which
            # measured 14.7 s at sf0.01 for this tiny graph
            .localCheckpoint(eager=True)
        )
    final_edges = (
        und.join(surv.withColumnRenamed("node", "a"), "a", "left_semi")
        .join(surv.withColumnRenamed("node", "b"), "b", "left_semi")
    )
    core_deg = (
        final_edges.select(F.col("a").alias("node"))
        .unionAll(final_edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_deg"))
    )
    return surv.join(core_deg, "node", "left").select(
        "node", F.coalesce(F.col("core_deg"), F.lit(0)).cast("long").alias("core_deg")
    )


PCA_ITERS = 5
PCA_VSCALE = 1000  # eigenvector components scaled to +-1000


def _pca_iter_sql(i: int) -> str:
    prev = f"v{i - 1}"
    return f"""
    u{i} AS (
      SELECT g.i, CAST(sum(g.gv * {prev}.v) AS BIGINT) AS u
      FROM gm g JOIN {prev} ON {prev}.i = g.j GROUP BY g.i
    ),
    m{i} AS (SELECT max(abs(u)) AS m FROM u{i}),
    v{i} AS (
      SELECT u{i}.i,
             CAST(CASE WHEN u >= 0
                       THEN (2 * {PCA_VSCALE} * u + m) // (2 * m)
                       ELSE -((2 * {PCA_VSCALE} * (-u) + m) // (2 * m))
                  END AS BIGINT) AS v
      FROM u{i}, m{i}
    )
"""


@query(
    "q_power_iteration",
    oracle=f"""
    WITH vals AS (
      SELECT vec_id, unnest(range(0, len(embedding))) AS i,
             CAST(round(unnest(embedding::DOUBLE[]) * 1000) AS BIGINT) AS x
      FROM embeddings
    ),
    gm AS (
      SELECT a.i, b.i AS j, CAST(sum(a.x * b.x) AS BIGINT) AS gv
      FROM vals a JOIN vals b USING (vec_id)
      GROUP BY a.i, b.i
    ),
    v0 AS (SELECT i, CAST({PCA_VSCALE} AS BIGINT) AS v
           FROM (SELECT DISTINCT i FROM vals)),
    {",".join(_pca_iter_sql(i).strip() for i in range(1, PCA_ITERS + 1))}
    SELECT i AS dim, v AS comp_e3 FROM v{PCA_ITERS}
    """,
    doc=f"Gram-matrix power iteration ({PCA_ITERS} fixed steps from the "
    "all-ones vector), bit-exact across engines: elements quantize to e3 "
    "integers, the 64x64 Gram matrix is ONE distributed pass (dim-pair "
    "products collapse through partial agg — at scale the Gram "
    "computation is the only data-sized job), and the iteration runs "
    "over the metadata-sized matrix with integer renormalization to "
    "+-1000 each step. This emits the 5-step POWER ITERATE — the PCA "
    "building block and a deterministic drift-direction signature — not "
    "a converged eigenvector: the synthetic corpus is near-isotropic "
    "(top eigengap ratio ~0.95), where convergence needs O(1/gap) "
    "steps on ANY engine; test_graph_props locks the integer iterate "
    "against numpy running the same five float steps. Division is "
    "sign-decomposed (abs, divide, re-sign) because Spark's div "
    "TRUNCATES while DuckDB's // FLOORS — they agree only on "
    "non-negative operands.",
)
def q_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    vals = e.select(
        "vec_id", F.posexplode(S.as_double(F.col("embedding"))).alias("i", "x")
    ).select(
        "vec_id",
        F.col("i").cast("long").alias("i"),
        F.round(F.col("x") * 1000, 0).cast("long").alias("x"),
    )
    a = vals.select("vec_id", F.col("i").alias("ai"), F.col("x").alias("ax"))
    b = vals.select("vec_id", F.col("i").alias("j"), F.col("x").alias("bx"))
    gm = (
        a.join(b, "vec_id")
        .groupBy(F.col("ai").alias("i"), "j")
        .agg(F.sum(F.col("ax") * F.col("bx")).alias("gv"))
        .localCheckpoint(eager=True)  # 64x64 rows, referenced every iteration
    )
    v = gm.select("i").distinct().select(
        "i", F.lit(PCA_VSCALE).cast("long").alias("v")
    )
    for _ in range(PCA_ITERS):
        u = (
            gm.join(F.broadcast(v.withColumnRenamed("i", "j")), "j")
            .groupBy("i")
            .agg(F.sum(F.col("gv") * F.col("v")).alias("u"))
        )
        m = u.agg(F.max(F.abs(F.col("u"))).alias("m"))
        v = (
            u.crossJoin(F.broadcast(m))
            .select(
                "i",
                F.expr(
                    f"CAST(CASE WHEN u >= 0 THEN (2 * {PCA_VSCALE} * u + m) div (2 * m)"
                    f" ELSE -((2 * {PCA_VSCALE} * (-u) + m) div (2 * m)) END AS BIGINT)"
                ).alias("v"),
            )
            # dim rows — metadata-sized.  u is referenced TWICE per round
            # (renormalizer + next v), so an un-truncated lineage doubles
            # the evaluation tree every iteration (2^PCA_ITERS re-runs of
            # the Gram multiply); same contract as the k-core fix.
            .localCheckpoint(eager=True)
        )
    return v.select(F.col("i").alias("dim"), F.col("v").alias("comp_e3"))


_WEDGES_SQL = """
    seq AS (
      SELECT event_type, user_id,
             lead(user_id) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    wedges AS (
      SELECT user_id AS src, nxt AS dst, count(*) AS w
      FROM seq WHERE nxt IS NOT NULL AND nxt != user_id
      GROUP BY user_id, nxt
    ),
    nodes AS (SELECT DISTINCT user_id FROM events),
    wdeg AS (SELECT src, CAST(sum(w) AS BIGINT) AS d FROM wedges GROUP BY src)
"""


def _wpr_iter_sql(i: int) -> str:
    prev = f"r{i - 1}"
    return f"""
    c{i} AS (
      SELECT e.dst, CAST(sum(({prev}.r * e.w) // wdeg.d) AS BIGINT) AS m
      FROM wedges e JOIN wdeg ON wdeg.src = e.src
      JOIN {prev} ON {prev}.user_id = e.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT n.user_id,
             CAST(150000 + (17 * coalesce(c{i}.m, 0)) // 20 AS BIGINT) AS r
      FROM nodes n LEFT JOIN c{i} ON c{i}.dst = n.user_id
    )
"""


@query(
    "q_pagerank_weighted",
    oracle=f"""
    WITH {_WEDGES_SQL},
    r0 AS (SELECT user_id, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes),
    {",".join(_wpr_iter_sql(i).strip() for i in range(1, PR_ITERS + 1))}
    SELECT user_id, r AS rank_e6 FROM r{PR_ITERS}
    """,
    doc=f"WEIGHTED PageRank ({PR_ITERS} iterations): edges keep their "
    "interaction MULTIPLICITY as an integer weight (the pair multiset "
    "counts q_pagerank's distinct throws away — the production-common "
    "weighted-graph case), and each hop distributes rank proportionally: "
    "contribution = (r * w) div weighted_out_degree, per-edge floor "
    "division identical on both engines, so ranks stay bit-exact. "
    "Weights come from the same day-bucketed pair derivation "
    "(_consecutive_pairs) aggregated instead of deduped; the oracle "
    "keeps the global-window multiset, which is provably the same. "
    "Same one-row-per-user state and key-partitioned joins as the "
    "unweighted operator.",
)
def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    seq = _consecutive_pairs(spark, sf_dir)
    wedges = (
        seq.filter(F.col("nxt") != F.col("user_id"))
        .groupBy(F.col("user_id").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    nodes = e.select("user_id").distinct()
    wdeg = wedges.groupBy("src").agg(F.sum("w").alias("d"))
    ranks = nodes.select("user_id", F.lit(PR_SCALE).cast("long").alias("r"))
    for _ in range(PR_ITERS):
        contrib = (
            wedges.join(wdeg, "src")
            .join(ranks.withColumnRenamed("user_id", "src"), "src")
            .select("dst", F.expr("(r * w) div d").alias("c"))
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("m"))
        ranks = (
            nodes.join(sums, nodes["user_id"] == sums["dst"], "left")
            .select(
                "user_id",
                (F.lit(150000) + F.expr("(17 * coalesce(m, 0)) div 20"))
                .cast("long")
                .alias("r"),
            )
        )
    return ranks.select("user_id", F.col("r").alias("rank_e6"))


@query(
    "q_class_weights",
    oracle="""
    WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                 count(*) AS k FROM c)
    SELECT c.label, c.n,
           t.total AS weight_num,
           CAST(t.k * c.n AS BIGINT) AS weight_den
    FROM c, t
    """,
    doc="Inverse-frequency class weights as exact rationals: weight(c) = "
    "total / (k * n_c) emitted as (weight_num, weight_den) — the "
    "balanced-loss reweighting every classifier trained on skewed labels "
    "needs (sklearn's 'balanced' heuristic), with no division so no "
    "rounding policy is baked in. One partial-agg shuffle over labels; "
    "the totals row is a broadcast scalar.",
)
def q_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    c = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("k")
    )
    return c.crossJoin(F.broadcast(t)).select(
        "label",
        "n",
        F.col("total").cast("long").alias("weight_num"),
        (F.col("k") * F.col("n")).cast("long").alias("weight_den"),
    )


@query(
    "q_knn_confusion",
    oracle=f"""
    WITH {_E2},
    q AS (SELECT vec_id, v, label FROM e2 WHERE vec_id % 10 = 0),
    t AS (SELECT vec_id, v, label FROM e2 WHERE vec_id % 10 != 0),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS true_label,
             t.vec_id AS neighbor_id, t.label AS nl,
             CAST(round(list_cosine_similarity(q.v, t.v) * 1000000) AS BIGINT)
               AS cos_e6
      FROM q CROSS JOIN t
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_e6 DESC, neighbor_id) AS rk
      FROM scored
    ),
    votes AS (
      SELECT query_id, true_label, nl AS label, count(*) AS n_votes
      FROM ranked WHERE rk <= {KNN_K} GROUP BY query_id, true_label, nl
    ),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY n_votes DESC, label) AS vr
      FROM votes
    )
    SELECT true_label, label AS predicted_label, count(*) AS n
    FROM best WHERE vr = 1
    GROUP BY true_label, label
    """,
    doc=f"Confusion matrix of the {KNN_K}-NN classifier (true x predicted "
    "label counts over the held-out eval set) — the evaluation artifact "
    "behind precision/recall/error analysis; q_knn_classify's per-row "
    "verdicts collapse through one more partial aggregation (label "
    "cardinality bounds the output, so the matrix is metadata-sized at "
    "any corpus scale). Same deterministic ranking/voting as "
    "q_knn_classify; the oracle replays it and aggregates identically.",
)
def q_knn_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        q_knn_classify(spark, sf_dir)
        .groupBy("true_label", "predicted_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


LPA_ITERS = 3


def _lpa_iter_sql(i: int) -> str:
    prev = f"l{i - 1}"
    return f"""
    v{i} AS (
      SELECT a.u, {prev}.lab, count(*) AS c
      FROM adj a JOIN {prev} ON {prev}.u = a.v
      GROUP BY a.u, {prev}.lab
    ),
    l{i} AS (
      SELECT u, lab FROM (
        SELECT u, lab, row_number() OVER (PARTITION BY u
                                          ORDER BY c DESC, lab) AS rn
        FROM v{i}
      ) WHERE rn = 1
    )"""


@query(
    "q_lpa_communities",
    oracle=f"""
    WITH {_UND_SQL},
    adj AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
    l0 AS (SELECT DISTINCT u, u AS lab FROM adj),
    {",".join(_lpa_iter_sql(i).strip() for i in range(1, LPA_ITERS + 1))}
    SELECT l{LPA_ITERS}.u AS user_id, l{LPA_ITERS}.lab AS community,
           count(*) OVER (PARTITION BY l{LPA_ITERS}.lab) AS community_size
    FROM l{LPA_ITERS}
    """,
    doc=f"Label-propagation community detection ({LPA_ITERS} semi-"
    "synchronous iterations): every node starts as its own label and "
    "each round adopts its neighbors' MOST FREQUENT label (ties -> "
    "smallest label), the classic near-linear community algorithm — "
    "deterministic here because the update is simultaneous (no "
    "sequential node order) and the tiebreak is total, so a FIXED "
    "iteration count is bit-identical on both engines. Complements "
    "connected components (pure reachability) with density-based "
    "groupings. Each iteration is one join + partial-agg + per-node "
    "argmax as a pure max-of-(count,-label)-struct AGGREGATE (partial-"
    "combines map-side; no per-node window task even for celebrity "
    "nodes); labels are one row per node, tiny next to edges. "
    "community_size comes from a groupBy + shuffle join back on lab (one "
    "row per community, but the community count is bounded only by |V|, "
    "so no broadcast hint — AQE upgrades small cases at runtime) — NOT "
    "count() OVER (PARTITION BY label), which would "
    "funnel a giant community's nodes through one task (the oracle keeps "
    "the window form single-node DuckDB is fine with). At 100 TB: same "
    "Pregel-as-DataFrame loop as q_pagerank, edge table reused across "
    "iterations via the materialized lineage cut.",
)
def q_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _und_edges(spark, sf_dir)
    adj = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    labels = adj.select("u").distinct().select("u", F.col("u").alias("lab"))
    for _ in range(LPA_ITERS):
        votes = (
            adj.join(labels.select(F.col("u").alias("v"), "lab"), "v")
            .groupBy("u", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # per-node argmax as a PURE AGGREGATE (max of (count, -label) struct),
        # not a row_number window: the aggregate partial-combines map-side, so
        # a celebrity node whose neighbors carry millions of distinct labels
        # never funnels all its vote rows through one window task.  The
        # struct max is (most votes, then smallest label) — identical to the
        # oracle's row_number() tiebreak.
        labels = (
            votes.groupBy("u")
            .agg(F.max(F.struct(F.col("c"), (-F.col("lab")).alias("nl"))).alias("m"))
            .select("u", (-F.col("m.nl")).alias("lab"))
        )
    # sizes is one row per community — bounded only by |V| (every node can
    # be its own community early on / adversarially), so it must NOT be
    # force-broadcast: plain shuffle join on lab, AQE upgrades to broadcast
    # at runtime when the table actually is small.
    sizes = labels.groupBy("lab").agg(F.count(F.lit(1)).alias("community_size"))
    return labels.join(sizes, "lab").select(
        F.col("u").alias("user_id"),
        F.col("lab").alias("community"),
        F.col("community_size").cast("long").alias("community_size"),
    )
