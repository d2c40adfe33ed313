"""Similarity search over an embedding column (`array<float>`).

* brute-force cosine top-k — the exact baseline: broadcast the query set,
  one pass over the corpus, per-query heap via ranked window;
* random-hyperplane LSH buckets — the scale path: 8-bit sign signatures
  partition the corpus; top-k runs inside the query's bucket only.

All vector math is built-in (`aggregate`/`zip_with` over array<double>) —
JVM-side, no Python crossing.  Hyperplane components are derived
deterministically from md5 in plain Python (module import time) and embedded
as literals on BOTH the Spark and DuckDB sides, so the approximate operator
is still exactly oracle-checkable.

At 100 TB: the corpus side stays partitioned (never collected); the query
side is broadcast; bucket signatures would be precomputed and stored as a
partition column so a query touches 1/256th of the data.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

N_PLANES = 8
DIM = 64


def _plane_component(p: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane weight in [-1, 1)."""
    h = int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:8], 16)
    return ((h % 2001) - 1000) / 1000.0


PLANES: list[list[float]] = [
    [_plane_component(p, d) for d in range(DIM)] for p in range(N_PLANES)
]


def table_planes(t: int) -> list[list[float]]:
    """Hyperplane set for LSH table ``t`` — table 0 is the original PLANES
    (key "{p}_{d}"); further tables use independent md5 streams."""
    if t == 0:
        return PLANES

    def comp(p: int, d: int) -> float:
        h = int(hashlib.md5(f"t{t}_{p}_{d}".encode()).hexdigest()[:8], 16)
        return ((h % 2001) - 1000) / 1000.0

    return [[comp(p, d) for d in range(DIM)] for p in range(N_PLANES)]


def as_double(col) -> F.Column:
    return col.cast("array<double>")


def dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (self-matches excluded).

    Returns (query_id, neighbor_id, rank, cos_e6) with a total tiebreak
    order (cos_e6 desc, neighbor_id asc); cos_e6 = round(cosine * 1e6) as
    BIGINT — the repo's integer-output convention, engine-portable.
    """
    # no repartition: the broadcast cross join preserves the corpus scan's
    # partitioning (many splits at scale), and a shuffle of the corpus would
    # cost more than the per-row dot products.  Norms are computed ONCE per
    # vector before the join — inside it they'd be recomputed per PAIR,
    # tripling the per-pair flops.
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")) * 1_000_000, 0)
            .cast("long")
            .alias("cos_e6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_e6").desc(), F.col("neighbor_id"))
    return scored.select("*", F.row_number().over(w).alias("rank")).filter(
        F.col("rank") <= k
    )


def sq_dist(a, b) -> F.Column:
    """Squared Euclidean distance — sequential fold, same summation order
    as DuckDB's list_sum(list_transform(...)), so e6-rounded outputs are
    engine-portable."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact squared-L2 top-k neighbors per query (self-matches excluded) —
    the ground-truth arm for evaluating the DISTANCE-metric approximate
    paths (PQ-ADC, IVF-PQ), as cosine_topk is for the cosine paths.
    Returns (query_id, neighbor_id, d2_e6, rank) with the same total
    (d2 ASC, id ASC) ranking the ADC operators use."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(sq_dist(F.col("qv"), F.col("cv")) * 1_000_000, 0)
            .cast("long")
            .alias("d2_e6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("d2_e6", "neighbor_id")
    return scored.select("*", F.row_number().over(w).alias("rank")).filter(
        F.col("rank") <= k
    )


def int8_quantize(vec_col) -> F.Column:
    """Per-vector symmetric int8 quantization (q_embed_quantize's recipe):
    q_i = round(v_i * 127 / max|v|), emitted as a BIGINT array.  Half-away-
    from-zero rounding on both engines makes the codes engine-portable."""
    v = as_double(vec_col)
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    # maxabs == 0 (an all-zero embedding) would make the division NULL on
    # Spark but NaN on DuckDB — divergent codes and broken ranking on that
    # data edge.  A safe denominator pins the edge to all-zero codes on
    # both engines (every numerator is 0 there anyway); the SQL oracles
    # carry the matching CASE guard.
    safe = F.when(maxabs == F.lit(0.0), F.lit(1.0)).otherwise(maxabs)
    return F.transform(v, lambda x: F.round(x * 127 / safe, 0).cast("long"))


def int8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by INT8-quantized dot product — the serving-side search over
    the compressed vectors q_embed_quantize produces: the corpus moves as
    ~dim bytes/vector (4x smaller than fp32) and every score is an exact
    integer dot product (integer-SIMD hardware path on a real deployment;
    here, exact BIGINT sums that hash identically on both engines).

    Approximation contract: per-vector scales (127/max|v|) differ across
    candidates, so the integer dot ranks by dot(v_q, v_c)/(maxq*maxc) —
    the standard symmetric-quantization tradeoff; the quantization error
    is the operator's honesty gap vs q_ann_topk, measurable the same way
    the recall harnesses measure IVF/PQ. Determinism: integer scores,
    total (dot DESC, id ASC) order. At 100 TB this composes with IVF
    routing exactly as PQ codes do (quantize inside the list partitions).

    Returns (query_id, neighbor_id, dot_q, rank)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), int8_quantize(F.col(vec_col)).alias("cq")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), int8_quantize(F.col(vec_col)).alias("qq")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with(F.col("cq"), F.col("qq"), lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot_q").desc(), F.col("neighbor_id"))
    return scored.select("*", F.row_number().over(w).alias("rank")).filter(
        F.col("rank") <= k
    )


def lsh_signature(vec_col, planes: list[list[float]] | None = None) -> F.Column:
    """8-bit sign signature: bit p set iff dot(v, plane_p) > 0."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes if planes is not None else PLANES):
        arr = F.array(*[F.lit(x) for x in plane])
        sig = sig + F.when(dot(vec_col, arr) > 0, F.lit(1 << p)).otherwise(0)
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Regime note: sign-LSH bucket agreement falls as (1 - angle/pi)^bits, so
    recall vs the global exact top-k is high only when true neighbors are
    CLOSE (small angles — the near-duplicate regime).  On corpora whose
    nearest neighbors sit near 60 degrees (like the synthetic test
    embeddings) a single 8-bit bucket retains ~3% of true neighbors — use
    the banded OR-construction (lsh_dup_pairs) or IVF multi-probe there.
    The oracle checks the operator's own contract exactly: top-k WITHIN the
    probed bucket."""
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            as_double(F.col(vec_col)).alias("cv"),
        )
        .withColumn("bucket", lsh_signature(F.col("cv")))
        .withColumn("cn", norm(F.col("cv")))
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double(F.col(vec_col)).alias("qv"),
        )
        .withColumn("bucket", lsh_signature(F.col("qv")))
        .withColumn("qn", norm(F.col("qv")))
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")) * 1_000_000, 0)
            .cast("long")
            .alias("cos_e6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_e6").desc(), F.col("neighbor_id"))
    return scored.select("*", F.row_number().over(w).alias("rank")).filter(
        F.col("rank") <= k
    )


def lsh_topk_multi(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table LSH ANN — the standard recall booster: L independent
    hyperplane sets, candidate set = UNION of per-table bucket matches,
    then exact rerank.  Recall = 1-(1-p^bits)^L rises with L while cost
    stays ~L/256 of the corpus per query (vs 1/256 for one table).

    Plan shape: one pass computes all L signatures per vector (still just
    projections over the scan), candidates join per table on the bucket,
    union + distinct, exact cosine once per distinct candidate."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    for t in range(n_tables):
        planes = table_planes(t)
        c = c.withColumn(f"b{t}", lsh_signature(F.col("cv"), planes))
        q = q.withColumn(f"b{t}", lsh_signature(F.col("qv"), planes))
    c = c.persist(StorageLevel.MEMORY_AND_DISK)
    q = q.persist(StorageLevel.MEMORY_AND_DISK)
    cands = None
    for t in range(n_tables):
        m = (
            c.select("neighbor_id", F.col(f"b{t}").alias("bucket"))
            .join(
                F.broadcast(q.select("query_id", F.col(f"b{t}").alias("bucket"))),
                "bucket",
            )
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id")
        )
        cands = m if cands is None else cands.unionByName(m)
    cands = cands.distinct()
    cv = c.select("neighbor_id", "cv").withColumn("cn", norm(F.col("cv")))
    qv = q.select("query_id", "qv").withColumn("qn", norm(F.col("qv")))
    scored = (
        cands.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")) * 1_000_000, 0)
            .cast("long")
            .alias("cos_e6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_e6").desc(), F.col("neighbor_id"))
    return scored.select("*", F.row_number().over(w).alias("rank")).filter(
        F.col("rank") <= k
    )


def ivf_probes(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "label",
    n_probe: int = 1,
) -> DataFrame:
    """Coarse IVF routing shared by ivf_topk and the IVF-PQ composition:
    per-list mean centroids, each query routed to its ``n_probe`` nearest
    lists by cosine (ccos DESC, list_id tiebreak — a total order, so the
    probe set is deterministic).  Returns (query_id, qv, qn, list_id, pr)
    — one row per (query, probed list); centroid count is n_lists, so the
    cross join is broadcast-scalar."""
    c = corpus.select(
        as_double(F.col(vec_col)).alias("cv"), F.col(list_col).alias("list_id")
    )
    # centroid per list: element-wise mean = sum of vectors / count
    dim_cols = [F.avg(F.col("cv")[i]).alias(f"c{i}") for i in range(DIM)]
    centroids = c.groupBy("list_id").agg(*dim_cols).select(
        "list_id", F.array(*[F.col(f"c{i}") for i in range(DIM)]).alias("centroid")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    routed = (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "qv",
            "qn",
            "list_id",
            F.round(cosine(F.col("qv"), F.col("centroid")) * 1_000_000, 0)
            .cast("long")
            .alias("ccos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("list_id"))
    return routed.select(
        "query_id", "qv", "qn", "list_id", F.row_number().over(w).alias("pr")
    ).filter(F.col("pr") <= n_probe)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "label",
    n_probe: int = 1,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize with per-list centroids, search only
    the query's nearest ``n_probe`` lists.

    The corpus is already clustered (``list_col`` — in production the
    k-means assignment computed at index-build time and used as the
    PARTITION column, so a probe reads 1/n_lists of the data).  Centroids
    are the per-list mean vectors; a query routes to its nearest centroid(s)
    by cosine, then exact top-k runs inside those lists only.

    ``n_probe`` is the recall/cost dial: recall@k is monotone in it, and
    n_probe = n_lists degrades gracefully to exact brute force (locked by
    tests/test_similarity_recall.py) — errors come only from skipped lists,
    never from scoring or ranking.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
        F.col(list_col).alias("list_id"),
    ).withColumn("cn", norm(F.col("cv")))
    probes = ivf_probes(
        corpus, queries, id_col=id_col, vec_col=vec_col, list_col=list_col,
        n_probe=n_probe,
    )
    scored = (
        c.join(F.broadcast(probes), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")) * 1_000_000, 0)
            .cast("long")
            .alias("cos_e6"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("cos_e6").desc(), F.col("neighbor_id"))
    return scored.select("*", F.row_number().over(wk).alias("rank")).filter(
        F.col("rank") <= k
    )


DUP_BANDS = 4
DUP_BAND_BITS = N_PLANES // DUP_BANDS  # 2 sign bits per band


def lsh_dup_pairs(
    embeddings: DataFrame, threshold: float, max_bucket: int | None = None
) -> DataFrame:
    """Embedding near-dup pairs with banded LSH blocking (OR-construction):
    candidates share ANY of the 4 two-bit sign bands, then exact cosine
    verifies. Banding trades a small candidate-set increase for high recall
    (~0.9 at 60-degree pairs vs ~0.03 for full-8-bit AND agreement) — the
    same band/bucket scheme MinHash uses, applied to hyperplane signs.

    Cost shape: the band self-join carries ONLY (vec_id, band, band_val) —
    no vectors — and candidate pairs are deduplicated BEFORE any vector
    math, so each surviving pair pays exactly one dot product against
    per-vector precomputed norms.  (Verifying inside the band join instead
    recomputes the cosine once per matching band — up to 4x the work — and
    drags the 64-dim arrays through the widest join in the plan.)

    ``max_bucket`` is the quadratic-blowup guard (the vector analog of
    dedup.py's max_df stop-shingle cap): a (band, band_val) bucket holding
    more than ``max_bucket`` vectors is excluded from candidate generation
    entirely — on an adversarial corpus of near-identical vectors a single
    hot bucket otherwise recreates the O(n^2) self-join this operator
    exists to avoid.  Deterministic (a pure count threshold), so the
    capped operator remains exactly oracle-checkable; pairs sharing only a
    hot band are the recall cost, and a pair is kept if ANY of its shared
    bands survives.  The hot-bucket list is a tiny aggregate broadcast as
    an anti-join — the banded stream itself is never shuffled by the cap."""
    e = embeddings.select(
        F.col("vec_id"), as_double(F.col("embedding")).alias("v")
    ).withColumn("bucket", lsh_signature(F.col("v"))).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    mask = (1 << DUP_BAND_BITS) - 1
    banded = e.select(
        "vec_id",
        "bucket",
        F.explode(F.sequence(F.lit(0), F.lit(DUP_BANDS - 1))).alias("band"),
    ).withColumn(
        "band_val", F.expr(f"shiftright(bucket, cast(band * {DUP_BAND_BITS} AS int)) & {mask}")
    )
    if max_bucket is not None:
        hot = (
            banded.groupBy("band", "band_val")
            .count()
            .filter(F.col("count") > max_bucket)
            .select("band", "band_val")
        )
        banded = banded.join(F.broadcast(hot), ["band", "band_val"], "left_anti")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("d1"), F.col("b.vec_id").alias("d2"))
        .distinct()
    )
    vn = e.select("vec_id", "v", norm(F.col("v")).alias("n"))
    va, vb = vn.alias("va"), vn.alias("vb")
    return (
        cand.join(va, F.col("d1") == F.col("va.vec_id"))
        .join(vb, F.col("d2") == F.col("vb.vec_id"))
        .select(
            "d1",
            "d2",
            F.round(
                dot(F.col("va.v"), F.col("vb.v"))
                / (F.col("va.n") * F.col("vb.n"))
                * 1_000_000,
                0,
            )
            .cast("long")
            .alias("cos_e6"),
        )
        .filter(F.col("cos_e6") >= int(round(threshold * 1_000_000)))
    )


def cosine_dup_pairs(embeddings: DataFrame, threshold: float) -> DataFrame:
    """Embedding near-dup pairs: cosine >= threshold, d1 < d2.

    TEST ORACLE ONLY — O(n^2) all-pairs join, intentionally NOT registered
    as a query: ``lsh_dup_pairs`` is the canonical (bucketed, 100 TB-safe)
    operator, and tests/test_similarity_recall.py uses this exact form to
    measure its recall.
    """
    e = embeddings.repartition(F.col("vec_id")).select(
        F.col("vec_id"), as_double(F.col("embedding")).alias("v")
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("d1"),
            F.col("b.vec_id").alias("d2"),
            F.round(cosine(F.col("a.v"), F.col("b.v")) * 1_000_000, 0)
            .cast("long")
            .alias("cos_e6"),
        )
        .filter(F.col("cos_e6") >= int(round(threshold * 1_000_000)))
    )


def semdedup_drops(
    embeddings: DataFrame, k: int, iters: int, t_e6: int,
    max_pivots: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    k-means clustering + within-cluster cosine pruning.  A vector is DROPPED
    if any earlier (smaller vec_id) vector in its cluster has cosine
    similarity >= the threshold; the surviving smallest id is the cluster's
    representative for that duplicate neighborhood.

    Returns one row per dropped vector: (vec_id, list_id, dup_of, cos_e6)
    where dup_of is the most-similar earlier neighbor (cos_e6 DESC, then
    smallest id — a total order, so the attribution is deterministic) and
    cos_e6 = round(cosine * 1e6) as BIGINT (integer output, engine-portable).

    Scale shape: the pair join is keyed on list_id, so the quadratic blowup
    is bounded per cluster — at 100 TB, k grows with the corpus (k ~=
    n / target_cluster_size, the paper uses ~0.1% of n) keeping each
    cluster's pair count constant; the clustering pass itself is the
    broadcast-centroid kmeans_assign (corpus never collected).  The
    "earlier id wins" rule is the parallel variant of the paper's
    keep-one-per-neighborhood policy: it needs no sequential scan and is
    exactly replayable in SQL.
    """
    from hnarchive_spark.operators.kmeans import kmeans_assign

    a = kmeans_assign(embeddings, k, iters, keep_vec=True)
    return semdedup_prune(a, t_e6, max_pivots=max_pivots)


# Salt range for the uncapped within-cluster pair join (guide §2.5): the
# y side partitions by (list_id, vec_id % PRUNE_SALTS) and the x side
# replicates PRUNE_SALTS ways, so one hot cluster spreads over up to
# PRUNE_SALTS tasks instead of one.  32 gives k*32 join keys (256 at the
# fixture's k=8 — ample spread over any core count) at a 32x replication
# of the x side only — bytes that are linear in the corpus while the pair
# work it parallelizes is quadratic per cluster (paper-sized clusters of
# ~1000: replication is 32n vs 500n pair-rows).
PRUNE_SALTS = 32


def semdedup_prune(
    assign: DataFrame, t_e6: int, max_pivots: int | None = None
) -> DataFrame:
    """The within-cluster cosine prune given an assignment (vec_id, v,
    list_id) — shared by the inline :func:`semdedup_drops` and the
    frozen-centroid probe (sources/semdedup_index.py), so both prune
    identically.

    ``max_pivots`` is the hot-cluster skew guard (the vector analog of
    lsh_dup_pairs' ``max_bucket`` cap): the EARLIER side of the pair join
    is restricted to each cluster's ``max_pivots`` smallest-id members,
    bounding any cluster's pair count at ``max_pivots * |cluster|`` —
    linear, so a degenerate cluster of near-identical vectors can no
    longer recreate the quadratic self-join. Coverage survives where it
    matters: in such a cluster every later vector sits at cosine ~1 to
    pivot #1, so it is still dropped (only the *attribution* may shift to
    an earlier neighbor). The pivot rank is a deterministic row_number
    over (list_id ORDER BY vec_id) — Spark plans it as a WindowGroupLimit
    (per-partition top-P before the full window), and the oracle replays
    it exactly."""
    # Per-vector norms are computed ONCE before the pair join — inside it
    # they would be recomputed per PAIR, tripling the per-pair flops
    # (guide §1.2 step 2; same discipline as cosine_topk).  norm() is the
    # identical fold, and nx * ny multiplies the same doubles the inlined
    # cosine would, so cos_e6 stays bit-for-bit.
    assign = assign.select("vec_id", "v", "list_id", norm(F.col("v")).alias("n"))
    # Skew/parallelism guard (guide §2.5, VERDICT r18 #6): the pair join is
    # keyed on list_id alone, so its parallelism was bounded by k (and by
    # the upstream scan's partition count — a single small parquet file put
    # the ENTIRE quadratic pair stage in ONE task at fixture scale: 0.99
    # core-scaling ratio at 4x cores).  The later (y) side is spread by a
    # DETERMINISTIC salt (pmod(vec_id) — never rand(), §2.5's retry rule)
    # with an EXPLICIT partition count (AQE's byte-sized coalescing would
    # re-merge this compute-heavy, byte-light stage into one task).  The
    # count derives from the session's core budget, not a constant.
    n_part = assign.sparkSession.sparkContext.defaultParallelism
    y_df = (
        assign.withColumn("_ys", F.pmod(F.col("vec_id"), F.lit(PRUNE_SALTS)))
        .repartition(n_part, "list_id", "_ys")
    )
    if max_pivots is not None:
        pw = Window.partitionBy("list_id").orderBy("vec_id")
        x_src = (
            assign.select("*", F.row_number().over(pw).alias("_pr"))
            .filter(F.col("_pr") <= max_pivots)
            .drop("_pr")
        )
        # bounded by construction (max_pivots rows per cluster): broadcast
        # the pivot side so the full assignment is never shuffled (§3.1).
        # No salt needed — the broadcast join inherits y's repartitioned
        # parallelism, and each cluster's pair count is already linear.
        x, y = F.broadcast(x_src).alias("x"), y_df.alias("y")
        cond = (F.col("x.list_id") == F.col("y.list_id")) & (
            F.col("x.vec_id") < F.col("y.vec_id")
        )
    else:
        # uncapped: both sides are the full assignment, so the x side is
        # replicated across the salt range (the classic §2.5 salted join —
        # each y row must meet every earlier cluster member regardless of
        # its salt).  Joining on (list_id, salt) reuses y's repartition
        # exchange and spreads a hot cluster over PRUNE_SALTS partitions.
        x_rep = assign.withColumn(
            "_xs", F.explode(F.array(*[F.lit(i) for i in range(PRUNE_SALTS)]))
        )
        x, y = x_rep.alias("x"), y_df.alias("y")
        cond = (
            (F.col("x.list_id") == F.col("y.list_id"))
            & (F.col("x._xs") == F.col("y._ys"))
            & (F.col("x.vec_id") < F.col("y.vec_id"))
        )
    cos_e6 = F.round(
        dot(F.col("x.v"), F.col("y.v")) / (F.col("x.n") * F.col("y.n")) * 1_000_000, 0
    ).cast("long")
    pairs = (
        x.join(y, cond)
        .select(
            F.col("y.vec_id").alias("vec_id"),
            F.col("y.list_id").alias("list_id"),
            F.col("x.vec_id").alias("dup_of"),
            cos_e6.alias("cos_e6"),
        )
        .filter(F.col("cos_e6") >= t_e6)
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_e6").desc(), "dup_of")
    return (
        pairs.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("vec_id", "list_id", "dup_of", "cos_e6")
    )
