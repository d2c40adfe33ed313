"""Deduplication operators for the training-data pipeline surface:

* exact dedup          — hash-groupBy on a normalized fingerprint;
* n-gram Jaccard       — inverted-index shingle self-join (exact);
* MinHash + LSH        — signature/band/bucket-join (approximate, scale path);
* SimHash              — banded Hamming-distance pairing.

All operators are DataFrame compositions (joins + aggregations) — no UDFs.
Hash functions are md5-prefix integers so the DuckDB oracles can reproduce
them bit-for-bit.

Scale design notes:
* the shingle inverted index shuffles on the shingle — the classic skew
  hazard is stop-shingles; ``max_df`` drops shingles occurring in more than
  N docs (disabled in the oracle-checked queries to keep semantics exact);
* MinHash keeps the pair join bounded: candidates only form inside an LSH
  bucket, so the quadratic blowup is per-bucket, not global;
* SimHash pairs only inside an 8-bit band match — pigeonhole guarantees
  recall for Hamming distance <= bands-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# 31-bit modulus keeps a*h+b inside int64 on both engines (no overflow UB).
MH_PRIME = 2_147_483_647
MH_K = 32  # signature length
MH_R = 2  # rows per band
MH_B = MH_K // MH_R  # 16 bands -> candidate P ~99% at jaccard 0.5

SH_BITS = 32
SH_BANDS = 4  # 4 bands x 8 bits; guarantees recall for hamming <= 3
SH_HAM_MAX = 3


def _lcg_params(k: int) -> list[tuple[int, int, int]]:
    """Deterministic (j, a, b) permutation constants via a fixed LCG."""
    out, x = [], 88172645463325252
    for j in range(k):
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        a = (x % (MH_PRIME - 2)) + 1
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        b = x % MH_PRIME
        out.append((j, a, b))
    return out


MH_PERMS: list[tuple[int, int, int]] = _lcg_params(MH_K)


def h32(col) -> F.Column:
    """First 8 md5 hex chars as an integer — identical to DuckDB's
    ('0x' || substr(md5(x),1,8))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def word_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, shingle) pairs — distinct word n-grams per document.

    Input is repartitioned on the id before the explode: a corpus read from
    few files would otherwise explode (a 10-100x row blowup) inside a
    handful of tasks — the classic single-file hotspot.

    ``carry`` columns (e.g. the doc's source) ride along through the
    explode — cheaper than joining them back on doc_id afterwards."""
    ws = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    parts = [F.element_at(F.col("ws"), F.col("i") + j) for j in range(n)]
    shingle = F.concat_ws(" ", *parts)
    return (
        docs.repartition(F.col(id_col))
        .select(F.col(id_col).alias("doc_id"), *carry, ws.alias("ws"))
        .filter(F.size("ws") >= n)
        .select(
            "doc_id",
            *carry,
            F.explode(F.sequence(F.lit(1), F.size("ws") - (n - 1))).alias("i"),
            "ws",
        )
        .select("doc_id", *carry, shingle.alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame, threshold: float, max_df: int | None = None
) -> DataFrame:
    """Exact pairwise Jaccard >= threshold via inverted-index self-join.

    Returns (d1, d2, jaccard_e4) with d1 < d2; jaccard_e4 is the
    round-half-up ten-thousandths similarity computed in pure BIGINT
    arithmetic — ``(2*1e4*common + union) div (2*union)`` — so the value
    (and the threshold comparison) is engine-portable with no float
    rounding anywhere.  ``max_df`` (scale knob) drops shingles shared by
    more than N docs before pairing — recall loss only for pairs whose
    entire overlap is stop-shingles.
    """
    t_e4 = int(round(threshold * 10000))
    if max_df is not None:
        keep = shingles.groupBy("shingle").count().filter(F.col("count") <= max_df)
        shingles = shingles.join(keep.select("shingle"), "shingle")
    # the shingle index feeds three consumers (sizes + both join sides):
    # materialize it once instead of re-scanning/re-exploding the corpus
    shingles = shingles.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = shingles.alias("a"), shingles.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        common.join(sa, F.col("d1") == F.col("sa.doc_id"))
        .join(sb, F.col("d2") == F.col("sb.doc_id"))
        .select(
            "d1",
            "d2",
            F.expr(
                "(20000 * common + (sa.n + sb.n - common))"
                " div (2 * (sa.n + sb.n - common))"
            ).alias("jaccard_e4"),
        )
        .filter(F.col("jaccard_e4") >= t_e4)
    )


def minhash_signatures(shingles: DataFrame) -> DataFrame:
    """(doc_id, sig_0..sig_{K-1}) — min over shingles of (a_j*h32+b_j) mod P.

    Wide-aggregate form: K min-columns over the (doc_id, h) rows in ONE
    partial-aggregated shuffle.  The naive explode form (K rows per shingle)
    shuffles K times the data for the same answer — at 100 TB that is the
    difference between one pass and K passes."""
    h = (h32(F.col("shingle")) % MH_PRIME).alias("h")
    return shingles.select("doc_id", h).groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % MH_PRIME).alias(f"sig_{j}")
            for j, a, b in MH_PERMS
        ]
    )


def band_rows(signatures: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) — the LSH banding of wide signatures.
    Banding explodes only B rows per doc (B=16), not K per shingle.
    Shared by the inline candidate join and the persisted MinHash index
    (sources/minhash_index.py), so index and inline bucket identically."""
    bands = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.concat_ws(
                    ",", *[F.col(f"sig_{band * MH_R + r}").cast("string") for r in range(MH_R)]
                ).alias("band_key"),
            )
            for band in range(MH_B)
        ]
    )
    return signatures.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.band_key").alias("band_key")
    )


def lsh_candidates(signatures: DataFrame) -> DataFrame:
    """Band the wide signatures and emit distinct candidate pairs (d1 < d2)."""
    banded = (
        band_rows(signatures)
        # one row per (doc, band) — tiny; persisting stops the self-join
        # from recomputing the whole signature pipeline for both sides
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    x, y = banded.alias("x"), banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2"))
        .distinct()
    )


def verify_jaccard_pairs(
    cands: DataFrame, shingles: DataFrame, t_e4: int
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs: (d1, d2) candidates
    against a shingle frame covering (at least) every candidate doc.
    Returns (d1, d2, jaccard_e4 >= t_e4) — the pure-BIGINT recipe of
    :func:`jaccard_pairs`.  The broadcast of the candidate set restricts
    the shingle self-join to LSH survivors; shared by the inline
    :func:`minhash_dedup_pairs` and the persisted index probe
    (sources/minhash_index.py), so both verify identically."""
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = shingles.alias("a"), shingles.alias("b")
    common = (
        F.broadcast(cands)
        .join(a, F.col("a.doc_id") == F.col("d1"))
        .join(b, (F.col("b.doc_id") == F.col("d2")) & (F.col("a.shingle") == F.col("b.shingle")))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    return (
        common.join(sa, F.col("d1") == F.col("sa.doc_id"))
        .join(sb, F.col("d2") == F.col("sb.doc_id"))
        .select(
            "d1",
            "d2",
            F.expr(
                "(20000 * common + (sa.n + sb.n - common))"
                " div (2 * (sa.n + sb.n - common))"
            ).alias("jaccard_e4"),
        )
        .filter(F.col("jaccard_e4") >= t_e4)
    )


def minhash_dedup_pairs(shingles: DataFrame, threshold: float) -> DataFrame:
    """LSH candidates verified with exact Jaccard (>= threshold).

    The verify join restricts the shingle self-join to candidate pairs, so
    the expensive exact computation touches only LSH survivors.  Emits the
    same pure-BIGINT ``jaccard_e4`` as :func:`jaccard_pairs`.
    """
    t_e4 = int(round(threshold * 10000))
    shingles = shingles.persist(StorageLevel.MEMORY_AND_DISK)
    sigs = minhash_signatures(shingles)
    cands = lsh_candidates(sigs)
    return verify_jaccard_pairs(cands, shingles, t_e4)


def simhash(docs_tokens: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 32-bit SimHash over distinct tokens.

    Bit i of the hash is 1 iff the sum over tokens of (2*bit_i(h32)-1) > 0.
    Wide-aggregate form: 32 per-bit sums in one shuffle (no 32x bit-explode),
    then the hash is assembled from the sign columns in a single projection.
    """
    h = h32(F.col("w")).alias("h")
    sums = docs_tokens.select("doc_id", h).groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(shiftright(h, {i}) & 1) = 1"), 1).otherwise(-1)
            ).alias(f"s{i}")
            for i in range(SH_BITS)
        ]
    )
    assemble = None
    for i in range(SH_BITS):
        term = F.when(F.col(f"s{i}") > 0, F.lit(1 << i).cast("long")).otherwise(0)
        assemble = term if assemble is None else assemble + term
    return sums.select("doc_id", assemble.alias("simhash"))


def simhash_pairs(docs_tokens: DataFrame, ham_max: int = SH_HAM_MAX) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= ham_max, found by
    matching any of the 4 8-bit bands (pigeonhole-complete for <= 3)."""
    sh = simhash(docs_tokens).persist(StorageLevel.MEMORY_AND_DISK)
    width = SH_BITS // SH_BANDS
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(SH_BANDS - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftright(simhash, cast(band * {width} AS int)) & {(1 << width) - 1}"),
    )
    x, y = banded.alias("x"), banded.alias("y")
    ham = F.expr("bit_count(x.simhash ^ y.simhash)")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("d1"),
            F.col("y.doc_id").alias("d2"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= ham_max)
    )


def containment_pairs(
    shingles: DataFrame, threshold: float, max_df: int | None = None
) -> DataFrame:
    """Asymmetric containment near-dup pairs: C(src in dst) =
    |shingles(src) ∩ shingles(dst)| / |shingles(src)|.

    Containment is the subset/quote detector Jaccard misses: a short doc
    fully embedded in a long one has low Jaccard (the union is dominated
    by the long doc) but containment ~1.0 from the short side.  Returns
    ORDERED pairs (src, dst, containment_e4) with src != dst,
    containment_e4 >= round(threshold * 1e4); containment_e4 is the same
    pure-BIGINT round-half-up recipe as ``jaccard_pairs``
    ((2*1e4*common + n_src) div (2*n_src)).

    Cost shape is identical to :func:`jaccard_pairs` — ONE inverted-index
    self-join on the shingle computes each unordered pair's intersection
    once; both directed containments project from that single row, so the
    asymmetric operator costs no extra shuffle.  ``max_df`` is the same
    stop-shingle skew guard.
    """
    t_e4 = int(round(threshold * 10000))
    if max_df is not None:
        keep = shingles.groupBy("shingle").count().filter(F.col("count") <= max_df)
        shingles = shingles.join(keep.select("shingle"), "shingle")
    shingles = shingles.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = shingles.alias("a"), shingles.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    both = (
        common.join(sa, F.col("d1") == F.col("sa.doc_id"))
        .join(sb, F.col("d2") == F.col("sb.doc_id"))
        .select("d1", "d2", "common", F.col("sa.n").alias("n1"), F.col("sb.n").alias("n2"))
    )
    fwd = both.select(
        F.col("d1").alias("src"),
        F.col("d2").alias("dst"),
        F.expr("(20000 * common + n1) div (2 * n1)").alias("containment_e4"),
    )
    rev = both.select(
        F.col("d2").alias("src"),
        F.col("d1").alias("dst"),
        F.expr("(20000 * common + n2) div (2 * n2)").alias("containment_e4"),
    )
    return fwd.unionByName(rev).filter(F.col("containment_e4") >= t_e4)


def minhash_estimate_vs_exact(shingles: DataFrame) -> DataFrame:
    """Sketch-accuracy harness: for every LSH candidate pair, the MinHash
    Jaccard ESTIMATE (matching signature components / K, as e4 integer)
    next to the exact jaccard_e4 — the measurement that justifies (or
    indicts) the sketch parameters (K=MH_K, MH_B bands of MH_R).

    One wide-agg signature pass (shared with the LSH candidates), one
    banded candidate join, then per-pair: the K equality indicators sum in
    a single projection over the two joined signature rows (no per-
    component explode), and the exact side reuses the inverted-index
    intersection restricted to candidates.  All integers on both engines.
    """
    shingles = shingles.persist(StorageLevel.MEMORY_AND_DISK)
    sigs = minhash_signatures(shingles).persist(StorageLevel.MEMORY_AND_DISK)
    cands = lsh_candidates(sigs)
    s1, s2 = sigs.alias("s1"), sigs.alias("s2")
    matches = sum(
        F.when(F.col(f"s1.sig_{j}") == F.col(f"s2.sig_{j}"), 1).otherwise(0)
        for j in range(MH_K)
    )
    est = (
        F.broadcast(cands)
        .join(s1, F.col("d1") == F.col("s1.doc_id"))
        .join(s2, F.col("d2") == F.col("s2.doc_id"))
        .select("d1", "d2", matches.alias("m"))
        .select(
            "d1",
            "d2",
            F.expr(f"(20000 * m + {MH_K}) div (2 * {MH_K})").alias("est_e4"),
        )
    )
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = shingles.alias("a"), shingles.alias("b")
    common = (
        F.broadcast(cands)
        .join(a, F.col("a.doc_id") == F.col("d1"))
        .join(b, (F.col("b.doc_id") == F.col("d2")) & (F.col("a.shingle") == F.col("b.shingle")))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    exact = (
        common.join(sa, F.col("d1") == F.col("sa.doc_id"))
        .join(sb, F.col("d2") == F.col("sb.doc_id"))
        .select(
            "d1",
            "d2",
            F.expr(
                "(20000 * common + (sa.n + sb.n - common))"
                " div (2 * (sa.n + sb.n - common))"
            ).alias("jaccard_e4"),
        )
    )
    # candidates with zero common shingles (pure band collision) keep
    # jaccard_e4 = 0 via the left join + coalesce
    return est.join(exact, ["d1", "d2"], "left").select(
        "d1", "d2", "est_e4", F.coalesce("jaccard_e4", F.lit(0)).alias("jaccard_e4")
    )
