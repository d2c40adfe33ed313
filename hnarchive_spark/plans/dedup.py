"""Dedup queries over `documents`, each mirrored by a DuckDB oracle that
reproduces the SAME hash math (md5-prefix integers, shared permutation
constants), so even the approximate operators are hash-checked exactly.

Thresholds are tuned to the corpus structure (25 planted near-dup pairs with
Jaccard >= 0.5; the next pair down is < 0.1, so 0.5 sits in a wide gap and
cannot flap on float rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hnarchive_spark.functions import text as T
from hnarchive_spark.operators import dedup as D
from hnarchive_spark.plans.registry import query
from hnarchive_spark.tables import load

JACCARD_T = 0.5
JACCARD_T_E4 = int(round(JACCARD_T * 10000))  # integer e4 threshold used by every oracle

# Shared SQL fragments ------------------------------------------------------

_TOK = """
    tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), w -> w != '')) AS w,
             unnest(range(1, len(list_filter(string_split(text, ' '), w -> w != '')) + 1)) AS i
      FROM documents
    )
"""

_SHINGLES_RAW = (
    _TOK
    + """,
    sh AS (
      SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
      FROM tok a
      JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2
    )
"""
)

_SHINGLES = (
    _SHINGLES_RAW
    + """,
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
"""
)


@query(
    "q_dedup_exact",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             substr(md5(regexp_replace(lower(text), ' +', ' ', 'g')), 1, 16) AS fp
      FROM documents
    )
    SELECT fp, min(doc_id) AS keep_doc_id, count(*) AS n_dups
    FROM fp GROUP BY fp
    """,
    doc="Exact dedup: hash-groupBy on the normalized fingerprint, keeping the "
    "smallest doc_id per group — one shuffle on a 64-bit key.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_dups"))
    )


@query(
    "q_dedup_ngram",
    oracle=f"""
    WITH {_SHINGLES},
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT d1, d2, jaccard_e4 FROM (
      SELECT d1, d2,
             (20000 * common + (sa.n + sb.n - common))
               // (2 * (sa.n + sb.n - common)) AS jaccard_e4
      FROM pairs
      JOIN sizes sa ON sa.doc_id = d1
      JOIN sizes sb ON sb.doc_id = d2
    ) WHERE jaccard_e4 >= {JACCARD_T_E4}
    """,
    doc="Exact n-gram Jaccard dedup via the inverted-index shingle self-join "
    "(word 3-grams); the shuffle key is the shingle.",
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return D.jaccard_pairs(D.word_shingles(d), JACCARD_T)


NGRAM_MAX_DF = 10  # drop shingles shared by more than 10 docs (stop-shingles)


@query(
    "q_dedup_ngram_maxdf",
    oracle=f"""
    WITH {_SHINGLES_RAW},
    keep AS (
      SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {NGRAM_MAX_DF}
    ),
    shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
    sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
      FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT d1, d2, jaccard_e4 FROM (
      SELECT d1, d2,
             (20000 * common + (sa.n + sb.n - common))
               // (2 * (sa.n + sb.n - common)) AS jaccard_e4
      FROM pairs
      JOIN sizes sa ON sa.doc_id = d1
      JOIN sizes sb ON sb.doc_id = d2
    ) WHERE jaccard_e4 >= {JACCARD_T_E4}
    """,
    doc=f"Skew-safe n-gram Jaccard dedup: identical to q_dedup_ngram but with "
    f"the max_df={NGRAM_MAX_DF} stop-shingle filter ON — a shingle occurring "
    "in more docs than that is dropped BEFORE the inverted-index self-join, "
    "bounding every shingle's pair contribution to max_df^2. This is the "
    "plan to run at 100 TB (adversarial corpora make unfiltered stop-shingle "
    "keys explode); the filter is deterministic, so the oracle replays it "
    "exactly and the scale path itself is hash-checked.",
)
def q_dedup_ngram_maxdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return D.jaccard_pairs(D.word_shingles(d), JACCARD_T, max_df=NGRAM_MAX_DF)


def _minhash_prefix() -> str:
    """Shared CTE chain (shingles -> hashed -> sigs -> bands -> cands) for
    every MinHash oracle; replays operators/dedup.py's exact constants."""
    perms = ",\n        ".join(f"({j}, {a}, {b})" for j, a, b in D.MH_PERMS)
    return f"""
    WITH {_SHINGLES},
    perms(j, a, b) AS (VALUES
        {perms}
    ),
    hashed AS (
      SELECT doc_id,
             ('0x' || substr(md5(shingle), 1, 8))::BIGINT % {D.MH_PRIME} AS h
      FROM sh
    ),
    sigs AS (
      SELECT doc_id, j, min((a * h + b) % {D.MH_PRIME}) AS sig
      FROM hashed CROSS JOIN perms
      GROUP BY doc_id, j
    ),
    bands AS (
      SELECT doc_id, j // {D.MH_R} AS band,
             string_agg(CAST(sig AS VARCHAR), ',' ORDER BY j) AS band_key
      FROM sigs GROUP BY doc_id, band
    ),
    cands AS (
      SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id
    ),"""


def _minhash_oracle() -> str:
    return _minhash_prefix() + f"""
    common AS (
      SELECT c.d1, c.d2, count(*) AS common
      FROM cands c
      JOIN sh a ON a.doc_id = c.d1
      JOIN sh b ON b.doc_id = c.d2 AND b.shingle = a.shingle
      GROUP BY c.d1, c.d2
    )
    SELECT d1, d2, jaccard_e4 FROM (
      SELECT d1, d2, (20000 * common + (sa.n + sb.n - common))
               // (2 * (sa.n + sb.n - common)) AS jaccard_e4
      FROM common
      JOIN sizes sa ON sa.doc_id = d1
      JOIN sizes sb ON sb.doc_id = d2
    ) WHERE jaccard_e4 >= {JACCARD_T_E4}
    """


@query(
    "q_dedup_minhash",
    oracle=_minhash_oracle(),
    doc=f"MinHash+LSH dedup: {D.MH_K} md5-derived permutations, bands of "
    f"{D.MH_R} ({D.MH_B} bands; candidate prob ~0.99 at J=0.5), candidates "
    "verified with exact Jaccard. The oracle replays the identical hash "
    "pipeline in SQL, so this approximate operator is value-hash-checked.",
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return D.minhash_dedup_pairs(D.word_shingles(d), JACCARD_T)


@query(
    "q_dedup_minhash_indexed",
    oracle=_minhash_oracle(),
    doc="MinHash+LSH near-dup served from the PERSISTED signature index "
    "(sources/minhash_index.py) — the production form of q_dedup_minhash, "
    "which recomputes every archive signature per run (the near-dup twin "
    "of the IVF-training / BM25-retokenize critique): banded signature "
    "rows are built ONCE (here: build on even doc_ids, then the O(batch) "
    "idempotent append absorbs the odds, so the oracle-checked rows cover "
    "the append path too), partitioned by band-key hash bucket; the query "
    "self-joins the persisted bands for candidates — zero signature "
    "computation at probe time — and exact-verifies by re-shingling ONLY "
    "candidate docs (the index stores 16 metadata-width rows per doc, "
    "never shingle sets: the honest storage trade, since verify cost is "
    "bounded by the index's own selectivity). Appends are presence-set "
    "anti-joined pruned to the batch's id buckets with intra-batch dedup; "
    "batch probes are partition-pruned to their band buckets (plan-locked); "
    "compaction rewrites both components behind the atomic _CURRENT "
    "pointer. Rows equal the inline form's and the oracle is shared; "
    "build-once means bench warmup pays the build and min-of-3 measures "
    "the serve path.",
)
def q_dedup_minhash_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.scratch import built_once
    from hnarchive_spark.sources.minhash_index import (
        append_minhash_index,
        build_minhash_index,
        index_pairs,
    )

    d = load(spark, sf_dir, "documents")

    def _build(p: str) -> None:
        build_minhash_index(spark, d.filter(F.col("doc_id") % 2 == 0), p)
        append_minhash_index(spark, d.filter(F.col("doc_id") % 2 == 1), p)

    path = built_once("minhash_index", sf_dir, _build)
    return index_pairs(spark, path, d, JACCARD_T)


def _minhash_incremental_oracle() -> str:
    """The cross-boundary restriction of the shared MinHash chain: only
    batch(odd) x archive(even) candidate pairs, oriented (batch, archive)."""
    return _minhash_prefix() + f"""
    xp AS (
      SELECT CASE WHEN d1 % 2 = 1 THEN d1 ELSE d2 END AS bd,
             CASE WHEN d1 % 2 = 1 THEN d2 ELSE d1 END AS cd
      FROM cands WHERE (d1 % 2) != (d2 % 2)
    ),
    common AS (
      SELECT c.bd, c.cd, count(*) AS common
      FROM xp c
      JOIN sh a ON a.doc_id = c.bd
      JOIN sh b ON b.doc_id = c.cd AND b.shingle = a.shingle
      GROUP BY c.bd, c.cd
    )
    SELECT d1, d2, jaccard_e4 FROM (
      SELECT bd AS d1, cd AS d2,
             (20000 * common + (sa.n + sb.n - common))
               // (2 * (sa.n + sb.n - common)) AS jaccard_e4
      FROM common
      JOIN sizes sa ON sa.doc_id = bd
      JOIN sizes sb ON sb.doc_id = cd
    ) WHERE jaccard_e4 >= {JACCARD_T_E4}
    """


@query(
    "q_dedup_minhash_incremental",
    oracle=_minhash_incremental_oracle(),
    doc="Incremental MinHash near-dup (daily batch vs PERSISTED archive "
    "index) — the nightly production probe the index exists for: the "
    "batch (odd doc_ids; in production the new partition) computes ONLY "
    "its own signatures, semi-routes into just the band buckets its keys "
    "hash to (partition-pruned archive scan, plan-locked in "
    "test_minhash_index.py), pairs against the persisted banded rows, "
    "and exact-verifies by re-shingling only candidate docs. Per-day "
    "cost is O(batch + candidates); the archive's signatures are never "
    "recomputed and its corpus never re-scanned beyond candidate-doc "
    "verification. The oracle is the inline MinHash chain restricted to "
    "cross-boundary pairs oriented (batch, archive) — the hash check "
    "covers the pruned probe path end to end. Batch-internal duplication "
    "is deliberately deferred to the next day's archive, the same "
    "documented recall trade as q_dedup_incremental / "
    "q_substring_dedup_incremental.",
)
def q_dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.scratch import built_once
    from hnarchive_spark.sources.minhash_index import (
        build_minhash_index,
        probe_minhash_pairs,
    )

    d = load(spark, sf_dir, "documents")
    arch = d.filter(F.col("doc_id") % 2 == 0)
    path = built_once(
        "minhash_index_arch",
        sf_dir,
        lambda p: build_minhash_index(spark, arch, p),
    )
    return probe_minhash_pairs(
        spark, d.filter(F.col("doc_id") % 2 == 1), path, arch, JACCARD_T
    )


def _clusters_oracle() -> str:
    return f"""
    WITH RECURSIVE {_SHINGLES},
    pc AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT d1, d2 FROM (
        SELECT d1, d2, (20000 * common + (sa.n + sb.n - common))
               // (2 * (sa.n + sb.n - common)) AS j
        FROM pc JOIN sizes sa ON sa.doc_id = d1 JOIN sizes sb ON sb.doc_id = d2
      ) WHERE j >= {JACCARD_T_E4}
    ),
    edges AS (
      SELECT d1 AS a, d2 AS b FROM pairs
      UNION SELECT d2, d1 FROM pairs
    ),
    reach(node, comp) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.node
    )
    SELECT node AS doc_id, min(comp) AS cluster_id,
           (min(comp) = node) AS is_keeper
    FROM reach GROUP BY node
    """


@query(
    "q_dedup_clusters",
    oracle=_clusters_oracle(),
    doc="Dedup clustering: near-dup pairs -> connected components via "
    "iterative min-label propagation (O(diameter) shuffles); each cluster "
    "keeps its min doc_id as the survivor. The end of the dedup pipeline: "
    "pairs become drop-lists.",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.operators.components import connected_components

    d = load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(D.word_shingles(d), JACCARD_T)
    comps = connected_components(pairs)
    return comps.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("comp") == F.col("node")).alias("is_keeper"),
    )


def _pipeline_oracle() -> str:
    stop_list = ", ".join(f"'{w}'" for w in T.EN_STOPWORDS)
    return f"""
    WITH RECURSIVE {_SHINGLES},
    pc AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT d1, d2 FROM (
        SELECT d1, d2, (20000 * common + (sa.n + sb.n - common))
               // (2 * (sa.n + sb.n - common)) AS j
        FROM pc JOIN sizes sa ON sa.doc_id = d1 JOIN sizes sb ON sb.doc_id = d2
      ) WHERE j >= {JACCARD_T_E4}
    ),
    edges AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
    reach(node, comp) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.node
    ),
    dropped AS (
      SELECT node AS doc_id FROM reach GROUP BY node HAVING min(comp) <> node
    ),
    qraw AS (
      SELECT doc_id, lang, len(ws) AS n_tokens,
             len(list_filter(ws, w -> w IN ({stop_list}))) AS stop_hits,
             CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS sum_len
      FROM (SELECT doc_id, lang,
                   list_filter(string_split(text, ' '), w -> w != '') AS ws
            FROM documents)
    ),
    quality AS (
      -- pure-BIGINT round_half_up quality (the q_corpus_datacard recipe):
      -- 1e4 * (0.5*stop/n + 0.5*n/(n + |sum_len - 5n|)) with no float
      -- anywhere, so no round-tie / 1-ulp drift across engines or builds
      SELECT doc_id, lang,
             (2 * (5000 * stop_hits * (n_tokens + abs(sum_len - 5 * n_tokens))
                   + 5000 * n_tokens * n_tokens)
              + n_tokens * (n_tokens + abs(sum_len - 5 * n_tokens)))
             // (2 * n_tokens * (n_tokens + abs(sum_len - 5 * n_tokens))) AS quality_e4
      FROM qraw
    )
    SELECT q.doc_id, q.lang, q.quality_e4
    FROM quality q
    LEFT JOIN dropped d ON d.doc_id = q.doc_id
    WHERE d.doc_id IS NULL AND q.quality_e4 >= 1200
    """


@query(
    "q_pipeline_clean_corpus",
    oracle=_pipeline_oracle(),
    doc="The training-data pipeline composed end-to-end in ONE declarative "
    "plan: quality scoring (pure-BIGINT quality_e4, threshold 0.12 -> "
    ">= 1200) -> near-dup clustering -> drop non-keepers -> quality "
    "threshold. Catalyst fuses the stages; nothing materializes between "
    "them except the persisted shingle index.",
)
def q_pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.operators.components import connected_components

    d = load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(D.word_shingles(d), JACCARD_T)
    comps = connected_components(pairs)
    dropped = comps.filter(F.col("comp") != F.col("node")).select(
        F.col("node").alias("doc_id")
    )
    ws = T.tokens(F.col("text"))
    quality = d.select(
        "doc_id",
        "lang",
        F.size(ws).cast("long").alias("n_tokens"),
        T.stopword_hits(F.col("text"), T.EN_STOPWORDS).cast("long").alias("stop_hits"),
        T.sum_token_len(F.col("text")).alias("sum_len"),
    ).select("doc_id", "lang", T.quality_e4_int().alias("quality_e4"))
    return (
        quality.join(dropped, "doc_id", "left_anti")
        .filter(F.col("quality_e4") >= 1200)
    )


@query(
    "q_sample_weighted",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','is'))) AS BIGINT)
               AS stop_hits,
             CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS sum_len
      FROM (SELECT doc_id, list_filter(string_split(text, ' '), w -> w != '') AS ws
            FROM documents)
    ),
    q AS (
      SELECT doc_id,
             (2 * (5000 * stop_hits * (n_tokens + abs(sum_len - 5 * n_tokens))
                   + 5000 * n_tokens * n_tokens)
              + n_tokens * (n_tokens + abs(sum_len - 5 * n_tokens)))
             // (2 * n_tokens * (n_tokens + abs(sum_len - 5 * n_tokens))) AS quality_e4
      FROM m
    )
    SELECT doc_id, CAST(quality_e4 AS BIGINT) AS quality_e4
    FROM q
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000
          < (quality_e4 * 3) // 10
    """,
    doc="Quality-weighted acceptance sampling: each doc kept with probability "
    "proportional to its quality score (pure-BIGINT quality_e4; acceptance "
    "threshold (quality_e4*3) div 10 of 1000 hash buckets), via the "
    "deterministic key hash — the upsampling-good-data stage of a training "
    "pipeline, reproducible across runs and engines with no float anywhere.",
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ws = T.tokens(F.col("text"))
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 1000
    return (
        d.select(
            "doc_id",
            F.size(ws).cast("long").alias("n_tokens"),
            T.stopword_hits(F.col("text"), T.EN_STOPWORDS).cast("long").alias("stop_hits"),
            T.sum_token_len(F.col("text")).alias("sum_len"),
            bucket.alias("_b"),
        )
        .select("doc_id", T.quality_e4_int().alias("quality_e4"), "_b")
        .filter(F.col("_b") < F.expr("(quality_e4 * 3) div 10"))
        .drop("_b")
    )


@query(
    "q_mix_equalize",
    oracle="""
    WITH counts AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ),
    rates AS (
      SELECT lang,
             CAST(((SELECT min(n) FROM counts) * 1000000) // n AS BIGINT) AS rate_e6
      FROM counts
    )
    SELECT d.doc_id, d.lang, r.rate_e6
    FROM documents d JOIN rates r USING (lang)
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
          < r.rate_e6
    """,
    doc="Language-mix equalization (the data-mixing step of corpus assembly): "
    "per-language acceptance rate = min_lang_count / lang_count, applied via "
    "the deterministic doc_id hash, so the dominant language is downsampled "
    "toward the rarest one reproducibly across runs and engines. "
    "Data-DEPENDENT rates distinguish this from the fixed-rate samplers: "
    "one tiny counts aggregate broadcasts into the filter. At 100 TB the "
    "counts side is a few rows per language — broadcast join, zero extra "
    "shuffle of the corpus. The rate is an exact e6 integer "
    "((min_n * 1e6) div n), so the hash-bucket threshold never touches a "
    "float on either engine.",
)
def q_mix_equalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    min_n = counts.agg(F.min("n").alias("m"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        "lang", F.expr("(m * 1000000) div n").alias("rate_e6")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 1_000_000
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(bucket < F.col("rate_e6"))
        .select("doc_id", "lang", "rate_e6")
    )


def _simhash_oracle() -> str:
    width = D.SH_BITS // D.SH_BANDS
    return f"""
    WITH {_TOK},
    toks AS (SELECT DISTINCT doc_id, w FROM tok),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h FROM toks
    ),
    bits AS (
      SELECT doc_id, t.bit,
             sum(CASE WHEN ((h >> t.bit) & 1) = 1 THEN 1 ELSE -1 END) AS s
      FROM hashed, range(0, {D.SH_BITS}) t(bit)
      GROUP BY doc_id, t.bit
    ),
    sh AS (
      SELECT doc_id,
             sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS simhash
      FROM bits GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, simhash, t.band,
             (simhash >> (t.band * {width})) & {(1 << width) - 1} AS band_val
      FROM sh, range(0, {D.SH_BANDS}) t(band)
    )
    SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
           bit_count(xor(x.simhash, y.simhash)) AS hamming
    FROM banded x
    JOIN banded y ON x.band = y.band AND x.band_val = y.band_val
                 AND x.doc_id < y.doc_id
    WHERE bit_count(xor(x.simhash, y.simhash)) <= {D.SH_HAM_MAX}
    """


@query(
    "q_dedup_simhash",
    oracle=_simhash_oracle(),
    doc=f"SimHash dedup: 32-bit token-set simhash, {D.SH_BANDS} 8-bit bands "
    f"(pigeonhole-complete for Hamming <= {D.SH_HAM_MAX}); banded join "
    "bounds the pair space.",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("w")).distinct()
    )
    return D.simhash_pairs(toks)


def _contamination_oracle() -> str:
    return (
        "\n    WITH "
        + _TOK
        + """,
    sh AS (
      SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
      FROM tok a
      JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2
    ),
    split AS (
      SELECT doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10 = 0 AS is_eval
      FROM documents
    ),
    tr AS (
      SELECT DISTINCT shingle FROM sh JOIN split USING (doc_id) WHERE NOT is_eval
    ),
    ev AS (
      SELECT sh.doc_id, sh.shingle FROM sh JOIN split USING (doc_id) WHERE is_eval
    ),
    tot AS (SELECT doc_id, count(*) AS n_shingles FROM ev GROUP BY doc_id),
    hit AS (
      SELECT doc_id, count(*) AS n_hits FROM ev
      WHERE shingle IN (SELECT shingle FROM tr) GROUP BY doc_id
    )
    SELECT tot.doc_id, tot.n_shingles,
           coalesce(hit.n_hits, 0) AS n_hits,
           CAST((coalesce(hit.n_hits, 0) * 10000) // tot.n_shingles AS BIGINT)
             AS contamination_e4
    FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id
    """
    )


@query(
    "q_contamination",
    oracle=_contamination_oracle(),
    doc="Train/eval contamination check: deterministic 10% eval split by "
    "doc_id hash, word-3gram overlap of each eval doc against the distinct "
    "train shingle set (the benchmark-leakage scan a training pipeline runs "
    "before every release).",
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-eval-doc contamination ratio vs the train split.

    Scale shape: one explode->distinct per side keyed on doc_id, then a
    left-semi join keyed on the shingle (the inverted index).  At 100 TB the
    train shingle set is the big side of that exchange, so a broadcast Bloom
    filter (operators/bloom.py) built from the SMALL side (the 10% eval
    shingles) pre-prunes the train side BEFORE its shuffle — typically >90%
    of train shingles never reach the exchange.  Bloom false positives only
    pass extra rows into the exact semi join, and there are no false
    negatives, so results are hash-identical to the unfiltered plan.  No
    reference analog (capability extension; cf. SURVEY.md §2.10).
    """
    from hnarchive_spark.operators.bloom import bloom_build, bloom_prune

    d = load(spark, sf_dir, "documents")
    is_eval = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10 == 0
    )
    # is_eval is a pure function of doc_id, so the split is a COLUMN on the
    # shingle rows, not a join (r11: the join was a wasted pass over the
    # full shingle set — at 100 TB, a corpus-wide broadcast-join stage)
    sh = D.word_shingles(d).withColumn("is_eval", is_eval).persist()
    ev = sh.filter(F.col("is_eval")).select("doc_id", "shingle")
    ev_bloom = bloom_build(ev, "shingle")
    # bloom runs before tr's exchange; the semi join stays exact (a left-semi
    # right side needs no distinct — that was a redundant extra shuffle)
    tr = bloom_prune(sh.filter(~F.col("is_eval")).select("shingle"), "shingle", ev_bloom)
    tot = ev.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hit = (
        ev.join(tr, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return tot.join(hit, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        F.expr("(coalesce(n_hits, 0) * 10000) div n_shingles").alias("contamination_e4"),
    )


def _is_eval_col() -> F.Column:
    """The deterministic 10% eval split (md5(doc_id) bucket) — shared by
    the inline q_contamination and the persisted-gate twin so both split
    identically."""
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10 == 0
    )


@query(
    "q_contamination_indexed",
    oracle=_contamination_oracle(),
    doc="Train/eval contamination against the PERSISTED eval gate "
    "(sources/contamination_index.py) — the production form of "
    "q_contamination, which re-shingles the eval suite and rebuilds its "
    "Bloom bitmap on every run: the eval split's shingle set (bucket-"
    "partitioned by shingle hash), Bloom bitmap, and per-doc totals are "
    "built ONCE behind the atomic _CURRENT pointer; each training batch "
    "then costs O(batch) — its own shingle pass, the broadcast Bloom "
    "prune BEFORE any exchange (no false negatives; false positives die "
    "in the exact semi-join), and a semi-join into only the matching "
    "shingle buckets (partition-pruned). New benchmarks append via the "
    "presence-anti-joined eval append with an OR-merged bitmap (ev -> "
    "bloom -> tot publish order; tot is the commit marker and every torn "
    "state is a safe superset). Rows equal the inline form's and the "
    "oracle is shared; build-once means bench warmup pays the eval "
    "indexing and min-of-3 measures the per-batch gate.",
)
def q_contamination_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.scratch import built_once
    from hnarchive_spark.sources.contamination_index import (
        build_contamination_index,
        probe_contamination,
    )

    d = load(spark, sf_dir, "documents")
    path = built_once(
        "contamination_index",
        sf_dir,
        lambda p: build_contamination_index(spark, d.filter(_is_eval_col()), p),
    )
    return probe_contamination(spark, d.filter(~_is_eval_col()), path)


BOILER_N = 2  # n-gram size for boilerplate detection
BOILER_PCT = 20  # document-frequency threshold, percent of the source's docs


@query(
    "q_boilerplate_ngrams",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             unnest(list_filter(string_split(text, ' '), w -> w != '')) AS w,
             unnest(range(1, len(list_filter(string_split(text, ' '), w -> w != '')) + 1)) AS i
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT a.doc_id, a.source, a.w || ' ' || b.w AS shingle
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
    ),
    nd AS (SELECT source, count(DISTINCT doc_id) AS n_docs FROM sh GROUP BY source),
    df AS (SELECT source, shingle, count(*) AS df FROM sh GROUP BY source, shingle)
    SELECT source, shingle, df, n_docs
    FROM df JOIN nd USING (source)
    WHERE df * 100 >= {BOILER_PCT} * n_docs
    """,
    doc=f"Per-source boilerplate n-gram detection (the CCNet/RefinedWeb-style "
    f"template filter): word {BOILER_N}-grams whose document frequency within "
    f"a source reaches {BOILER_PCT}% of that source's docs are templates "
    "(headers, footers, nav chrome), not content. Two partial-agg shuffles — "
    "the (source, shingle) df count and the tiny per-source doc count "
    "(broadcast back) — and the threshold compares integers (df*100 >= "
    "pct*n_docs) so no float reaches the plan. At 100 TB the hot df "
    "aggregation is the same shape as the max_df stop-shingle scan; the "
    "output feeds a broadcast anti-join that strips flagged grams at "
    "ingest.",
)
def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sh = D.word_shingles(d, n=BOILER_N, carry=("source",))
    nd = sh.groupBy("source").agg(F.countDistinct("doc_id").alias("n_docs"))
    df = sh.groupBy("source", "shingle").agg(F.count(F.lit(1)).alias("df"))
    return (
        df.join(F.broadcast(nd), "source")
        .filter(F.col("df") * 100 >= BOILER_PCT * F.col("n_docs"))
        .select("source", "shingle", "df", "n_docs")
    )


@query(
    "q_dedup_canonical",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES},
    pc AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT d1, d2 FROM (
        SELECT d1, d2, (20000 * common + (sa.n + sb.n - common))
               // (2 * (sa.n + sb.n - common)) AS j
        FROM pc JOIN sizes sa ON sa.doc_id = d1 JOIN sizes sb ON sb.doc_id = d2
      ) WHERE j >= {JACCARD_T_E4}
    ),
    edges AS (
      SELECT d1 AS a, d2 AS b FROM pairs
      UNION SELECT d2, d1 FROM pairs
    ),
    reach(node, comp) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.node
    ),
    comp AS (SELECT node, min(comp) AS cluster_id FROM reach GROUP BY node),
    qraw AS (
      SELECT doc_id, len(ws) AS n_tokens,
             len(list_filter(ws, w -> w IN ('the','a','of','and','is'))) AS stop_hits,
             CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS sum_len
      FROM (SELECT doc_id, list_filter(string_split(text, ' '), w -> w != '') AS ws
            FROM documents)
    ),
    quality AS (
      -- pure-BIGINT round_half_up quality (q_corpus_datacard recipe): no
      -- float ever reaches either engine, so no round-tie / 1-ulp drift
      -- across DuckDB builds.
      SELECT doc_id,
             (2 * (5000 * stop_hits * (n_tokens + abs(sum_len - 5 * n_tokens))
                   + 5000 * n_tokens * n_tokens)
              + n_tokens * (n_tokens + abs(sum_len - 5 * n_tokens)))
             // (2 * n_tokens * (n_tokens + abs(sum_len - 5 * n_tokens))) AS q_e4
      FROM qraw
    ),
    ranked AS (
      SELECT c.cluster_id, c.node AS doc_id, q.q_e4,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY q.q_e4 DESC, c.node) AS rn,
             count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
      FROM comp c JOIN quality q ON q.doc_id = c.node
    )
    SELECT cluster_id, doc_id AS rep_doc_id, cluster_size, q_e4 AS rep_quality_e4
    FROM ranked WHERE rn = 1
    """,
    doc="Cluster-representative selection (canonical dedup): each near-dup "
    "cluster keeps its highest-quality member (integer ten-thousandths "
    "score, doc_id tiebreak) instead of q_dedup_clusters' min-id survivor — "
    "what a training pipeline actually wants from dedup: drop copies, keep "
    "the best copy. Composition of the existing pieces: connected "
    "components over Jaccard pairs, per-doc quality scoring, one ranked "
    "window per cluster.",
)
def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from hnarchive_spark.operators.components import connected_components

    d = load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(D.word_shingles(d), JACCARD_T)
    comps = connected_components(pairs)
    ws = T.tokens(F.col("text"))
    quality = d.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_tokens"),
        T.stopword_hits(F.col("text"), T.EN_STOPWORDS).cast("long").alias("stop_hits"),
        T.sum_token_len(F.col("text")).alias("sum_len"),
    ).select("doc_id", T.quality_e4_int().alias("q_e4"))
    w = Window.partitionBy("cluster_id").orderBy(F.col("q_e4").desc(), F.col("doc_id"))
    ranked = (
        comps.select(F.col("comp").alias("cluster_id"), F.col("node").alias("doc_id"))
        .join(quality, "doc_id")
        .select(
            "cluster_id",
            "doc_id",
            "q_e4",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")).alias("cluster_size"),
        )
    )
    return ranked.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("rep_doc_id"),
        "cluster_size",
        F.col("q_e4").alias("rep_quality_e4"),
    )


@query(
    "q_dedup_incremental",
    oracle=f"""
    WITH {_SHINGLES_RAW},
    keep AS (
      SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {NGRAM_MAX_DF}
    ),
    shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
    sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
    cs AS (SELECT doc_id, shingle FROM shf WHERE doc_id % 2 = 0),
    bs AS (SELECT doc_id, shingle FROM shf WHERE doc_id % 2 = 1),
    pc AS (
      SELECT b.doc_id AS bd, c.doc_id AS cd, count(*) AS common
      FROM bs b JOIN cs c ON b.shingle = c.shingle
      GROUP BY 1, 2
    ),
    dup AS (
      SELECT bd, cd FROM (
        SELECT bd, cd, (20000 * common + (sb.n + sc.n - common))
               // (2 * (sb.n + sc.n - common)) AS j
        FROM pc JOIN sizes sb ON sb.doc_id = bd JOIN sizes sc ON sc.doc_id = cd
      ) WHERE j >= {JACCARD_T_E4}
    )
    SELECT bd AS doc_id, count(*) AS n_corpus_dups
    FROM dup GROUP BY bd
    """,
    doc="Incremental dedup (daily-increment vs archive): the incoming batch "
    "(odd doc_ids here; in production the new partition) is checked for "
    "near-duplicates against the existing corpus (even doc_ids) ONLY — the "
    "inverted-index shingle join is batch x corpus, never corpus x corpus, "
    "so each increment costs O(batch) lookups into the shingle index "
    "instead of re-deduplicating the archive. Same 3-gram Jaccard "
    f"semantics and max_df={NGRAM_MAX_DF} stop-shingle cap as "
    "q_dedup_ngram_maxdf (post-cap sizes), bounding every shingle's "
    "posting-list contribution even when the archive itself carries mass "
    "duplication. Emits each flagged batch doc with its corpus-match "
    "count (integers only).",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sh = D.word_shingles(d)
    keep = sh.groupBy("shingle").count().filter(F.col("count") <= NGRAM_MAX_DF)
    sh = sh.join(keep.select("shingle"), "shingle").persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    cs = sh.filter(F.col("doc_id") % 2 == 0).withColumnRenamed("doc_id", "cd")
    bs = sh.filter(F.col("doc_id") % 2 == 1).withColumnRenamed("doc_id", "bd")
    common = (
        bs.join(cs, "shingle")
        .groupBy("bd", "cd")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    j = (
        common.join(sizes.withColumnRenamed("doc_id", "bd").withColumnRenamed("n", "nb"), "bd")
        .join(sizes.withColumnRenamed("doc_id", "cd").withColumnRenamed("n", "nc"), "cd")
        .filter(
            F.expr(
                "(20000 * common + (nb + nc - common))"
                " div (2 * (nb + nc - common))"
            )
            >= JACCARD_T_E4
        )
    )
    return j.groupBy(F.col("bd").alias("doc_id")).agg(F.count(F.lit(1)).alias("n_corpus_dups"))


SPLIT_VAL_PCT = 5  # deterministic hash split: 90/5/5 train/val/test
SPLIT_TEST_PCT = 5


@query(
    "q_split_train_eval",
    oracle=f"""
    WITH b AS (
      SELECT source,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
      FROM documents
    ),
    s AS (
      SELECT source,
             CASE WHEN bucket < {SPLIT_TEST_PCT} THEN 'test'
                  WHEN bucket < {SPLIT_TEST_PCT + SPLIT_VAL_PCT} THEN 'val'
                  ELSE 'train' END AS split
      FROM b
    )
    SELECT source, split, count(*) AS n_docs
    FROM s GROUP BY source, split
    """,
    doc="Deterministic train/val/test assignment (90/5/5): the split is a "
    "pure function of doc_id (md5 bucket mod 100), so it is stable across "
    "runs, machines, and data shuffles — re-ingesting a doc can never move "
    "it between splits (the leakage guard every training pipeline needs; "
    "same keyed-hash idiom as q_sample_hash and the contamination split). "
    "Zero-shuffle assignment; one partial-agg shuffle for the per-source "
    "split counts.",
)
def q_split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    split = (
        F.when(bucket < SPLIT_TEST_PCT, "test")
        .when(bucket < SPLIT_TEST_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("train")
    )
    return (
        d.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


N_SHARDS = 8  # output shards per source
RESERVOIR_K = 16  # fixed-size per-source sample


@query(
    "q_shard_assignment",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id,
             len(list_filter(string_split(text, ' '), w -> w != '')) AS n_tokens
      FROM documents
    ),
    assigned AS (
      SELECT source, n_tokens,
             (row_number() OVER (PARTITION BY source
                                 ORDER BY n_tokens DESC, doc_id) - 1)
               % {N_SHARDS} AS shard_id
      FROM t
    )
    SELECT source, shard_id, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
    FROM assigned GROUP BY source, shard_id
    """,
    doc=f"Balanced training-shard assignment: per source, documents are "
    f"dealt round-robin across {N_SHARDS} shards in descending token order "
    "(longest-processing-time heuristic — consecutive big docs land on "
    "different shards, so shard token totals stay within one doc of each "
    "other), emitting the per-shard audit (doc count, token sum) a shard "
    "writer publishes. The window is partitioned by source, so the sort "
    "distributes across sources; one further partial-agg shuffle produces "
    "the audit rows. Deterministic: re-running assigns every doc the same "
    "shard.",
)
def q_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    rows = d.select(
        "source", "doc_id", F.size(T.tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    return (
        shard_assign(rows, N_SHARDS)
        .groupBy("source", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
        )
    )


def shard_assign(rows: DataFrame, n_shards: int) -> DataFrame:
    """The round-robin LPT shard assignment — per source, deal documents
    across shards in descending token order.  ONE definition shared by
    q_shard_assignment (which aggregates it into the audit) and the
    release run (plans/release.py, which writes per-doc shard ids), so
    the manifest's shard audit is definitionally the registered query's
    assignment (review r16: previously two verbatim copies)."""
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.col("n_tokens").desc(), "doc_id")
    return rows.select(
        "source",
        "doc_id",
        "n_tokens",
        ((F.row_number().over(w) - 1) % n_shards).alias("shard_id"),
    )


def temperature_sample(docs: DataFrame) -> DataFrame:
    """q_mix_temperature's alpha=0.5 acceptance — per-lang rate
    (n_min/n_s)^0.5 applied via the deterministic doc_id hash — over
    whatever rows ``docs`` carries (needs doc_id + lang; extra columns
    pass through, plus rate_e6).  ONE definition shared by the
    registered query and the release run's mix stage (review r16)."""
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    min_n = counts.agg(F.min("n").alias("m"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        "lang",
        F.round(F.sqrt(F.col("m").cast("double") / F.col("n")) * 1_000_000, 0)
        .cast("long")
        .alias("rate_e6"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 1_000_000
    )
    return docs.join(F.broadcast(rates), "lang").filter(bucket < F.col("rate_e6"))


@query(
    "q_reservoir_per_source",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT source, doc_id, rk FROM ranked WHERE rk <= {RESERVOIR_K}
    """,
    doc=f"Fixed-SIZE per-group sampling (the deterministic reservoir): "
    f"exactly {RESERVOIR_K} documents per source, chosen by md5(doc_id) "
    "order — a pseudo-uniform draw that is a pure function of the key, so "
    "re-ingestion or repartitioning can never change the sample (the "
    "fixed-COUNT complement of q_stratified_sample's fixed-RATE split; "
    "what an eval-set builder or human-review queue needs). Scale shape: "
    "an Arrow mapInPandas pre-filter keeps the k smallest hashes per "
    f"source WITHIN each input partition (<= {RESERVOIR_K} rows/source/"
    "partition leave the scan — any global winner is also a within-"
    "partition winner, so no candidate is ever lost), and only those "
    "survivors reach the per-source rank window — the shuffle carries "
    "k * n_partitions rows, never the corpus. The filter's survivors "
    "depend on partitioning but the RESULT does not: the final re-rank "
    "sees every global top-k row regardless of layout.",
)
def q_reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    base = d.select(
        "source", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    k = RESERVOIR_K

    def _partition_topk(batches):
        """Per input partition: k smallest (h, doc_id) rows per source.

        Accumulates across Arrow batches, pruning to k per source after
        each batch so executor-side state stays O(k * n_sources) regardless
        of partition size."""
        import pandas as pd

        acc = None
        for pdf in batches:
            cur = pdf if acc is None else pd.concat([acc, pdf])
            acc = (
                cur.sort_values(["source", "h", "doc_id"], kind="mergesort")
                .groupby("source", sort=False)
                .head(k)
            )
        if acc is not None and len(acc):
            yield acc

    pre = base.mapInPandas(_partition_topk, schema=base.schema)
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        pre.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= k)
    )


SELECT_TOKEN_BUDGET = 500  # per-source token budget — binds at both test scales (~35% of docs selected)


@query(
    "q_select_token_budget",
    # q_e4 is the pure-BIGINT round_half_up((stop_hits/n + n/d) * 5000 * ...)
    # recipe proven in q_corpus_datacard — no float reaches either engine, so
    # the score is immune to round-tie / 1-ulp division drift across DuckDB
    # builds.  cum_tokens is CAST because DuckDB windowed sum() over BIGINT
    # returns HUGEINT (int128) and the driver value-hash is type-sensitive.
    oracle=f"""
    WITH raw AS (
      SELECT doc_id, source, len(ws) AS n_tokens,
             len(list_filter(ws, w -> w IN ('the','a','of','and','is'))) AS stop_hits,
             CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS sum_len
      FROM (SELECT doc_id, source,
                   list_filter(string_split(text, ' '), w -> w != '') AS ws
            FROM documents)
    ),
    q AS (
      SELECT doc_id, source, n_tokens,
             (2 * (5000 * stop_hits * (n_tokens + abs(sum_len - 5 * n_tokens))
                   + 5000 * n_tokens * n_tokens)
              + n_tokens * (n_tokens + abs(sum_len - 5 * n_tokens)))
             // (2 * n_tokens * (n_tokens + abs(sum_len - 5 * n_tokens))) AS q_e4
      FROM raw
    ),
    ranked AS (
      SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY source
                                         ORDER BY q_e4 DESC, doc_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM q
    )
    SELECT source, doc_id, n_tokens, q_e4, cum_tokens
    FROM ranked WHERE cum_tokens <= {SELECT_TOKEN_BUDGET}
    """,
    doc=f"Data selection under a token budget: per source, take documents in "
    "descending quality order (integer ten-thousandths score, doc_id "
    f"tiebreak) until the running token total exceeds {SELECT_TOKEN_BUDGET} "
    "— the greedy quality-first corpus selection step of a budgeted "
    "training run. The running sum routes through operators/rankselect.py "
    "grouped_prefix_sum: local cumsums per (source, quality-range bucket) "
    "run in parallel and a metadata-sized bucket prefix shift makes them "
    "global — no per-source ordered window ever scans fact rows. All "
    "integers, so both engines agree bit-for-bit.",
)
def q_select_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:

    d = load(spark, sf_dir, "documents")
    ws = T.tokens(F.col("text"))
    q = d.select(
        "doc_id",
        "source",
        F.size(ws).cast("long").alias("n_tokens"),
        T.stopword_hits(F.col("text"), T.EN_STOPWORDS).cast("long").alias("stop_hits"),
        T.sum_token_len(F.col("text")).alias("sum_len"),
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        T.quality_e4_int().alias("q_e4"),
    )
    # scalable running sum: per-(source, q_e4-range-bucket) local cumsums in
    # parallel + a metadata-sized bucket prefix shift — NOT a per-source
    # ordered window over fact rows (20 sources at 100 TB = 20 hot tasks)
    from hnarchive_spark.operators.rankselect import grouped_prefix_sum

    cum = grouped_prefix_sum(
        q, "source", "q_e4", "doc_id", "n_tokens", descending=True, bucket_width=256
    )
    return (
        cum.select(
            "source", "doc_id", "n_tokens", "q_e4", F.col("cum").alias("cum_tokens")
        )
        .filter(F.col("cum_tokens") <= SELECT_TOKEN_BUDGET)
    )


SEG_TOKENS = 16


@query(
    "q_paragraph_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w != '') AS ws
      FROM documents
    ),
    segs AS (
      SELECT doc_id,
             unnest(range(0, (len(ws) + {SEG_TOKENS} - 1) // {SEG_TOKENS})) AS seg_id,
             unnest(list_transform(range(0, (len(ws) + {SEG_TOKENS} - 1) // {SEG_TOKENS}),
               c -> len(ws[c * {SEG_TOKENS} + 1 : least((c + 1) * {SEG_TOKENS}, len(ws))]))) AS n_tokens,
             unnest(list_transform(range(0, (len(ws) + {SEG_TOKENS} - 1) // {SEG_TOKENS}),
               c -> md5(array_to_string(ws[c * {SEG_TOKENS} + 1 : least((c + 1) * {SEG_TOKENS}, len(ws))], ' ')))) AS fp
      FROM toks WHERE len(ws) > 0
    ),
    marked AS (
      SELECT doc_id, n_tokens,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id, seg_id) AS rn
      FROM segs
    )
    SELECT doc_id,
           count(*) AS n_segs,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segs,
           CAST(coalesce(sum(CASE WHEN rn > 1 THEN n_tokens ELSE 0 END), 0) AS BIGINT) AS dup_tokens
    FROM marked GROUP BY doc_id
    """,
    doc=f"Paragraph-level exact dedup (the C4/CCNet within-corpus repeated-"
    f"paragraph filter, on fixed {SEG_TOKENS}-token segments since the "
    "synthetic corpus has no newline structure): every segment is hashed, "
    "the globally FIRST occurrence (smallest (doc_id, seg_id)) survives, "
    "and later copies anywhere in the corpus — including within the same "
    "document — are dropped. Output is the per-document audit (segment "
    "count, duplicated-segment count, duplicated tokens) a cleaning "
    "pipeline reports. One shuffle on the 128-bit segment hash; segment "
    "construction is pure array expressions (zero shuffle, explode at the "
    "end, empty docs guarded like q_chunk_documents). At 100 TB the hash "
    "key is uniform so no skew, and the window is replaceable by a "
    "groupBy-min + join-back if a single fp ever grew pathological.",
)
def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    ws = T.tokens(F.col("text"))
    n_segs = F.ceil(F.size(F.col("ws")) / SEG_TOKENS).cast("int")
    seg = lambda c: F.slice(F.col("ws"), c * SEG_TOKENS + 1, SEG_TOKENS)  # noqa: E731
    segs = (
        d.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") > 0)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_segs - 1),
                    lambda c: F.struct(
                        c.cast("long").alias("seg_id"),
                        F.size(seg(c)).cast("long").alias("n_tokens"),
                        F.md5(F.concat_ws(" ", seg(c))).alias("fp"),
                    ),
                )
            ).alias("s"),
        )
        .select("doc_id", "s.seg_id", "s.n_tokens", "s.fp")
    )
    w = Window.partitionBy("fp").orderBy("doc_id", "seg_id")
    marked = segs.select("doc_id", "n_tokens", F.row_number().over(w).alias("rn"))
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_dup_segs"),
        F.sum(F.when(F.col("rn") > 1, F.col("n_tokens")).otherwise(0)).alias("dup_tokens"),
    )


MIX_ALPHA = 0.5  # temperature exponent: sampled share of source s ~ n_s^alpha


@query(
    "q_mix_temperature",
    oracle="""
    WITH counts AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ),
    rates AS (
      -- acceptance a_s = (n_min / n_s)^(1 - alpha); with alpha = 0.5 that is
      -- sqrt(n_min/n_s): one exactly-rounded division + one exactly-rounded
      -- sqrt, so the double is bit-identical across engines (no order-
      -- dependent summation anywhere).
      SELECT lang,
             CAST(round(sqrt((SELECT min(n) FROM counts)::DOUBLE / n) * 1000000)
                  AS BIGINT) AS rate_e6
      FROM counts
    )
    SELECT d.doc_id, d.lang, r.rate_e6
    FROM documents d JOIN rates r USING (lang)
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
          < r.rate_e6
    """,
    doc="Temperature-based mixture sampling (the multilingual alpha-sampling "
    "of mT5/XLM-R: sampled share of language s proportional to n_s^alpha, "
    "alpha=0.5): per-language acceptance rate (n_min/n_s)^(1-alpha) applied "
    "via the deterministic doc_id hash — the tunable middle ground between "
    "q_mix_equalize (alpha=0, full equalization) and no resampling "
    "(alpha=1). The rate is one exactly-rounded division plus one exactly-"
    "rounded sqrt (IEEE-identical on both engines, no order-dependent "
    "float summation), emitted e6-scaled BIGINT. Same scale shape as "
    "equalize: a few-row counts aggregate broadcasts into the filter, zero "
    "extra corpus shuffle.",
)
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return temperature_sample(d).select("doc_id", "lang", "rate_e6")


CONTAIN_T = 0.6
CONTAIN_T_E4 = int(round(CONTAIN_T * 10000))


@query(
    "q_containment_dup",
    oracle=f"""
    WITH {_SHINGLES},
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairsizes AS (
      SELECT d1, d2, common, sa.n AS n1, sb.n AS n2
      FROM pairs JOIN sizes sa ON sa.doc_id = d1 JOIN sizes sb ON sb.doc_id = d2
    ),
    directed AS (
      SELECT d1 AS src, d2 AS dst,
             (20000 * common + n1) // (2 * n1) AS containment_e4 FROM pairsizes
      UNION ALL
      SELECT d2, d1, (20000 * common + n2) // (2 * n2) FROM pairsizes
    )
    SELECT src, dst, containment_e4 FROM directed
    WHERE containment_e4 >= {CONTAIN_T_E4}
    """,
    doc=f"Asymmetric containment dedup (shingle containment "
    f">= {CONTAIN_T}): C(src in dst) = |common shingles| / |src shingles| "
    "as round-half-up e4 BIGINT — the subset/quote detector Jaccard "
    "misses (a short doc embedded in a long one has low Jaccard but "
    "containment ~1 from the short side; the C4-era 'contained "
    "duplicate' filter). ONE inverted-index self-join computes each "
    "unordered pair's intersection; both directed containments project "
    "from that row, so asymmetry costs no extra shuffle. Same max_df "
    "skew guard available as q_dedup_ngram_maxdf.",
)
def q_containment_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return D.containment_pairs(D.word_shingles(d), CONTAIN_T)


def _minhash_accuracy_oracle() -> str:
    return _minhash_prefix() + f"""
    est AS (
      SELECT c.d1, c.d2,
             sum(CASE WHEN x.sig = y.sig THEN 1 ELSE 0 END) AS m
      FROM cands c
      JOIN sigs x ON x.doc_id = c.d1
      JOIN sigs y ON y.doc_id = c.d2 AND y.j = x.j
      GROUP BY c.d1, c.d2
    ),
    common AS (
      SELECT c.d1, c.d2, count(*) AS common
      FROM cands c
      JOIN sh a ON a.doc_id = c.d1
      JOIN sh b ON b.doc_id = c.d2 AND b.shingle = a.shingle
      GROUP BY c.d1, c.d2
    ),
    exact AS (
      SELECT d1, d2, (20000 * common + (sa.n + sb.n - common))
               // (2 * (sa.n + sb.n - common)) AS jaccard_e4
      FROM common
      JOIN sizes sa ON sa.doc_id = d1
      JOIN sizes sb ON sb.doc_id = d2
    )
    SELECT e.d1, e.d2,
           CAST((20000 * e.m + {D.MH_K}) // (2 * {D.MH_K}) AS BIGINT) AS est_e4,
           coalesce(x.jaccard_e4, 0) AS jaccard_e4
    FROM est e LEFT JOIN exact x ON x.d1 = e.d1 AND x.d2 = e.d2
    """


@query(
    "q_minhash_accuracy",
    oracle=_minhash_accuracy_oracle(),
    doc=f"Sketch-accuracy harness: every MinHash-LSH candidate pair with "
    "its signature-based Jaccard ESTIMATE (matching components / "
    f"{D.MH_K}, e4 integer) NEXT TO the exact inverted-index jaccard_e4 "
    "— the measurement that justifies (or indicts) the sketch parameters "
    "before anyone trusts the estimate at 100 TB, where only the sketch "
    "is affordable corpus-wide. Estimate: one wide K-column equality "
    "projection per candidate (no per-component explode); exact side "
    "restricted to candidates; band-collision-only pairs keep "
    "jaccard_e4 = 0 via left join. All integers on both engines.",
)
def q_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return D.minhash_estimate_vs_exact(D.word_shingles(d))


KFOLD_K = 5


@query(
    "q_group_kfold",
    oracle=f"""
    WITH f AS (
      SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % {KFOLD_K} AS fold,
             user_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT fold, count(DISTINCT user_id) AS n_users, count(*) AS n_events,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM f GROUP BY fold
    """,
    doc=f"Group {KFOLD_K}-fold cross-validation assignment: the fold is a "
    "pure function of the GROUP key (md5(user_id) bucket), so every event "
    "of a user lands in the same fold by construction — the structural "
    "guarantee that eliminates group leakage between CV train/test splits "
    "(row-hash folds would scatter one user across folds and leak). Same "
    "keyed-hash idiom as q_split_train_eval; zero-shuffle assignment, one "
    "partial-agg shuffle for the fold audit (user/event/value balance per "
    "fold).",
)
def q_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    fold = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % KFOLD_K
    )
    return (
        e.select(
            fold.alias("fold"),
            "user_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("fold")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
    )


EMBARGO_SPLIT_TS = "2024-01-20 00:00:00"
EMBARGO_DAYS = 2


@query(
    "q_time_split_embargo",
    oracle=f"""
    WITH s AS (
      SELECT CASE
               WHEN ts < TIMESTAMP '{EMBARGO_SPLIT_TS}' THEN 'train'
               WHEN ts < TIMESTAMP '{EMBARGO_SPLIT_TS}'
                         + INTERVAL {EMBARGO_DAYS} DAY THEN 'embargo'
               ELSE 'test'
             END AS split,
             user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT split, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
           epoch_us(min(ts)) AS min_ts_us, epoch_us(max(ts)) AS max_ts_us,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM s GROUP BY split
    """,
    doc=f"Temporal train/test split with an {EMBARGO_DAYS}-day embargo: "
    "events strictly before the split timestamp train, events inside the "
    "embargo window are EXCLUDED from both sides, the rest test — the "
    "leakage-safe evaluation protocol for any model whose features "
    "aggregate trailing windows (a trailing-7d feature computed at "
    "test-start would otherwise read post-split training rows; purged "
    "walk-forward CV uses exactly this shape). Pure predicate split, "
    "zero shuffle; one partial-agg audit per side with the time "
    "boundaries emitted as epoch microseconds so the no-overlap "
    "invariant is hash-checked.",
)
def q_time_split_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    split_ts = F.lit(EMBARGO_SPLIT_TS).cast("timestamp")
    split = (
        F.when(F.col("ts") < split_ts, "train")
        .when(F.col("ts") < split_ts + F.expr(f"INTERVAL {EMBARGO_DAYS} DAY"), "embargo")
        .otherwise("test")
    )
    return (
        e.select(
            split.alias("split"),
            "user_id",
            "ts",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.unix_micros(F.min("ts")).alias("min_ts_us"),
            F.unix_micros(F.max("ts")).alias("max_ts_us"),
            F.sum("cents").alias("sum_cents"),
        )
    )


SUBSTR_L = 20  # minimum duplicated-span length in characters


def _substr_dup_positions(spark: SparkSession, sf_dir: str):
    """Shared gram pipeline for the substring-dedup family: returns
    (docs, duplicated_positions) where the positions carry the gram's
    OWNER (global min doc_id).  ONE pass over the grams: a single window
    over the 64-bit gram hash yields both the >=2-distinct-docs flag
    (min(doc) != max(doc)) and the owner (min(doc)) — the r12 bake-off
    measured this 2.8x faster end-to-end than the groupBy + semi-join
    form, which walks the explode+md5 stream twice.  Skew note: a
    boilerplate gram present in every doc makes one window group of
    corpus size (WindowExec spills, but it is a hot partition); the
    rejected two-pass form shared the same hot key at its semi-join
    exchange, so the window costs nothing extra in the worst case and
    half the passes in the common one.  The explicit-count repartition
    is load-bearing: gram extraction fans out ~15x in ROWS at constant
    input BYTES, so both the scan planner (splits by input size) and AQE
    coalescing (merges by post-shuffle size) under-provision it — a
    plain repartition(doc_id) got coalesced back to one partition and
    ran the whole corpus's md5 on one core (6x slower, measured r12).
    At 100 TB the same effect is better had by lowering
    files.maxPartitionBytes so the SCAN itself yields CPU-sized splits
    and the shuffle disappears."""
    from pyspark.sql import Window

    L = SUBSTR_L
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.length("text") >= L)
        .repartition(n_part, "doc_id")
    )
    pos = d.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(1), F.length("text") - L + 1)).alias("p"),
    ).select(
        "doc_id",
        "p",
        F.substring(F.md5(F.col("text").substr(F.col("p"), F.lit(L))), 1, 16).alias("h"),
    )
    wh = Window.partitionBy("h")
    dph = (
        pos.select(
            "doc_id",
            "p",
            F.min("doc_id").over(wh).alias("own"),
            F.max("doc_id").over(wh).alias("mx"),
        )
        .filter(F.col("own") != F.col("mx"))
        .select("doc_id", "p", "own")
    )
    return d, dph


@query(
    "q_substring_dedup",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, p, substr(md5(substr(text, p, {SUBSTR_L})), 1, 16) AS h
      FROM documents,
           LATERAL (SELECT unnest(generate_series(1, length(text) - {SUBSTR_L} + 1)) AS p)
      WHERE length(text) >= {SUBSTR_L}
    ),
    dup AS (SELECT h FROM pos GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
    dpos AS (SELECT doc_id, p FROM pos SEMI JOIN dup USING (h)),
    isl AS (
      SELECT doc_id, p,
             CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= {SUBSTR_L}
                  THEN 0 ELSE 1 END AS brk
      FROM dpos
    ),
    sp AS (
      SELECT doc_id, p, sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS island
      FROM isl
    ),
    spans AS (
      SELECT doc_id, island, min(p) AS s, max(p) + {SUBSTR_L} - 1 AS e
      FROM sp GROUP BY doc_id, island
    ),
    perdoc AS (
      SELECT doc_id, count(*) AS n_spans,
             CAST(sum(e - s + 1) AS BIGINT) AS dup_chars,
             CAST(max(e - s + 1) AS BIGINT) AS longest_span
      FROM spans GROUP BY doc_id
    )
    SELECT doc_id, n_spans, dup_chars, longest_span,
           (1000000 * dup_chars) // length(text) AS dup_frac_e6
    FROM perdoc JOIN documents USING (doc_id)
    """,
    doc=f"Exact substring dedup (the Lee et al. 2022 'Deduplicating Training "
    f"Data Makes Language Models Better' span form, re-expressed for a "
    f"shuffle engine): every duplicated character span of length >= "
    f"{SUBSTR_L} shared verbatim by >= 2 docs is found and merged into "
    "MAXIMAL per-doc spans, reported per doc as span count, duplicated "
    "chars, longest span, and the integer-e6 duplicated fraction — the "
    "remove/keep decision a training pipeline makes per span. Algorithm: "
    "explode each doc into its overlapping char-grams keyed by md5-prefix "
    "(the distributed stand-in for a suffix array: a duplicated span of "
    f"length s >= {SUBSTR_L} is EXACTLY a run of s - {SUBSTR_L} + 1 "
    "consecutive duplicated grams, so gram-level duplication detection + "
    "interval merge reconstructs every maximal span with no false "
    "negatives), mark grams whose hash occurs in >= 2 distinct docs, semi-"
    "join the positions back, then gaps-and-islands per doc (a new island "
    f"when the position gap exceeds {SUBSTR_L}, i.e. the fixed-length "
    "intervals stop overlapping) and one aggregate per island then per "
    "doc. Scale: linear in corpus characters end to end, ONE pass over "
    "the grams — a single window over the 64-bit gram hash marks "
    "duplication as min(doc) != max(doc) (the oracle keeps the "
    "equivalent count-distinct + semi-join spec form; the r12 bake-off "
    "measured the one-pass window 2.8x faster end-to-end with identical "
    "rows, see _substr_dup_positions for the skew trade), then one "
    "window + aggregate chain partitioned by doc_id (Spark satisfies "
    "the (doc_id, island) clustering from the doc_id window exchange, "
    "so no extra shuffle); no pairwise doc join ever forms, unlike "
    "suffix-array sharding this needs no global sort, and the driver "
    "never sees data. The e6 fraction uses integer div with dup_chars "
    "<= doc length, so the accumulator is DOMAIN-bounded (max doc "
    "chars), volume-independent. The parallelism-forcing repartition "
    "story lives in _substr_dup_positions.",
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    L = SUBSTR_L
    d, dph = _substr_dup_positions(spark, sf_dir)
    dpos = dph.select("doc_id", "p")
    w = Window.partitionBy("doc_id").orderBy("p")
    isl = dpos.select(
        "doc_id",
        "p",
        F.when(F.col("p") - F.lag("p").over(w) <= L, F.lit(0)).otherwise(F.lit(1)).alias("brk"),
    )
    sp = isl.select("doc_id", "p", F.sum("brk").over(w).alias("island"))
    spans = sp.groupBy("doc_id", "island").agg(
        F.min("p").alias("s"), (F.max("p") + L - 1).alias("e")
    )
    span_chars = F.col("e") - F.col("s") + 1
    perdoc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(span_chars).cast("long").alias("dup_chars"),
        F.max(span_chars).cast("long").alias("longest_span"),
    )
    return perdoc.join(d, "doc_id").select(
        "doc_id",
        "n_spans",
        "dup_chars",
        "longest_span",
        F.expr("(1000000 * dup_chars) div length(text)").alias("dup_frac_e6"),
    )


@query(
    "q_substring_dedup_clean",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, p, substr(md5(substr(text, p, {SUBSTR_L})), 1, 16) AS h
      FROM documents,
           LATERAL (SELECT unnest(generate_series(1, length(text) - {SUBSTR_L} + 1)) AS p)
      WHERE length(text) >= {SUBSTR_L}
    ),
    dup AS (SELECT h FROM pos GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
    dph AS (SELECT doc_id, p, h FROM pos SEMI JOIN dup USING (h)),
    isl AS (
      SELECT doc_id, p, h,
             CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= {SUBSTR_L}
                  THEN 0 ELSE 1 END AS brk
      FROM dph
    ),
    sp AS (
      SELECT doc_id, p, h, sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS island
      FROM isl
    ),
    spans AS (
      SELECT doc_id, island, min(p) AS s, max(p) + {SUBSTR_L} - 1 AS e,
             min_by(h, p) AS h0
      FROM sp GROUP BY doc_id, island
    ),
    owners AS (SELECT h, min(doc_id) AS owner FROM dph GROUP BY h),
    rem AS (
      SELECT spans.doc_id, s, e
      FROM spans JOIN owners ON owners.h = spans.h0
      WHERE spans.doc_id != owners.owner
    ),
    gaps AS (
      SELECT doc_id,
             coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1 AS gs,
             s - 1 AS ge
      FROM rem
    ),
    tails AS (
      SELECT rem.doc_id, max(rem.e) + 1 AS gs, max(length(documents.text)) AS ge
      FROM rem JOIN documents USING (doc_id)
      GROUP BY rem.doc_id
    ),
    allseg AS (
      SELECT * FROM gaps WHERE ge >= gs
      UNION ALL
      SELECT * FROM tails WHERE ge >= gs
    ),
    segs AS (
      SELECT allseg.doc_id, gs, substr(documents.text, gs, ge - gs + 1) AS seg
      FROM allseg JOIN documents USING (doc_id)
    ),
    clean AS (
      SELECT doc_id, string_agg(seg, '' ORDER BY gs) AS clean_text
      FROM segs GROUP BY doc_id
    ),
    summary AS (
      SELECT doc_id, count(*) AS n_removed,
             CAST(sum(e - s + 1) AS BIGINT) AS removed_chars
      FROM rem GROUP BY doc_id
    )
    SELECT summary.doc_id, n_removed, removed_chars,
           CAST(length(documents.text) - removed_chars AS BIGINT) AS clean_chars,
           substr(md5(coalesce(clean_text, '')), 1, 16) AS clean_fp
    FROM summary
    JOIN documents USING (doc_id)
    LEFT JOIN clean USING (doc_id)
    """,
    doc="The TRANSFORM half of exact substring dedup (q_substring_dedup is "
    "the audit half): every maximal duplicated span is KEPT only in the "
    "owner doc — the min doc_id among docs containing the span's first "
    "gram, a deterministic global first-occurrence rule — and EXCISED "
    "everywhere else, the Lee et al. remove-all-but-one policy. Output is "
    "one row per modified doc: spans removed, chars removed, cleaned "
    "length, and the md5-prefix fingerprint of the cleaned text (the "
    "hash-checkable witness that both engines performed the identical "
    "string surgery, including docs whose text is removed entirely — "
    "fingerprint of the empty string). Cleaned text is rebuilt "
    "distributed: removed spans are disjoint and sorted per doc by "
    "construction (islands), so the kept segments are the lag-gaps plus "
    "the tail, sliced from the original text and reassembled with an "
    "order-aware concat — no driver-side strings ever. Scale: identical "
    "gram pipeline to q_substring_dedup (linear, no pairwise join), plus "
    "metadata-width shuffles over span rows only; the one corpus-width "
    "term is the final segment slice + per-doc concat, which shuffles "
    "each modified doc's segments once — O(modified corpus bytes), the "
    "output itself. The span table is localCheckpointed: it is tiny "
    "(spans, not grams) and feeds three consumers (gaps, tails, summary), "
    "which would otherwise re-run the gram pipeline three times. "
    "Honesty note (regression-locked in test_substring_dedup.py): one "
    "pass removes ~94% of duplicated (gram, doc) mass on the test "
    "corpus, not 100% — char-range excision with span-granular ownership "
    "has the same two artifacts as Lee et al.'s suffix-array cut (seam-"
    "minted grams; a span kept whole by its first-gram owner can shelter "
    "a later gram whose own owner excised elsewhere), and the owner-less "
    "leak is 0.17%; a second pass or gram-granular ownership trades "
    "determinism/cost for the remainder.",
)
def q_substring_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    L = SUBSTR_L
    d, dph = _substr_dup_positions(spark, sf_dir)
    # the h-window already attached each position's global owner, so the
    # span's deciding owner is just min_by over its positions — no owners
    # groupBy, no second join (the oracle keeps the spec form)
    w = Window.partitionBy("doc_id").orderBy("p")
    isl = dph.select(
        "doc_id",
        "p",
        "own",
        F.when(F.col("p") - F.lag("p").over(w) <= L, F.lit(0)).otherwise(F.lit(1)).alias("brk"),
    )
    sp = isl.select("doc_id", "p", "own", F.sum("brk").over(w).alias("island"))
    spans = sp.groupBy("doc_id", "island").agg(
        F.min("p").alias("s"),
        (F.max("p") + L - 1).alias("e"),
        F.min_by("own", "p").alias("owner0"),
    )
    # tiny (span rows); three consumers below would otherwise re-run the
    # gram pipeline three times
    rem = (
        spans.filter(F.col("doc_id") != F.col("owner0"))
        .select("doc_id", "s", "e")
        .localCheckpoint()
    )
    ws = Window.partitionBy("doc_id").orderBy("s")
    gaps = rem.select(
        "doc_id",
        (F.coalesce(F.lag("e").over(ws), F.lit(0)) + 1).alias("gs"),
        (F.col("s") - 1).alias("ge"),
    )
    tails = (
        rem.groupBy("doc_id")
        .agg((F.max("e") + 1).alias("gs"))
        .join(d, "doc_id")
        .select("doc_id", "gs", F.length("text").alias("ge"))
    )
    allseg = gaps.filter(F.col("ge") >= F.col("gs")).unionAll(
        tails.filter(F.col("ge") >= F.col("gs"))
    )
    segs = allseg.join(d, "doc_id").select(
        "doc_id",
        "gs",
        F.col("text").substr(F.col("gs"), F.col("ge") - F.col("gs") + 1).alias("seg"),
    )
    clean = segs.groupBy("doc_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("gs", "seg"))), lambda x: x["seg"]
            ),
        ).alias("clean_text")
    )
    summary = rem.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_removed"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("removed_chars"),
    )
    return (
        summary.join(d, "doc_id")
        .join(clean, "doc_id", "left")
        .select(
            "doc_id",
            "n_removed",
            "removed_chars",
            (F.length("text") - F.col("removed_chars")).cast("long").alias("clean_chars"),
            F.substring(F.md5(F.coalesce(F.col("clean_text"), F.lit(""))), 1, 16).alias("clean_fp"),
        )
    )


# shared by q_substring_dedup_incremental (inline form) and
# q_substring_dedup_indexed (probe against the persisted gram index):
# identical semantics, identical rows
_SUBSTR_INC_ORACLE = f"""
    WITH pos AS (
      SELECT doc_id, p, substr(md5(substr(text, p, {SUBSTR_L})), 1, 16) AS h
      FROM documents,
           LATERAL (SELECT unnest(generate_series(1, length(text) - {SUBSTR_L} + 1)) AS p)
      WHERE length(text) >= {SUBSTR_L}
    ),
    arch AS (SELECT DISTINCT h FROM pos WHERE doc_id % 2 = 0),
    bpos AS (SELECT doc_id, p, h FROM pos WHERE doc_id % 2 = 1),
    dpos AS (SELECT doc_id, p FROM bpos SEMI JOIN arch USING (h)),
    isl AS (
      SELECT doc_id, p,
             CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= {SUBSTR_L}
                  THEN 0 ELSE 1 END AS brk
      FROM dpos
    ),
    sp AS (
      SELECT doc_id, p, sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS island
      FROM isl
    ),
    spans AS (
      SELECT doc_id, island, min(p) AS s, max(p) + {SUBSTR_L} - 1 AS e
      FROM sp GROUP BY doc_id, island
    ),
    perdoc AS (
      SELECT doc_id, count(*) AS n_spans,
             CAST(sum(e - s + 1) AS BIGINT) AS dup_chars,
             CAST(max(e - s + 1) AS BIGINT) AS longest_span
      FROM spans GROUP BY doc_id
    )
    SELECT doc_id, n_spans, dup_chars, longest_span,
           (1000000 * dup_chars) // length(text) AS dup_frac_e6
    FROM perdoc JOIN documents USING (doc_id)
    """


@query(
    "q_substring_dedup_incremental",
    oracle=_SUBSTR_INC_ORACLE,
    doc="Incremental exact substring dedup (daily-increment vs archive): "
    "the incoming batch (odd doc_ids here; in production the new "
    "partition) is scanned for char spans that already exist VERBATIM in "
    "the archive (even doc_ids) — the batch's grams semi-join the "
    "archive's distinct gram-hash set, then the same island merge and "
    "per-doc span audit as q_substring_dedup. Each increment costs "
    "O(batch grams) lookups into the archive gram set, never "
    "corpus x corpus and never re-scanning the archive's own "
    "duplication; at 100 TB the distinct-gram set is the thing a "
    "production pipeline persists (the substring analog of the BM25 "
    "postings / IVF lists this repo versions), and its day-over-day "
    "growth is sublinear because dedup'd corpora share boilerplate. "
    "Oracle wait-free: batch-internal duplication is deliberately "
    "ignored (two new docs sharing a novel span are both admitted; the "
    "next day's archive catches them) — the standard incremental-dedup "
    "semantics, documented so the recall trade is explicit.",
)
def q_substring_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    L = SUBSTR_L
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.length("text") >= L)
        .repartition(n_part, "doc_id")
    )
    pos = d.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(1), F.length("text") - L + 1)).alias("p"),
    ).select(
        "doc_id",
        "p",
        F.substring(F.md5(F.col("text").substr(F.col("p"), F.lit(L))), 1, 16).alias("h"),
    )
    arch = pos.filter(F.col("doc_id") % 2 == 0).select("h").distinct()
    bpos = pos.filter(F.col("doc_id") % 2 == 1)
    dpos = bpos.join(arch, "h", "leftsemi").select("doc_id", "p")
    w = Window.partitionBy("doc_id").orderBy("p")
    isl = dpos.select(
        "doc_id",
        "p",
        F.when(F.col("p") - F.lag("p").over(w) <= L, F.lit(0)).otherwise(F.lit(1)).alias("brk"),
    )
    sp = isl.select("doc_id", "p", F.sum("brk").over(w).alias("island"))
    spans = sp.groupBy("doc_id", "island").agg(
        F.min("p").alias("s"), (F.max("p") + L - 1).alias("e")
    )
    span_chars = F.col("e") - F.col("s") + 1
    perdoc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(span_chars).cast("long").alias("dup_chars"),
        F.max(span_chars).cast("long").alias("longest_span"),
    )
    return perdoc.join(d, "doc_id").select(
        "doc_id",
        "n_spans",
        "dup_chars",
        "longest_span",
        F.expr("(1000000 * dup_chars) div length(text)").alias("dup_frac_e6"),
    )


@query(
    "q_substring_dedup_indexed",
    oracle=_SUBSTR_INC_ORACLE,
    doc="Incremental exact substring dedup against a PERSISTED gram index "
    "(sources/gram_index.py) — the production form of "
    "q_substring_dedup_incremental, which re-scans the whole archive's "
    "grams per increment (the substring-side twin of the per-query "
    "IVF-training / BM25-retokenize critique): the archive's DISTINCT "
    "gram-hash set is built ONCE, bucket-partitioned by md5-prefix, and "
    "each increment costs only its own gram pass plus a semi-join into "
    "the set. Appends are set-semantic (novel grams only, anti-join "
    "pruned to the batch's bucket partitions, idempotent with no "
    "on_conflict dial), compaction rewrites buckets at full file sizes "
    "behind the atomic _CURRENT pointer — the same lifecycle rails as "
    "the LSH/IVF/BM25 indexes. Rows equal the inline form's and the "
    "oracle is shared; the build-once cache means bench warmup pays the "
    "build and min-of-3 measures the probe.",
)
def q_substring_dedup_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnarchive_spark.scratch import built_once
    from hnarchive_spark.sources.gram_index import build_gram_index, probe_substring_spans

    d = load(spark, sf_dir, "documents")
    path = built_once(
        "gram_index",
        sf_dir,
        lambda p: build_gram_index(
            spark, d.filter(F.col("doc_id") % 2 == 0), p, l=SUBSTR_L
        ),
    )
    return probe_substring_spans(spark, d.filter(F.col("doc_id") % 2 == 1), path)
