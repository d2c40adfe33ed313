"""Web-corpus curation operators: URL/domain handling and importance
reweighting — the Common-Crawl-shaped slice of a training-data pipeline
that the inventory did not yet cover.

The testdata has no URL column, so a deterministic URL is DERIVED from
(doc_id, source) identically in both engines (the clustered-vector /
fixture-derivation precedent): ~1/5 of docs land on a long tail of
``assets<k>.net`` CDN domains and the rest on one hot ``<source>.com``
domain per source — a realistic hot-head/long-tail registrable-domain
distribution for the cap operator to bite on. The VALUE under test is
the parse + group + cap algebra, not the synthesis: every parse below
runs real regexp extraction over the URL string.

Scale notes per query live in the docstrings; the common theme: domain
ops shuffle metadata-width rows keyed by domain, and the per-domain cap
relies on rank-pushdown (WindowGroupLimit partial before the exchange)
so a billion-doc hot domain tops out at K rows per map task, not a
sorted billion-row partition.

All ratios follow the repo-wide exact-integer convention (floor-divided
e4 scaling with nonnegative numerators, so Spark ``div`` == DuckDB
``//``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hnarchive_spark.functions import text as T
from hnarchive_spark.plans.registry import query
from hnarchive_spark.tables import load

# --- derived-URL recipe (shared by every query here and its oracle) ------
# hot head: docs with doc_id % 5 != 0 -> https://www.<source>.com/<md5-12>
# long tail: doc_id % 5 == 0        -> https://cdn<k>.assets<k>.net/<md5-12>
# with k = doc_id % 97, so the tail spreads over 97 registrable domains.

_URL_SQL = """
      CASE WHEN doc_id % 5 = 0
           THEN 'https://cdn' || CAST(doc_id % 97 AS VARCHAR)
                || '.assets' || CAST(doc_id % 97 AS VARCHAR)
                || '.net/' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                || '?ref=' || source
           ELSE 'https://www.' || source || '.com/'
                || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                || '?ref=' || source
      END
"""

_HOST_RE = "^https?://([^/?]+)"
_PATH_RE = "^https?://[^/?]+(/[^?]*)"
# registrable domain = last two dot-labels of the host (public-suffix
# handling collapses to ".com"/".net" here; a real PSL lookup is a
# broadcast-joined suffix table — same plan shape, bigger dim).
_REG_RE = "([^.]+\\.[^.]+)$"


def _with_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    k = (F.col("doc_id") % 97).cast("string")
    path = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12)
    url = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(F.lit("https://cdn"), k, F.lit(".assets"), k, F.lit(".net/"), path, F.lit("?ref="), F.col("source")),
    ).otherwise(
        F.concat(F.lit("https://www."), F.col("source"), F.lit(".com/"), path, F.lit("?ref="), F.col("source"))
    )
    return d.withColumn("url", url)


def _domain_cols(df: DataFrame) -> DataFrame:
    host = F.regexp_extract(F.col("url"), _HOST_RE, 1)
    return df.withColumn("host", host).withColumn(
        "domain", F.regexp_extract(F.col("host"), _REG_RE, 1)
    )


_URL_CTE = f"""
    urls AS (
      SELECT doc_id, source, n_chars, text, {_URL_SQL} AS url FROM documents
    ),
    parsed AS (
      SELECT *, regexp_extract(url, '{_HOST_RE}', 1) AS host,
             regexp_extract(regexp_extract(url, '{_HOST_RE}', 1), '{_REG_RE}', 1) AS domain
      FROM urls
    )
"""


@query(
    "q_url_parse",
    oracle=f"""
    WITH {_URL_CTE}
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
           CAST(count(DISTINCT regexp_extract(url, '{_PATH_RE}', 1)) AS BIGINT) AS n_paths,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM parsed
    GROUP BY domain
    """,
    doc="URL parsing + per-registrable-domain profile: host/path/domain "
    "extracted from the URL string with JVM-side regexps (no UDF), then "
    "one partial+final aggregation keyed by domain. The shuffle carries "
    "one row per (partition, domain) — metadata-width at any corpus "
    "size. The registrable-domain rule here is last-two-labels; a real "
    "public-suffix list is a broadcast suffix-table join with the same "
    "plan shape.",
)
def q_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _domain_cols(_with_url(spark, sf_dir))
    return (
        d.withColumn("path", F.regexp_extract(F.col("url"), _PATH_RE, 1))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
            F.countDistinct("path").alias("n_paths"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# --- URL canonicalization dedup -------------------------------------------
# Raw-URL messiness recipe: documents in groups of 3 (g = doc_id div 3)
# target the SAME logical page, each rendered as a different raw variant
# keyed by doc_id % 3 — uppercase scheme/host + trailing slash + tracking
# query, bare host + fragment, or www + explicit default port.  The
# canonicalizer must collapse each group to ONE canonical URL.

_RAW_URL_SQL = """
      CASE doc_id % 3
        WHEN 0 THEN 'HTTP://WWW.SITE' || CAST((doc_id // 3) % 50 AS VARCHAR) || '.COM/'
                    || substr(md5(CAST(doc_id // 3 AS VARCHAR)), 1, 12)
                    || '/?utm_source=feed&ref=' || source
        WHEN 1 THEN 'https://site' || CAST((doc_id // 3) % 50 AS VARCHAR) || '.com/'
                    || substr(md5(CAST(doc_id // 3 AS VARCHAR)), 1, 12)
                    || '#section-2'
        ELSE 'https://www.site' || CAST((doc_id // 3) % 50 AS VARCHAR) || '.com:443/'
             || substr(md5(CAST(doc_id // 3 AS VARCHAR)), 1, 12)
      END
"""

# The canonicalization chain lives in functions/urls.py (shared with
# the streaming ingest gate's URL-dedup stage); re-exported here under
# the names this module's oracle generator and tests use.
from hnarchive_spark.functions.urls import (  # noqa: E402
    canonical_url as _canon_col,
    canonical_url_sql as _canon_sql,
)


@query(
    "q_url_dedup",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id, source, {_RAW_URL_SQL} AS url FROM documents
    ),
    canon AS (
      SELECT doc_id, {_canon_sql("url")} AS curl FROM raw
    ),
    grouped AS (
      SELECT doc_id, curl,
             CAST(count(*) OVER (PARTITION BY curl) AS BIGINT) AS n_dups,
             CAST(min(doc_id) OVER (PARTITION BY curl) AS BIGINT) AS survivor
      FROM canon
    )
    SELECT doc_id, substr(md5(curl), 1, 16) AS canon_fp, n_dups,
           CAST(CASE WHEN doc_id = survivor THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM grouped
    """,
    doc="URL-canonicalization dedup (the Common-Crawl refetch-collapse "
    "step): raw URLs that differ only in scheme case, host case, a "
    "www. prefix, an explicit default port, a tracking query string, a "
    "fragment, or a trailing slash collapse to ONE canonical form; docs "
    "sharing a canonical URL dedup with min-doc_id survivorship. The "
    "canonicalizer is a fixed chain of ANCHORED regexp_replace steps "
    "(replace-all vs replace-first coincide; no backreferences — the "
    "two engines' replacement syntaxes differ) over the scheme/host-"
    "lowercased URL. Plan: one codegen projection per doc, then one "
    "canonical-URL exchange for the count/min windows — metadata-width; "
    "at 100 TB this is the cheapest dedup family (no shingles, no "
    "signatures, key length ~60 bytes).",
)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    g = F.expr("doc_id div 3").cast("string")
    site = F.expr("(doc_id div 3) % 50").cast("string")
    p = F.substring(F.md5(g), 1, 12)
    raw = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("HTTP://WWW.SITE"), site, F.lit(".COM/"), p,
                F.lit("/?utm_source=feed&ref="), F.col("source"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("https://site"), site, F.lit(".com/"), p,
                F.lit("#section-2"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://www.site"), site, F.lit(".com:443/"), p
            )
        )
    )
    canon = d.select("doc_id", _canon_col(raw).alias("curl"))
    w = Window.partitionBy("curl")
    return canon.select(
        "doc_id",
        F.substring(F.md5("curl"), 1, 16).alias("canon_fp"),
        F.count(F.lit(1)).over(w).alias("n_dups"),
        F.when(
            F.col("doc_id") == F.min("doc_id").over(w), 1
        ).otherwise(0).cast("long").alias("keep"),
    )


DOMAIN_CAP_K = 20


@query(
    "q_domain_cap",
    oracle=f"""
    WITH {_URL_CTE},
    ranked AS (
      SELECT doc_id, domain, n_chars,
             row_number() OVER (PARTITION BY domain
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM parsed
    )
    SELECT doc_id, domain, n_chars, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {DOMAIN_CAP_K}
    """,
    doc="Per-domain document cap (the Common-Crawl 'no domain dominates "
    "the corpus' rule): keep the top-K docs per registrable domain by "
    "(n_chars DESC, doc_id). The rank<=K filter sits directly on the "
    "row_number window, so Spark plans a WindowGroupLimit PARTIAL before "
    "the domain exchange — each map task forwards at most K rows per "
    "domain it sees, and a billion-doc hot domain costs the reduce side "
    "K rows per upstream task, never a full sorted partition "
    "(plan-locked in tests/test_plan_hygiene.py).",
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _domain_cols(_with_url(spark, sf_dir))
    w = Window.partitionBy("domain").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        d.select("doc_id", "domain", "n_chars")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= DOMAIN_CAP_K)
    )


@query(
    "q_domain_stats",
    oracle=f"""
    WITH {_URL_CTE},
    per_dom AS (
      SELECT domain, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM parsed GROUP BY domain
    ),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM per_dom)
    SELECT domain,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(least(n_docs, {DOMAIN_CAP_K}) AS BIGINT) AS n_kept,
           CAST(greatest(n_docs - {DOMAIN_CAP_K}, 0) AS BIGINT) AS n_dropped,
           sum_chars,
           CAST((n_docs * 10000) // total AS BIGINT) AS share_e4
    FROM per_dom, tot
    """,
    doc="Per-domain cap audit: document counts, kept/dropped under the "
    "K-cap, and each domain's corpus share as a floor-divided e4 "
    "integer. One metadata-width aggregation plus a 1-row broadcast "
    "total — the report a curation run publishes next to q_domain_cap's "
    "kept set.",
)
def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _domain_cols(_with_url(spark, sf_dir))
    per_dom = d.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )
    tot = per_dom.agg(F.sum("n_docs").alias("total"))
    return per_dom.crossJoin(F.broadcast(tot)).select(
        "domain",
        "n_docs",
        F.least(F.col("n_docs"), F.lit(DOMAIN_CAP_K)).cast("long").alias("n_kept"),
        F.greatest(F.col("n_docs") - DOMAIN_CAP_K, F.lit(0)).cast("long").alias("n_dropped"),
        "sum_chars",
        F.expr("(n_docs * 10000) div total").alias("share_e4"),
    )


# --- DSIR-style hashed importance reweighting ----------------------------

DSIR_BUCKETS = 256
_BUCKET_SQL = "('0x' || substr(md5(tok), 1, 8))::BIGINT % {b}"


def _dsir_weights_from(feats: DataFrame) -> DataFrame:
    """The DSIR weight tail shared by the unigram and bigram feature
    variants: (doc_id, lang, tok) feature rows -> per-doc mean bucket
    importance ratio.  Two partial-agg passes; the only joins are the
    256-row ratio table and the 1-row totals, both broadcast."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % DSIR_BUCKETS
    )
    bucketed = feats.select("doc_id", "lang", bucket.alias("bucket"))
    bstats = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("r_cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("t_cnt"),
    )
    tot = bstats.agg(
        F.sum("r_cnt").alias("r_tot"), F.sum("t_cnt").alias("t_tot")
    )
    ratios = bstats.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.expr("(t_cnt * r_tot * 10000) div (t_tot * r_cnt)").alias("ratio_e4"),
    )
    return (
        bucketed.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.expr("sum(ratio_e4) div count(1)").alias("dsir_w_e4"),
        )
    )


@query(
    "q_dsir_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split(text, ' '), w -> w != '')) AS tok
      FROM documents
    ),
    bucketed AS (
      SELECT doc_id, lang, {_BUCKET_SQL.format(b=DSIR_BUCKETS)} AS bucket FROM toks
    ),
    bstats AS (
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS r_cnt,
             CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS t_cnt
      FROM bucketed GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(sum(r_cnt) AS BIGINT) AS r_tot, CAST(sum(t_cnt) AS BIGINT) AS t_tot
      FROM bstats
    ),
    ratios AS (
      SELECT bucket,
             CAST((t_cnt * r_tot * 10000) // (t_tot * r_cnt) AS BIGINT) AS ratio_e4
      FROM bstats, tot
    )
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(r.ratio_e4) // count(*) AS BIGINT) AS dsir_w_e4
    FROM bucketed b JOIN ratios r ON r.bucket = b.bucket
    GROUP BY b.doc_id
    """,
    doc="DSIR-style importance reweighting (Xie et al.: data selection "
    "via importance resampling, hashed-feature form): tokens hash into "
    f"{DSIR_BUCKETS} md5 buckets; each bucket's importance ratio is "
    "p_target/p_raw as an exact floor-divided e4 integer (target = the "
    "lang='en' slice, raw = whole corpus; cross-multiplied, never a "
    "float). A doc's weight is the mean of its tokens' bucket ratios. "
    "Two corpus passes (bucket stats, then score-join) with only "
    "256-row/1-row broadcasts between them — the select_token_budget "
    "precedent; at 100 TB checkpoint the tokenized projection or accept "
    "the second scan. int64 envelope: t_cnt*r_tot*1e4 needs total "
    "corpus tokens < ~3e9 per engine word — re-scale to e2 beyond that "
    "(the r11 accumulator-audit discipline).",
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    return _dsir_weights_from(toks)


@query(
    "q_dsir_weights_bigram",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split(text, ' '), w -> w != '')) AS w,
             unnest(range(1, len(list_filter(string_split(text, ' '), w -> w != '')) + 1)) AS i
      FROM documents
    ),
    big AS (
      SELECT a.doc_id, a.lang, a.w || ' ' || b.w AS tok
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
    ),
    bucketed AS (
      SELECT doc_id, lang, {_BUCKET_SQL.format(b=DSIR_BUCKETS)} AS bucket FROM big
    ),
    bstats AS (
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS r_cnt,
             CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS t_cnt
      FROM bucketed GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(sum(r_cnt) AS BIGINT) AS r_tot, CAST(sum(t_cnt) AS BIGINT) AS t_tot
      FROM bstats
    ),
    ratios AS (
      SELECT bucket,
             CAST((t_cnt * r_tot * 10000) // (t_tot * r_cnt) AS BIGINT) AS ratio_e4
      FROM bstats, tot
    )
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(r.ratio_e4) // count(*) AS BIGINT) AS dsir_w_e4
    FROM bucketed b JOIN ratios r ON r.bucket = b.bucket
    GROUP BY b.doc_id
    """,
    doc="DSIR importance weights over hashed BIGRAM features — Xie et "
    "al.'s production form (the paper's hashed n-gram generative model; "
    "bigrams capture the word-order signal unigram buckets lose, e.g. "
    "boilerplate phrases vs their shuffled vocabulary). One extra "
    "zip_with over the already-tokenized array builds adjacent-pair "
    "features IN PLACE (no positional self-join on the Spark side — the "
    "oracle keeps the join spec form); the 256-bucket cross-multiplied "
    "integer weight tail is shared verbatim with q_dsir_weights, so the "
    "plan keeps the same no-SortMergeJoin / two-broadcast shape "
    "(plan-locked). Docs with <2 tokens contribute no features and drop "
    "from the output, exactly like zero-token docs in the unigram form.",
)
def q_dsir_weights_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ws = T.tokens(F.col("text"))
    n1 = F.greatest(F.size(ws) - 1, F.lit(0))
    big = F.zip_with(
        F.slice(ws, F.lit(1), n1),
        F.slice(ws, F.lit(2), n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    feats = d.select("doc_id", "lang", F.explode(big).alias("tok"))
    return _dsir_weights_from(feats)


# --- model-based quality classifier inference -----------------------------

QUALITY_W_BUCKETS = 256
QUALITY_KEEP_E4 = 10_000  # decision boundary: keep when mean weight >= 1.0


def _quality_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, quality_e4) — the scorer shared by
    q_quality_score and the composed q_curation_pipeline (the operator
    itself lives in operators/quality.py, shared with the streaming
    quality gate)."""
    from hnarchive_spark.operators.quality import fixture_model, quality_scores

    d = load(spark, sf_dir, "documents")
    return quality_scores(d, fixture_model(spark))



@query(
    "q_quality_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), w -> w != '')) AS tok
      FROM documents
    ),
    bucketed AS (
      SELECT doc_id, {_BUCKET_SQL.format(b=QUALITY_W_BUCKETS)} AS bucket FROM toks
    ),
    model AS (
      SELECT range AS bucket,
             ('0x' || substr(md5(CAST(range AS VARCHAR)), 1, 8))::BIGINT % 20001 AS w_e4
      FROM range({QUALITY_W_BUCKETS})
    ),
    scored AS (
      SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(m.w_e4) // count(*) AS BIGINT) AS quality_e4
      FROM bucketed b JOIN model m ON m.bucket = b.bucket
      GROUP BY b.doc_id
    )
    SELECT doc_id, n_tokens, quality_e4,
           CAST(CASE WHEN quality_e4 >= {QUALITY_KEEP_E4} THEN 1 ELSE 0 END
                AS BIGINT) AS keep
    FROM scored
    """,
    doc="Model-based quality-classifier INFERENCE (the fastText-style "
    "linear filter that sits between the Gopher heuristic gates and "
    "selection in a production curation stack): tokens hash into "
    f"{QUALITY_W_BUCKETS} md5 buckets (the DSIR feature machinery "
    "reused), the model is a broadcast "
    f"{QUALITY_W_BUCKETS}-row integer weight table, and a doc's score is "
    "the mean of its tokens' bucket weights — the integer dot product of "
    "the doc's bucket-count vector with the weight vector, divided by "
    "n_tokens. The sigmoid is deferred to a threshold compare (monotone, "
    "so keep = quality_e4 >= the boundary in e4 — no libm anywhere); "
    "weights are kept NON-NEGATIVE so the floor division is portable "
    "(Spark div truncates toward zero, DuckDB // floors — they agree "
    "only on nonnegative operands, the q_pca_power lesson). The fixture "
    "model derives each bucket's weight deterministically from md5 of "
    "the bucket id — standing in for offline-trained weights, which a "
    "user supplies as the same (bucket, w_e4) table. Scale shape: ONE "
    "tokenize-explode pass, a 256-row broadcast hash join, partial-agg "
    "per-doc collapse — inference cost is the tokenize pass, model size "
    "never touches the shuffle.",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _quality_scored(spark, sf_dir)
    return scored.select(
        "doc_id",
        "n_tokens",
        "quality_e4",
        F.when(F.col("quality_e4") >= QUALITY_KEEP_E4, 1)
        .otherwise(0)
        .cast("long")
        .alias("keep"),
    )


DSIR_TAU_E4 = 20_000  # acceptance temperature: accept_prob = min(1, w / 2.0)


@query(
    "q_dsir_resample",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split(text, ' '), w -> w != '')) AS tok
      FROM documents
    ),
    bucketed AS (
      SELECT doc_id, lang, {_BUCKET_SQL.format(b=DSIR_BUCKETS)} AS bucket FROM toks
    ),
    bstats AS (
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS r_cnt,
             CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS t_cnt
      FROM bucketed GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(sum(r_cnt) AS BIGINT) AS r_tot, CAST(sum(t_cnt) AS BIGINT) AS t_tot
      FROM bstats
    ),
    ratios AS (
      SELECT bucket,
             CAST((t_cnt * r_tot * 10000) // (t_tot * r_cnt) AS BIGINT) AS ratio_e4
      FROM bstats, tot
    ),
    weights AS (
      SELECT b.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(r.ratio_e4) // count(*) AS BIGINT) AS dsir_w_e4
      FROM bucketed b JOIN ratios r ON r.bucket = b.bucket
      GROUP BY b.doc_id
    )
    SELECT doc_id, n_tokens, dsir_w_e4,
           CAST(least(1000000, dsir_w_e4 * 1000000 // {DSIR_TAU_E4}) AS BIGINT) AS accept_e6
    FROM weights
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
          < dsir_w_e4 * 1000000 // {DSIR_TAU_E4}
    """,
    doc="DSIR importance RESAMPLING — the selection step the weights "
    "exist for: each doc is kept with probability min(1, w/tau) via the "
    "repo's deterministic md5-hash acceptance (q_sample_hash / "
    "q_mix_temperature precedent), so the selected subset is exactly "
    "reproducible across engines AND across runs — resampling a 100 TB "
    "corpus twice yields byte-identical training sets, and the accepted "
    "set composes with the pack/shard operators downstream. Same "
    "two-pass plan as q_dsir_weights plus one hash filter; tau is the "
    "sampling temperature (here 2.0 in e4).",
)
def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = q_dsir_weights(spark, sf_dir)
    accept_e6 = F.expr(f"least(1000000, dsir_w_e4 * 1000000 div {DSIR_TAU_E4})")
    hash_e6 = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        % 1_000_000
    )
    return (
        w.withColumn("accept_e6", accept_e6)
        .filter(hash_e6 < F.col("accept_e6"))
        .select("doc_id", "n_tokens", "dsir_w_e4", "accept_e6")
    )


# --- the composed curation pipeline ---------------------------------------


# The four-stage URL-first pipeline's CTE chain through ``capped`` —
# shared verbatim by q_curation_pipeline_url's ranked-output oracle and
# q_curation_funnel's per-stage loss accounting, so the audited stages
# ARE the pipeline's stages.
_URL_PIPE_CTES = f"""uraw AS (
      SELECT doc_id, source, {_RAW_URL_SQL} AS url FROM documents
    ),
    ucanon AS (
      SELECT doc_id, {_canon_sql("url")} AS curl FROM uraw
    ),
    usurv AS (
      SELECT doc_id, n_url_dups FROM (
        SELECT doc_id,
               CAST(count(*) OVER (PARTITION BY curl) AS BIGINT) AS n_url_dups,
               row_number() OVER (PARTITION BY curl ORDER BY doc_id) AS uo
        FROM ucanon
      ) WHERE uo = 1
    ),
    toks AS (
      SELECT d.doc_id,
             unnest(list_filter(string_split(d.text, ' '), w -> w != '')) AS tok
      FROM documents d JOIN usurv u ON u.doc_id = d.doc_id
    ),
    bucketed AS (
      SELECT doc_id, {_BUCKET_SQL.format(b=QUALITY_W_BUCKETS)} AS bucket FROM toks
    ),
    model AS (
      SELECT range AS bucket,
             ('0x' || substr(md5(CAST(range AS VARCHAR)), 1, 8))::BIGINT % 20001 AS w_e4
      FROM range({QUALITY_W_BUCKETS})
    ),
    scored AS (
      SELECT b.doc_id,
             CAST(sum(m.w_e4) // count(*) AS BIGINT) AS quality_e4
      FROM bucketed b JOIN model m ON m.bucket = b.bucket
      GROUP BY b.doc_id
    ),
    kept_q AS (SELECT doc_id, quality_e4 FROM scored
               WHERE quality_e4 >= {QUALITY_KEEP_E4}),
    fp AS (
      SELECT d.doc_id, q.quality_e4, u.n_url_dups,
             substr(md5(regexp_replace(lower(d.text), ' +', ' ', 'g')), 1, 16) AS fp
      FROM documents d
      JOIN kept_q q ON q.doc_id = d.doc_id
      JOIN usurv u ON u.doc_id = d.doc_id
    ),
    surv AS (
      SELECT doc_id, quality_e4, n_url_dups,
             CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS n_dups,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS fo
      FROM fp
    ),
    {_URL_CTE},
    capped AS (
      SELECT p.doc_id, p.domain, p.n_chars, s.quality_e4, s.n_dups, s.n_url_dups,
             row_number() OVER (PARTITION BY p.domain
                                ORDER BY p.n_chars DESC, p.doc_id) AS rk
      FROM parsed p JOIN surv s ON s.doc_id = p.doc_id AND s.fo = 1
    )"""


@query(
    "q_curation_pipeline_url",
    oracle=f"""
    WITH {_URL_PIPE_CTES}
    SELECT doc_id, domain, n_chars, quality_e4, n_dups, n_url_dups,
           CAST(rk AS BIGINT) AS rk
    FROM capped WHERE rk <= {DOMAIN_CAP_K}
    """,
    doc="The FOUR-stage composed curation pipeline — the batch twin of "
    "the streaming ingest verb's full gate order: (0) canonical-URL "
    "survivorship FIRST (the cheapest gate: q_url_dedup's rule set, "
    "min-doc_id winner, dup count carried as audit), then (1) the "
    "broadcast quality gate over SURVIVORS ONLY (the tokenize pass "
    "never touches URL-duplicate docs — the whole point of gate "
    "ordering), (2) exact-dedup survivorship, (3) per-domain cap. "
    "Audit columns carry both dup counts (n_url_dups, n_dups) plus "
    "quality and rank. Same scale shape as q_curation_pipeline plus "
    "ONE ~60-byte-key exchange in front that SHRINKS every downstream "
    "stage's input.",
)
def q_curation_pipeline_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _url_pipeline_stages(spark, sf_dir)["final"]


def _url_pipeline_stages(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The four-stage pipeline's stage frames — ``usurv`` (URL-dedup
    survivors), ``kept_q`` (quality-gate survivors), ``surv`` (exact-dedup
    survivors), ``final`` (domain-capped output).  q_curation_pipeline_url
    returns ``final``; q_curation_funnel counts every stage, so the
    accounting can never drift from the pipeline it accounts for."""
    from hnarchive_spark.operators.quality import fixture_model, quality_scores

    d = load(spark, sf_dir, "documents")
    g = F.expr("doc_id div 3").cast("string")
    site = F.expr("(doc_id div 3) % 50").cast("string")
    p = F.substring(F.md5(g), 1, 12)
    raw = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("HTTP://WWW.SITE"), site, F.lit(".COM/"), p,
                F.lit("/?utm_source=feed&ref="), F.col("source"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("https://site"), site, F.lit(".com/"), p,
                F.lit("#section-2"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://www.site"), site, F.lit(".com:443/"), p
            )
        )
    )
    wu = Window.partitionBy("curl")
    wuo = Window.partitionBy("curl").orderBy("doc_id")
    usurv = (
        d.select("doc_id", _canon_col(raw).alias("curl"))
        .select(
            "doc_id",
            F.count(F.lit(1)).over(wu).alias("n_url_dups"),
            F.row_number().over(wuo).alias("uo"),
        )
        .filter(F.col("uo") == 1)
        .drop("uo")
    )
    # quality gate over URL SURVIVORS only — cheapest gate first
    kept_q = quality_scores(
        d.join(usurv.select("doc_id"), "doc_id"), fixture_model(spark)
    ).filter(F.col("quality_e4") >= QUALITY_KEEP_E4)
    fp = (
        d.join(kept_q.select("doc_id", "quality_e4"), "doc_id")
        .join(usurv, "doc_id")
        .select(
            "doc_id", "quality_e4", "n_url_dups",
            T.fingerprint(F.col("text")).alias("fp"),
        )
    )
    wc = Window.partitionBy("fp")
    wf = Window.partitionBy("fp").orderBy("doc_id")
    surv = (
        fp.select(
            "doc_id",
            "quality_e4",
            "n_url_dups",
            F.count(F.lit(1)).over(wc).alias("n_dups"),
            F.row_number().over(wf).alias("fo"),
        )
        .filter(F.col("fo") == 1)
        .drop("fo")
    )
    parsed = _domain_cols(_with_url(spark, sf_dir)).select(
        "doc_id", "domain", "n_chars"
    )
    wd = Window.partitionBy("domain").orderBy(F.col("n_chars").desc(), "doc_id")
    final = (
        parsed.join(surv, "doc_id")
        .withColumn("rk", F.row_number().over(wd).cast("long"))
        .filter(F.col("rk") <= DOMAIN_CAP_K)
        .select(
            "doc_id", "domain", "n_chars", "quality_e4", "n_dups",
            "n_url_dups", "rk",
        )
    )
    return {"usurv": usurv, "kept_q": kept_q, "surv": surv, "final": final}


CURATION_STAGES = ("raw", "url_dedup", "quality_gate", "exact_dedup", "domain_cap")


def _funnel_oracle() -> str:
    """Loss accounting over the URL pipeline's own CTE chain: one
    token-count CTE, one flags frame (four LEFT joins of the stage id
    sets), one aggregate, five UNION ALL stage rows."""
    aggs = ", ".join(
        f"CAST(count(*) FILTER (WHERE i{i}) AS BIGINT) AS d{i}, "
        f"CAST(coalesce(sum(nt) FILTER (WHERE i{i}), 0) AS BIGINT) AS t{i}"
        for i in (1, 2, 3, 4)
    )
    unions = "\n      UNION ALL\n      ".join(
        f"SELECT CAST({i} AS BIGINT) AS stage, '{name}' AS stage_name, "
        f"d{i} AS n_docs, t{i} AS n_tokens, "
        f"CAST(d{i} * 10000 // d0 AS BIGINT) AS docs_pct_e4, "
        f"CAST(t{i} * 10000 // t0 AS BIGINT) AS tokens_pct_e4 FROM c"
        for i, name in enumerate(CURATION_STAGES)
    )
    return f"""
    WITH {_URL_PIPE_CTES},
    tokc AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), w -> w != ''))
                  AS BIGINT) AS nt
      FROM documents
    ),
    flags AS (
      SELECT t.doc_id, t.nt,
             u.doc_id IS NOT NULL AS i1,
             q.doc_id IS NOT NULL AS i2,
             s3.doc_id IS NOT NULL AS i3,
             f4.doc_id IS NOT NULL AS i4
      FROM tokc t
      LEFT JOIN usurv u ON u.doc_id = t.doc_id
      LEFT JOIN kept_q q ON q.doc_id = t.doc_id
      LEFT JOIN (SELECT doc_id FROM surv WHERE fo = 1) s3 ON s3.doc_id = t.doc_id
      LEFT JOIN (SELECT doc_id FROM capped WHERE rk <= {DOMAIN_CAP_K}) f4
        ON f4.doc_id = t.doc_id
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS d0, CAST(sum(nt) AS BIGINT) AS t0,
             {aggs}
      FROM flags
    )
    SELECT * FROM ({unions})
    """


@query(
    "q_curation_funnel",
    oracle=_funnel_oracle(),
    doc="Per-stage LOSS ACCOUNTING for the four-stage curation pipeline — "
    "the audit report a training-data team reads before blessing a crawl "
    "drop: one row per stage (raw -> url_dedup -> quality_gate -> "
    "exact_dedup -> domain_cap) with surviving docs, surviving whitespace "
    "tokens, and both as floor-divided e4 fractions of the raw corpus. "
    "The stage id-frames are _url_pipeline_stages' OWN frames (accounting "
    "cannot drift from the pipeline), composed as one declarative DAG: a "
    "single tokenize-count pass over documents, four (doc_id, flag) LEFT "
    "joins — metadata-width, all keyed the same — ONE partial+final "
    "aggregate, and a 5-row stack. At 100 TB the funnel costs the "
    "pipeline it audits plus one token-count scan; nothing in it is "
    "corpus x corpus.",
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_from_stages(
        load(spark, sf_dir, "documents"), _url_pipeline_stages(spark, sf_dir)
    )


def funnel_from_stages(d: DataFrame, s: dict[str, DataFrame]) -> DataFrame:
    """The funnel aggregate over GIVEN stage frames — factored out so the
    release run (plans/release.py) can feed it the stage frames it has
    already materialized once (and published as audit artifacts) instead
    of re-running every gate, while the registered query keeps building
    its own frames.  One token-count scan, four metadata-width flag
    joins, ONE partial+final aggregate, a 5-row stack."""
    tokc = d.select(
        "doc_id", T.n_tokens(F.col("text")).cast("long").alias("nt")
    )
    flags = tokc
    for i, frame in enumerate(
        (s["usurv"], s["kept_q"], s["surv"], s["final"]), start=1
    ):
        flags = flags.join(
            frame.select("doc_id", F.lit(1).alias(f"in{i}")), "doc_id", "left"
        )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("d0"),
        F.sum("nt").cast("long").alias("t0"),
    ]
    for i in (1, 2, 3, 4):
        aggs.append(F.count(F.col(f"in{i}")).cast("long").alias(f"d{i}"))
        aggs.append(
            F.coalesce(F.sum(F.col(f"in{i}") * F.col("nt")), F.lit(0))
            .cast("long")
            .alias(f"t{i}")
        )
    rows = ", ".join(
        f"CAST({i} AS BIGINT), '{name}', d{i}, t{i}, "
        f"(d{i} * 10000) div d0, (t{i} * 10000) div t0"
        for i, name in enumerate(CURATION_STAGES)
    )
    return flags.agg(*aggs).select(
        F.expr(
            f"stack(5, {rows}) AS "
            "(stage, stage_name, n_docs, n_tokens, docs_pct_e4, tokens_pct_e4)"
        )
    )


@query(
    "q_curation_pipeline",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), w -> w != '')) AS tok
      FROM documents
    ),
    bucketed AS (
      SELECT doc_id, {_BUCKET_SQL.format(b=QUALITY_W_BUCKETS)} AS bucket FROM toks
    ),
    model AS (
      SELECT range AS bucket,
             ('0x' || substr(md5(CAST(range AS VARCHAR)), 1, 8))::BIGINT % 20001 AS w_e4
      FROM range({QUALITY_W_BUCKETS})
    ),
    scored AS (
      SELECT b.doc_id,
             CAST(sum(m.w_e4) // count(*) AS BIGINT) AS quality_e4
      FROM bucketed b JOIN model m ON m.bucket = b.bucket
      GROUP BY b.doc_id
    ),
    kept_q AS (SELECT doc_id, quality_e4 FROM scored
               WHERE quality_e4 >= {QUALITY_KEEP_E4}),
    fp AS (
      SELECT d.doc_id, q.quality_e4,
             substr(md5(regexp_replace(lower(d.text), ' +', ' ', 'g')), 1, 16) AS fp
      FROM documents d JOIN kept_q q ON q.doc_id = d.doc_id
    ),
    surv AS (
      SELECT doc_id, quality_e4,
             CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS n_dups,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS fo
      FROM fp
    ),
    {_URL_CTE},
    capped AS (
      SELECT p.doc_id, p.domain, p.n_chars, s.quality_e4, s.n_dups,
             row_number() OVER (PARTITION BY p.domain
                                ORDER BY p.n_chars DESC, p.doc_id) AS rk
      FROM parsed p JOIN surv s ON s.doc_id = p.doc_id AND s.fo = 1
    )
    SELECT doc_id, domain, n_chars, quality_e4, n_dups, CAST(rk AS BIGINT) AS rk
    FROM capped WHERE rk <= {DOMAIN_CAP_K}
    """,
    doc="The COMPOSED curation pipeline as one declarative plan — the "
    "preprocessing recipe a training-data team actually runs, chained "
    "end to end so Catalyst plans it as a single DAG: (1) model-based "
    "quality gate (q_quality_score's broadcast 256-row scorer, keep "
    f">= {QUALITY_KEEP_E4} e4), (2) exact-dedup survivorship over the "
    "kept docs (normalized-text fingerprint, first-occurrence wins, dup "
    "count carried as audit), (3) per-registrable-domain cap "
    f"(top-{DOMAIN_CAP_K} by n_chars DESC with the WindowGroupLimit "
    "partial rank pushdown). Output = the selected docs with full audit "
    "columns (quality_e4, n_dups, domain rank). Scale shape: one "
    "tokenize pass + three metadata-width shuffles (doc_id, fp, domain) "
    "— no stage re-scans the corpus text more than the fingerprint and "
    "URL projections need, and every stage's skew guard is the one its "
    "standalone query ships (broadcast model, hash-group fp, capped "
    "domain window). A green hash check here proves the STAGES COMPOSE: "
    "each standalone oracle can pass while a composition mis-threads its "
    "join keys — this query pins the whole recipe.",
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    kept_q = _quality_scored(spark, sf_dir).filter(
        F.col("quality_e4") >= QUALITY_KEEP_E4
    )
    fp = d.join(kept_q.select("doc_id", "quality_e4"), "doc_id").select(
        "doc_id", "quality_e4", T.fingerprint(F.col("text")).alias("fp")
    )
    wc = Window.partitionBy("fp")
    wf = Window.partitionBy("fp").orderBy("doc_id")
    surv = (
        fp.select(
            "doc_id",
            "quality_e4",
            F.count(F.lit(1)).over(wc).alias("n_dups"),
            F.row_number().over(wf).alias("fo"),
        )
        .filter(F.col("fo") == 1)
        .drop("fo")
    )
    parsed = _domain_cols(_with_url(spark, sf_dir)).select(
        "doc_id", "domain", "n_chars"
    )
    wd = Window.partitionBy("domain").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        parsed.join(surv, "doc_id")
        .withColumn("rk", F.row_number().over(wd).cast("long"))
        .filter(F.col("rk") <= DOMAIN_CAP_K)
        .select("doc_id", "domain", "n_chars", "quality_e4", "n_dups", "rk")
    )
