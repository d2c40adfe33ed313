"""Query registry: one named entry per implemented operator (SURVEY.md §2).

Each :class:`QuerySpec` pairs a Spark DataFrame builder with the equivalent
ANSI SQL for the DuckDB oracle (or ``None`` for genuinely non-SQL-expressible
operators, which get the driver's weaker rows-only check).

Registration happens by importing the plan modules at the bottom — each uses
the :func:`query` decorator.  `__spark_entry__.py` re-exports
:func:`all_queries` / :func:`all_oracles` verbatim.

Contract reminders (driver compares sorted-by-name columns, value hash):
* alias every computed column identically in Spark and SQL;
* round every float aggregate the same way on both sides;
* make every top-k deterministic with a total tiebreak order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = ""):
    """Decorator registering a (spark_builder, oracle_sql) pair."""

    def _register(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return _register


# The driver verifies a bounded window (~50 queries) of the inventory in the
# order all_queries() returns, so the names below — round 5's verification
# targets — come FIRST, then everything else in registration order:
#   * first 5: the round-4 hash-fails fixed this round (oracle BIGINT pins +
#     integer quality rework) — a fresh green row is mandatory;
#   * then every query ADDED in round 5 (both sessions: the LLM-pipeline /
#     graph / analytics / search / streaming-semantics waves) — all need a
#     first driver row; the ~50-query window ends just after this block;
#   * tail: stale-green insurance (r1-green-only first, then the stalest
#     r3-green dedup/similarity/textops block) that rotates in as windows
#     allow. The r4-green relational/streaming/hn_ops block sits after
#     _VERIFY_FIRST in registration order and rotates in round 6.
_VERIFY_FIRST = [
    # -- the three round-4 hash-fails whose oracles were BIGINT-pinned this
    # round, plus the two whose quality score was integer-reworked: these
    # MUST land a fresh green row, so they outrank even the new queries --
    "q_sessionize",
    "q_corpus_datacard",
    "q_select_token_budget",
    "q_dedup_canonical",
    "q_chunk_documents",
    # -- scalable twins of judged anti-patterns (new, need a first row) --
    "q_percentiles_scalable",
    "q_shard_assignment_scalable",
    "q_decile_binning_scalable",
    # -- round-5 LLM-pipeline wave (first-class components, need first rows) --
    "q_semdedup",
    "q_ann_pq_search",
    "q_paragraph_dedup",
    "q_mix_temperature",
    "q_pii_redact",
    "q_skew_salted_join",
    "q_pq_codes",
    "q_vocab_top_subtokens",
    "q_shard_assignment",
    "q_reservoir_per_source",
    "q_ann_ivf_append",
    "q_stream_rollup_mv",
    "q_heavy_hitters_exact",
    "q_heavy_hitters_cms",
    "q_funnel",
    "q_retention_cohorts",
    "q_market_share",
    # -- round-5 streaming-semantics wave --
    "q_stream_late_drop",
    "q_stream_outer_join",
    # -- round-5 graph / ML wave --
    "q_pagerank",
    "q_global_index",
    "q_knn_classify",
    "q_hard_negatives",
    "q_embed_dim_audit",
    "q_triangle_count",
    "q_link_prediction",
    "q_kcore_peel",
    "q_power_iteration",
    "q_pagerank_weighted",
    # -- round-5 search / retrieval wave --
    "q_bm25_lite",
    "q_inverted_index",
    "q_bigram_lm",
    # -- round-5 analytics wave (the ~50-query window ends inside this
    # block; the remainder gets first rows in round 6) --
    "q_orders_per_customer_dist",
    "q_idle_rich_customers",
    "q_sole_late_supplier",
    "q_user_anomaly",
    "q_revenue_trend",
    "q_attribution_last_touch",
    "q_recency_weighted",
    "q_store_changelog",
    "q_gap_fill",
    "q_length_histogram",
    "q_outlier_mad",
    "q_winsorize",
    "q_association_rules",
    "q_expectations",
    "q_subtree_agg",
    "q_decile_binning",
    "q_mode_per_group",
    "q_gini_revenue",
    "q_join_full_outer",
    "q_changepoint_cusum",
    "q_autocorr_lag1",
    "q_dow_profile",
    "q_skew_report",
    "q_histogram_equiwidth",
    "q_lorenz_deciles",
    "q_percentile_rank_transform",
    "q_benford_audit",
    "q_jsonl_roundtrip",
    "q_csv_roundtrip",
    "q_wow_growth",
    # -- r1-green-only stale insurance --
    "q_window_range_frame",
    "q_filtered_agg",
    "q_having",
    "q_window_funcs",
    "q_correlated_subquery",
    "q_percentiles",
    "q_stratified_sample",
    "q_lateral_join",
    "q_unpivot",
    "q_topk_per_group",
    "q_setops_all",
    "q_children_sorted",
    "q_fix_ptags",
    "q_display_date",
    # -- stalest r3-green block --
    "q_dedup_exact",
    "q_dedup_ngram",
    "q_dedup_ngram_maxdf",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_dedup_clusters",
    "q_embed_dup",
    "q_contamination",
    "q_ann_topk",
    "q_ann_lsh",
    "q_ann_lsh_multi",
    "q_ann_lsh_indexed",
    "q_ann_ivf",
    "q_ann_ivf_probe2",
    "q_pipeline_clean_corpus",
    "q_sample_weighted",
    "q_mix_equalize",
    "q_text_stats",
    "q_text_quality",
    "q_quality_repetition",
    "q_token_count",
    "q_lang_id",
    "q_tfidf_top_terms",
]


def _ordered_names() -> list[str]:
    missing = [n for n in _VERIFY_FIRST if n not in REGISTRY]
    if missing:  # typo protection — never silently shrink the priority window
        raise ValueError(f"_VERIFY_FIRST names not registered: {missing}")
    first = set(_VERIFY_FIRST)
    return list(_VERIFY_FIRST) + [n for n in REGISTRY if n not in first]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: REGISTRY[name].spark for name in _ordered_names()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }


_LOADED = False


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import for side effect: each module registers its queries.  The driver
    # verifies a bounded window of the inventory in registration order, so the
    # LLM-pipeline modules (dedup/similarity/text/streaming/multimodal) come
    # FIRST; the relational surface, driver-verified green in round 1, last.
    # An import failure here must be loud — never silently shrink the
    # verification inventory.
    from hnarchive_spark.plans import dedup  # noqa: F401
    from hnarchive_spark.plans import similarity  # noqa: F401
    from hnarchive_spark.plans import textops  # noqa: F401
    from hnarchive_spark.plans import streaming_plans  # noqa: F401
    from hnarchive_spark.plans import multimodal_plans  # noqa: F401
    from hnarchive_spark.plans import functions_battery, hn_ops, relational, relational2  # noqa: F401
    from hnarchive_spark.plans import analytics, graph_ml, search  # noqa: F401

    _LOADED = True
