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
# order all_queries() returns, so the names below — this round's verification
# targets — come FIRST, then everything else in registration order.
_VERIFY_FIRST = [
    # Round-6 rotation. The driver verifies ~the first 50 names, so priority:
    #   (a) the 20 analytics-tail queries that have NEVER had a driver row
    #       (registered after round 5's window cutoff; judge-verified at
    #       sf0.01 in VERDICT r5, but the driver row is the contract);
    #   (b) the 4 queries whose internals were rewired through
    #       operators/rankselect.py this round (oracles unchanged — a fresh
    #       green row proves the rewiring);
    #   (c) the 17 dedup/similarity queries whose OUTPUT changed to integer
    #       jaccard_e4/cos_e6 this round — their old green rows describe an
    #       obsolete schema, so fresh rows are mandatory;
    #   (d) queries ADDED in round 6 — first rows;
    #   (e) the 14 r1-green-only stragglers (unchanged code, stale green —
    #       lowest risk, rotate in as window room allows);
    #   (f) everything else in registration order (r3/r4-green, unchanged).
    # -- (a) never-driver-verified analytics tail --
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
    # -- (b) rankselect rewires (round 6) --
    "q_corpus_datacard",
    "q_select_token_budget",
    "q_reservoir_per_source",
    "q_decile_binning_scalable",
    # -- (c) integer-output conversions (round 6) --
    "q_dedup_ngram",
    "q_dedup_ngram_maxdf",
    "q_dedup_minhash",
    "q_dedup_canonical",
    "q_pipeline_clean_corpus",
    "q_embed_dup",
    "q_embed_dup_capped",
    "q_ann_topk",
    "q_ann_lsh",
    "q_ann_lsh_multi",
    "q_ann_lsh_indexed",
    "q_ann_ivf",
    "q_ann_ivf_probe2",
    "q_ann_ivf_indexed",
    "q_ann_ivf_append",
    # -- (d) round-6 additions (inserted here as they land) --
    "q_zorder_box",
    "q_stream_funnel",
    "q_triangle_count",
    "q_containment_dup",
    "q_minhash_accuracy",
    "q_group_kfold",
    "q_time_split_embargo",
    "q_class_weights",
    "q_knn_confusion",
    "q_rolling_active_users",
    "q_corr_rational",
    # -- positions 51+: past the expected window cutoff. First the two
    # integerized queries whose output schemas did not change (only the
    # internal pair filter moved to the math-equivalent integer form),
    # then the round-6 additions that arrived after the window filled —
    # all locally parity-verified at sf0.001 + sf0.01; r7-window leads --
    "q_dedup_clusters",
    "q_dedup_incremental",
    "q_multimodal_dedup",
    "q_bigram_novelty",
    "q_schema_evolution",
    "q_fuzzy_match_blocked",
    "q_lpa_communities",
    # -- (e) r1-green-only stragglers --
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
    # -- (f) stalest remaining r3-green block --
    "q_dedup_exact",
    "q_contamination",
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
