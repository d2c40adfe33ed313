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
    # Round-8 rotation. The driver verifies ~the first 50 names, so priority:
    #   (a) the 5 queries that have NEVER had a driver row (registered past
    #       the round-6 window cutoff; locally parity-green at sf0.001 and
    #       sf0.01 but the driver row is the contract);
    #   (b) the 2 queries integerized in round 6 whose rewired internals
    #       were never driver-re-verified (output schemas unchanged);
    #   (c) the 28 legacy-DOUBLE queries converted to integer outputs this
    #       round — their old green rows describe an obsolete schema, so
    #       fresh rows are mandatory;
    #   (d) r1-green-only stragglers not already covered by (c);
    #   (e) everything else in registration order (cumulative-green,
    #       unchanged code).
    # -- (a) never-driver-verified --
    "q_bigram_novelty",
    "q_fuzzy_match_blocked",
    "q_lpa_communities",
    "q_multimodal_dedup",
    "q_schema_evolution",
    # -- (a2) added in round 8 — first rows --
    "q_link_prediction_capped",
    "q_priority_pipeline",
    "q_volume_shipping",
    "q_returned_items",
    "q_shipmode_priority",
    "q_promo_revenue",
    "q_top_supplier",
    "q_small_qty_revenue",
    "q_large_orders",
    "q_disjunctive_filter",
    "q_stream_dedup_bounded",
    "q_bpe_merge_pairs",
    "q_ann_recall",
    "q_multimodal_phash_dup",
    "q_forecast_revenue",
    "q_interval_overlap",
    "q_k_anonymity",
    # -- (c) round-8 DOUBLE->integer conversions (schema changed — their
    # old green rows describe an obsolete schema, so fresh rows are
    # mandatory and outrank the schema-unchanged rewires in (b) below) --
    "q_flagship",
    "q_groupby_agg",
    "q_shipping_priority",
    "q_agg_cube",
    "q_agg_rollup",
    "q_grouping_sets",
    "q_running_sum",
    "q_join_broadcast",
    "q_point_lookup",
    "q_fk_filter",
    "q_fk_filter_2",
    "q_topk",
    "q_window_rank",
    "q_sample_hash",
    "q_lateral_join",
    "q_join_fk",
    "q_topk_per_group",
    "q_null_handling",
    "q_contamination",
    "q_mix_equalize",
    "q_sample_weighted",
    "q_text_quality",
    "q_text_stats",
    "q_quality_repetition",
    "q_tfidf_top_terms",
    "q_pandas_udf_score",
    "q_pandas_udaf_weighted",
    "q_stream_stream_join",
    # newest round-8 addition — first name past the ~50 cutoff so every
    # schema-changed conversion above keeps a guaranteed slot
    "q_asof_join_forward",
    "q_corpus_drift",
    "q_orc_roundtrip",
    # -- (b) round-6 integer rewires, no driver row for the new internals
    # (output schemas unchanged, so these rank below the schema changes) --
    "q_dedup_clusters",
    "q_dedup_incremental",
    # -- (d) r1-green-only stragglers not in (c) --
    "q_window_range_frame",
    "q_filtered_agg",
    "q_having",
    "q_window_funcs",
    "q_correlated_subquery",
    "q_percentiles",
    "q_stratified_sample",
    "q_unpivot",
    "q_setops_all",
    "q_children_sorted",
    "q_fix_ptags",
    "q_display_date",
    # -- (e) stalest remaining r3-green block fills the window tail --
    "q_dedup_exact",
    "q_token_count",
    "q_lang_id",
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
    from hnarchive_spark.plans import analytics, graph_ml, search, tpch_extra  # noqa: F401

    _LOADED = True
