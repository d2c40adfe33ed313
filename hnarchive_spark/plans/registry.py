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
# The driver round this window was built FOR: rotation_order(before_round=
# _ROTATION_BUILT_FOR_ROUND) over CORRECTNESS_r*.json reproduces it even
# after this round's own file lands.  Bump when rotating.
_ROTATION_BUILT_FOR_ROUND = 17

_VERIFY_FIRST = [
    # Round-17 rotation, generated MECHANICALLY as
    # tools/rotation_report.rotation_order(before_round=17) prefix and
    # locked by tests/test_rotation_consistency.py: the two queries
    # registered this round first (the Arrow-kernel BPE encoder and
    # the kernel-metered budget selection, VERDICT r16 #1), then the
    # FULL r11 verification floor — the 8 stragglers VERDICT r16 #2
    # names — then the r12 block filling the 50-slot budget;
    # ascending staleness, ALPHABETICAL tiebreak.  With this window
    # green the staleness floor over CORRECTNESS_r01-r17 rises to r12.
    "q_bpe_encode_kernel",
    "q_select_token_budget_bpe_kernel",
    "q_skew_salted_join",
    "q_sole_late_supplier",
    "q_store_changelog",
    "q_stream_late_drop",
    "q_stream_outer_join",
    "q_stream_rollup_mv",
    "q_user_anomaly",
    "q_vocab_top_subtokens",
    "q_agg_cube",
    "q_agg_rollup",
    "q_ann_recall",
    "q_bigram_novelty",
    "q_bpe_merge_pairs",
    "q_bucketed_join",
    "q_contamination",
    "q_disjunctive_filter",
    "q_domain_cap",
    "q_domain_stats",
    "q_dpp_join",
    "q_dsir_resample",
    "q_dsir_weights",
    "q_fk_filter",
    "q_fk_filter_2",
    "q_flagship",
    "q_forecast_revenue",
    "q_fuzzy_match_blocked",
    "q_groupby_agg",
    "q_grouping_sets",
    "q_interval_overlap",
    "q_join_broadcast",
    "q_join_fk",
    "q_k_anonymity",
    "q_knn_confusion",
    "q_lorenz_deciles",
    "q_minhash_accuracy",
    "q_mode_per_group",
    "q_outlier_mad",
    "q_percentile_rank_transform",
    "q_pipeline_clean_corpus",
    "q_reservoir_per_source",
    "q_rolling_active_users",
    "q_scd2_history",
    "q_scd2_incremental",
    "q_scd2_store",
    "q_select_token_budget",
    "q_skew_report",
    "q_stream_funnel",
    "q_substring_dedup",
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
    from hnarchive_spark.plans import analytics, curation, graph_ml, search, tpch_extra  # noqa: F401

    _LOADED = True
