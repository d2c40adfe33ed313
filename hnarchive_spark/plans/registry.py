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
# order all_queries() returns, so the names below — round 4's verification
# targets — come FIRST, then everything else in registration order:
#   * q_approx_distinct / q_heavy_hitters_cms: registered since round 1 but
#     never inside any driver window — they have no driver row at all;
#   * the round-4 fixed queries (sessionize/datacard float-exactness rework,
#     the streaming-source timestamp-variant fix, json_extract cents);
#   * the relational surface: driver-green in round 1 but without fresh
#     signal since (rounds 2-3 windows were the LLM-pipeline modules).
# The tail (dedup/similarity/textops/multimodal/hn_ops) is double-green from
# rounds 2 AND 3 with unchanged code, so it can sit outside the window.
_VERIFY_FIRST = [
    "q_approx_distinct",
    "q_heavy_hitters_cms",
    "q_sessionize",
    "q_corpus_datacard",
    "q_stream_tumbling",
    "q_stream_dim_join",
    "q_stream_stream_join",
    "q_stream_sessionize",
    "q_stream_dedup",
    "q_json_extract",
    "q_ann_ivf_indexed",
    "q_embed_dup_capped",
    "q_boilerplate_ngrams",
    "q_dedup_canonical",
    "q_kmeans_assign",
    "q_dedup_incremental",
    "q_stream_sliding",
    "q_skew_salted_agg",
    "q_winnow_fingerprint",
    "q_chunk_documents",
    "q_session_window_builtin",
    "q_split_train_eval",
    "q_select_token_budget",
    "q_embed_quantize",
    "q_point_lookup",
    "q_fk_filter",
    "q_fk_filter_2",
    "q_max_key",
    "q_topk",
    "q_derived_pred",
    "q_staleness",
    "q_window_sort",
    "q_join_fk",
    "q_self_join",
    "q_join_semi",
    "q_join_anti",
    "q_join_broadcast",
    "q_groupby_agg",
    "q_agg_rollup",
    "q_distinct_count",
    "q_pivot_status",
    "q_window_rank",
    "q_running_sum",
    "q_setops",
    "q_flagship",
    "q_shipping_priority",
    "q_agg_cube",
    "q_grouping_sets",
    "q_sample_hash",
    "q_range_join",
    "q_window_range_frame",
    "q_stratified_sample",
    "q_filtered_agg",
    "q_lateral_join",
    "q_unpivot",
    "q_having",
    "q_window_funcs",
    "q_correlated_subquery",
    "q_percentiles",
    "q_topk_per_group",
    "q_setops_all",
    "q_children_sorted",
    "q_fix_ptags",
    "q_display_date",
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

    _LOADED = True
