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
    # Round-9 rotation: evidence completion.  After round 8's fully green
    # 50-name window, the remaining priorities (VERDICT r8 "Next round" #1):
    #   (a) the 3 late-r8 queries with NO driver row ever;
    #   (b) the 2 round-6 internal rewires (schemas unchanged) whose current
    #       internals have never been driver-verified;
    #   (c) everything else ordered by staleness of its latest green driver
    #       row — the 12 r1-green stragglers, then the r3-green block, then
    #       the r4-green block (computed from CORRECTNESS_r01..r08).
    # The ~50-name window covers through the r3 block and into r4; the tail
    # rolls into round 10.  Names verified green in r7/r8 need no fresh row
    # and sit after this list in registration order.
    # -- (a) never-driver-verified (added late round 8) --
    "q_asof_join_forward",
    "q_corpus_drift",
    "q_orc_roundtrip",
    # -- (b) round-6 rewires, current internals never driver-verified --
    "q_dedup_clusters",
    "q_dedup_incremental",
    # -- (c) r1-green-only stragglers (rows predate 7 rounds of refactors) --
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
    # -- (c) r3-green block --
    "q_dedup_exact",
    "q_token_count",
    "q_lang_id",
    "q_dedup_simhash",
    "q_doc_fingerprint",
    "q_pack_sequences",
    "q_pack_sequences_sharded",
    "q_asof_join_inner",
    "q_asof_join",
    "q_multimodal_meta",
    "q_multimodal_frames",
    "q_multimodal_resize",
    "q_multimodal_features",
    "q_string_funcs",
    "q_date_funcs",
    "q_regexp_funcs",
    "q_map_funcs",
    "q_array_funcs",
    "q_merge_coalesce",
    "q_wire_normalize",
    "q_tree_closure",
    # -- (c) r4-green block (window tail; overflow rolls to round 10) --
    "q_boilerplate_ngrams",
    "q_split_train_eval",
    "q_kmeans_assign",
    "q_embed_quantize",
    "q_winnow_fingerprint",
    "q_stream_tumbling",
    "q_stream_dedup",
    "q_stream_dim_join",
    "q_stream_sessionize",
    "q_stream_sliding",
    "q_session_window_builtin",
    "q_max_key",
    "q_derived_pred",
    "q_staleness",
    "q_window_sort",
    "q_self_join",
    "q_join_semi",
    "q_join_anti",
    "q_distinct_count",
    "q_pivot_status",
    "q_setops",
    "q_json_extract",
    "q_range_join",
    "q_skew_salted_agg",
    # -- round-9 additions (first driver rows whenever the window reaches
    # them; everything above outranks them because it is re-proof of
    # already-shipped code, these two are new and locally parity-green) --
    "q_ann_ivfpq",
    "q_vocab_coverage",
    "q_ann_ivfpq_recall",
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
