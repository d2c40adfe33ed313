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
_ROTATION_BUILT_FOR_ROUND = 14

_VERIFY_FIRST = [
    # Round-14 rotation, generated MECHANICALLY as
    # tools/rotation_report.rotation_order(before_round=14) prefix and
    # locked by tests/test_rotation_consistency.py: the never-driver-
    # verified queries registered this round first (the composed
    # curation pipeline, the SemDeDup hot-cluster cap and incremental
    # batch probe, the persisted-index hybrid retrieval and its recall
    # harness, the quality classifier),
    # then the ENTIRE r9-green block (the staleness floor rises to r10
    # after this round), then the oldest r10 names; ascending staleness,
    # ALPHABETICAL tiebreak.
    "q_curation_pipeline",
    "q_hybrid_recall",
    "q_hybrid_search_rrf_indexed",
    "q_quality_score",
    "q_semdedup_capped",
    "q_semdedup_incremental",
    "q_dedup_simhash",
    "q_display_date",
    "q_doc_fingerprint",
    "q_embed_quantize",
    "q_filtered_agg",
    "q_fix_ptags",
    "q_having",
    "q_kmeans_assign",
    "q_lang_id",
    "q_map_funcs",
    "q_max_key",
    "q_merge_coalesce",
    "q_multimodal_features",
    "q_multimodal_frames",
    "q_multimodal_meta",
    "q_multimodal_resize",
    "q_orc_roundtrip",
    "q_pack_sequences",
    "q_pack_sequences_sharded",
    "q_percentiles",
    "q_regexp_funcs",
    "q_session_window_builtin",
    "q_setops_all",
    "q_split_train_eval",
    "q_stratified_sample",
    "q_stream_dedup",
    "q_stream_dim_join",
    "q_stream_sessionize",
    "q_stream_sliding",
    "q_stream_tumbling",
    "q_string_funcs",
    "q_token_count",
    "q_tree_closure",
    "q_unpivot",
    "q_window_funcs",
    "q_window_range_frame",
    "q_winnow_fingerprint",
    "q_wire_normalize",
    "q_ann_int8",
    "q_ann_int8_fidelity",
    "q_ann_ivfpq",
    "q_ann_ivfpq_append",
    "q_ann_ivfpq_indexed",
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
    from hnarchive_spark.plans import analytics, curation, graph_ml, search, tpch_extra  # noqa: F401

    _LOADED = True
