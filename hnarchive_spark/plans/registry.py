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
_ROTATION_BUILT_FOR_ROUND = 18

_VERIFY_FIRST = [
    # Round-18 rotation, generated MECHANICALLY as
    # tools/rotation_report.rotation_order(before_round=18) prefix and
    # locked by tests/test_rotation_consistency.py: the six queries
    # registered this round first (the token-id export + sequence
    # assembly, VERDICT r17 #6, and the FFD/NFD packing / waste audit /
    # doc-bounds additions), then the FULL r12 verification floor (the
    # 10-query block VERDICT r17 #4 names), then the r13 block filling
    # the 50-slot budget; ascending staleness, ALPHABETICAL tiebreak.
    # With this window green the staleness floor over
    # CORRECTNESS_r01-r18 rises to r13 (the four tail r13 names the
    # additions displaced — q_sample_weighted, q_schema_evolution,
    # q_semdedup_indexed, q_shipmode_priority — stay r13-green, so the
    # floor claim holds).
    "q_bpe_encode_ids",
    "q_pack_sequences_ffd",
    "q_pack_sequences_nfd",
    "q_pack_token_ids",
    "q_pack_waste",
    "q_seq_doc_bounds",
    "q_substring_dedup_clean",
    "q_substring_dedup_incremental",
    "q_substring_dedup_indexed",
    "q_subtree_agg",
    "q_time_split_embargo",
    "q_triangle_count",
    "q_url_parse",
    "q_winsorize",
    "q_wow_growth",
    "q_zorder_box",
    "q_array_funcs",
    "q_asof_join",
    "q_asof_join_forward",
    "q_asof_join_inner",
    "q_boilerplate_ngrams",
    "q_children_sorted",
    "q_contamination_indexed",
    "q_corpus_drift",
    "q_correlated_subquery",
    "q_date_funcs",
    "q_dedup_clusters",
    "q_dedup_exact",
    "q_dedup_incremental",
    "q_dedup_minhash_incremental",
    "q_dedup_minhash_indexed",
    "q_dsir_weights_bigram",
    "q_hybrid_search_rrf",
    "q_large_orders",
    "q_lateral_join",
    "q_link_prediction_capped",
    "q_lpa_communities",
    "q_mix_equalize",
    "q_multimodal_dedup",
    "q_multimodal_phash_dup",
    "q_null_handling",
    "q_pandas_udaf_weighted",
    "q_pandas_udf_score",
    "q_point_lookup",
    "q_priority_pipeline",
    "q_promo_revenue",
    "q_quality_repetition",
    "q_returned_items",
    "q_running_sum",
    "q_sample_hash",
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
