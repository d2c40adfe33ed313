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
_ROTATION_BUILT_FOR_ROUND = 19

_VERIFY_FIRST = [
    # Round-19 rotation, generated MECHANICALLY as
    # tools/rotation_report.rotation_order(before_round=19) prefix and
    # locked by tests/test_rotation_consistency.py.  This round the
    # policy gains a FRONT_LOAD block (VERDICT r18 #3): the 24 queries of
    # every family the r18/r19 optimization rounds touched come FIRST
    # (kmeans/PQ/IVF-PQ map-side argmin, SemDeDup x5, pagerank, the
    # rerank arms, bpe_train, the embed_dup battery, the store
    # changelog, and the minhash probe trio — including the r18
    # verdict's three bench watch entries), so CORRECTNESS_r19
    # oracle-checks the optimized code paths; the remaining 26 slots
    # fill by the standing policy — ascending latest-green driver round,
    # ALPHABETICAL tiebreak (the r13/r14 staleness floor).  Mid-round the
    # FRONT_LOAD grew by the three further queries the r19 driver-side
    # probe-routing change touches (q_ann_ivf_indexed, q_ann_ivfpq_rebuild,
    # q_hybrid_search_rrf_indexed), displacing the three stalest fill
    # slots (q_embed_quantize, q_filtered_agg, q_fix_ptags).
    "q_ann_ivf_indexed",
    "q_ann_ivfpq",
    "q_ann_ivfpq_indexed",
    "q_ann_ivfpq_rebuild",
    "q_ann_ivfpq_residual",
    "q_bpe_merge_pairs",
    "q_bpe_train",
    "q_dedup_minhash",
    "q_dedup_minhash_incremental",
    "q_dedup_minhash_indexed",
    "q_embed_dup",
    "q_embed_dup_capped",
    "q_hybrid_recall_arms",
    "q_hybrid_rerank",
    "q_hybrid_search_rrf_indexed",
    "q_kmeans_assign",
    "q_minhash_accuracy",
    "q_pagerank",
    "q_pq_codes",
    "q_rerank_recall10",
    "q_rerank_top1_fix",
    "q_semdedup",
    "q_semdedup_capped",
    "q_semdedup_incremental",
    "q_semdedup_indexed",
    "q_semdedup_indexed_capped",
    "q_store_changelog",
    "q_sample_weighted",
    "q_schema_evolution",
    "q_shipmode_priority",
    "q_shipping_priority",
    "q_small_qty_revenue",
    "q_stream_dedup_bounded",
    "q_stream_stream_join",
    "q_text_quality",
    "q_text_stats",
    "q_tfidf_top_terms",
    "q_top_supplier",
    "q_topk",
    "q_topk_per_group",
    "q_volume_shipping",
    "q_window_rank",
    "q_ann_int8",
    "q_ann_int8_fidelity",
    "q_ann_ivfpq_append",
    "q_ann_ivfpq_recall",
    "q_curation_pipeline",
    "q_dedup_simhash",
    "q_display_date",
    "q_doc_fingerprint",
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
