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
_ROTATION_BUILT_FOR_ROUND = 15

_VERIFY_FIRST = [
    # Round-15 rotation, generated MECHANICALLY as
    # tools/rotation_report.rotation_order(before_round=15) prefix and
    # locked by tests/test_rotation_consistency.py: the never-driver-
    # verified queries registered this round first (the BPE encoder
    # closing the tokenizer induce->apply loop, the curation-funnel
    # loss accounting, the four-stage URL-first curation pipeline, the
    # per-leg hybrid recall arms, the exact-refine hybrid rerank, the
    # pack-on-BPE-output composition and the URL-canonicalization
    # dedup), then the oldest r10-green names filling the 50-slot
    # budget; ascending staleness, ALPHABETICAL tiebreak.  The second
    # r15 session registered five MORE never-verified names (the
    # curation funnel, the exact-refine rerank, the rerank top-1 arms,
    # the n_probe sweep, the vec-store fetch), which displace the r10
    # block's tail (q_ann_clustered_recall_plain, q_skew_salted_agg,
    # q_staleness, q_vocab_coverage, q_window_sort) past the budget —
    # so the staleness floor rises to r11 one round later than VERDICT
    # r14 #7 projected: the mechanical never-verified-first policy
    # deliberately prioritizes a new operator's FIRST driver check over
    # an old operator's re-check (every oracled query is still parity-
    # swept against DuckDB on every pytest run regardless).
    "q_ann_nprobe_sweep",
    "q_bpe_encode",
    "q_curation_funnel",
    "q_curation_pipeline_url",
    "q_hybrid_recall_arms",
    "q_hybrid_rerank",
    "q_pack_sequences_bpe",
    "q_rerank_top1_fix",
    "q_url_dedup",
    "q_vec_store_fetch",
    "q_ann_ivfpq_residual",
    "q_ann_pq_search",
    "q_attribution_last_touch",
    "q_bigram_lm",
    "q_bm25_append",
    "q_bm25_indexed",
    "q_bm25_lite",
    "q_chunk_documents",
    "q_derived_pred",
    "q_distinct_count",
    "q_embed_dim_audit",
    "q_funnel",
    "q_gap_fill",
    "q_global_index",
    "q_hard_negatives",
    "q_heavy_hitters_exact",
    "q_idle_rich_customers",
    "q_inverted_index",
    "q_join_anti",
    "q_join_semi",
    "q_json_extract",
    "q_kcore_peel",
    "q_knn_classify",
    "q_length_histogram",
    "q_link_prediction",
    "q_market_share",
    "q_mix_temperature",
    "q_orders_per_customer_dist",
    "q_pagerank",
    "q_pagerank_weighted",
    "q_paragraph_dedup",
    "q_percentiles_scalable",
    "q_pii_redact",
    "q_pivot_status",
    "q_power_iteration",
    "q_pq_codes",
    "q_range_join",
    "q_recency_weighted",
    "q_self_join",
    "q_setops",
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
