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
_ROTATION_BUILT_FOR_ROUND = 16

_VERIFY_FIRST = [
    # Round-16 rotation, generated MECHANICALLY as
    # tools/rotation_report.rotation_order(before_round=16) prefix and
    # locked by tests/test_rotation_consistency.py: the four queries
    # registered this round first (the iterative BPE induction closing
    # VERDICT r15 #2, the recall@10-after-rerank arm, the BPE-unit
    # token-budget selection, and the blessed indexed+capped SemDeDup
    # production probe), then the FULL r10
    # verification floor (q_skew_salted_agg, q_staleness,
    # q_vocab_coverage, q_window_sort — the four stragglers VERDICT r15
    # #1 requires this round), then the r11 block filling the 50-slot
    # budget; ascending staleness, ALPHABETICAL tiebreak.  With this
    # window green the staleness floor over CORRECTNESS_r01-r16 rises
    # to r11.
    "q_bpe_train",
    "q_rerank_recall10",
    "q_select_token_budget_bpe",
    "q_semdedup_indexed_capped",
    "q_skew_salted_agg",
    "q_staleness",
    "q_vocab_coverage",
    "q_window_sort",
    "q_ann_clustered_recall_plain",
    "q_ann_clustered_recall_residual",
    "q_ann_ivf",
    "q_ann_ivf_append",
    "q_ann_ivf_indexed",
    "q_ann_ivf_probe2",
    "q_ann_ivfpq_rebuild",
    "q_ann_lsh",
    "q_ann_lsh_indexed",
    "q_ann_lsh_multi",
    "q_ann_topk",
    "q_association_rules",
    "q_autocorr_lag1",
    "q_benford_audit",
    "q_bm25_compacted",
    "q_changepoint_cusum",
    "q_class_weights",
    "q_containment_dup",
    "q_corpus_datacard",
    "q_corr_rational",
    "q_csv_roundtrip",
    "q_decile_binning",
    "q_decile_binning_scalable",
    "q_dedup_canonical",
    "q_dedup_minhash",
    "q_dedup_ngram",
    "q_dedup_ngram_maxdf",
    "q_dow_profile",
    "q_embed_dup",
    "q_embed_dup_capped",
    "q_expectations",
    "q_gini_revenue",
    "q_group_kfold",
    "q_histogram_equiwidth",
    "q_join_full_outer",
    "q_jsonl_roundtrip",
    "q_retention_cohorts",
    "q_revenue_trend",
    "q_semdedup",
    "q_sessionize",
    "q_shard_assignment",
    "q_shard_assignment_scalable",
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
