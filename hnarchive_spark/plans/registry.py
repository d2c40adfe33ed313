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


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.spark for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


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
