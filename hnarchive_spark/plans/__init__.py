from hnarchive_spark.plans.registry import REGISTRY, QuerySpec, all_queries, all_oracles

__all__ = ["REGISTRY", "QuerySpec", "all_queries", "all_oracles"]
