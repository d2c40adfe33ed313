"""Physical-layout checks on the items store (SURVEY §1.4): the type
partition must prune, and the id sort must surface in parquet min-max
stats (point lookups skip files)."""

from __future__ import annotations

from hnarchive_spark.plans import fixtures as FX
from hnarchive_spark.sources.items_store import ItemsStore


def test_type_partition_pruning(spark, tmp_path):
    store = ItemsStore(spark, str(tmp_path / "store"))
    store.merge_batch(FX.items_df_with_seq(spark, FX.TREE_ITEMS), seq_col="seq")

    df = store.read().filter("type = 'comment'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition filter must actually mention type, i.e. pruning applies
    assert "type" in plan.split("PartitionFilters")[1][:200]
    assert df.count() == sum(1 for r in FX.TREE_ITEMS if r["type"] == "comment")


def test_time_travel_and_vacuum(spark, tmp_path):
    import pytest

    store = ItemsStore(spark, str(tmp_path / "store"), keep_versions=1)
    store.merge_batch(FX.items_df_with_seq(spark, FX.MERGE_BASE), seq_col="seq")
    v1 = store._current_version()
    n1 = store.count()
    store.merge_batch(FX.items_df_with_seq(spark, FX.MERGE_UPDATES), seq_col="seq")
    # past snapshot still readable within the retention window
    assert store.read(version=v1).count() == n1
    assert store.count() > n1
    # a third commit vacuums v1 (keep_versions=1 -> current + 1 prior)
    store.merge_batch(FX.items_df_with_seq(spark, FX.MERGE_UPDATES), seq_col="seq")
    assert v1 not in store.versions()
    with pytest.raises(ValueError, match="not retained"):
        store.read(version=v1)


def test_store_roundtrip_schema_and_versions(spark, tmp_path):
    store = ItemsStore(spark, str(tmp_path / "store"))
    store.merge_batch(FX.items_df_with_seq(spark, FX.MERGE_BASE), seq_col="seq")
    v1 = store._current_version()
    store.merge_batch(FX.items_df_with_seq(spark, FX.MERGE_UPDATES), seq_col="seq")
    v2 = store._current_version()
    assert v2 == v1 + 1
    out = store.read()
    # partition column round-trips; full item schema present
    assert set(FX.ITEM_COLS) <= set(out.columns)
    assert store.latest_id() == max(r["id"] for r in FX.MERGE_UPDATES)
