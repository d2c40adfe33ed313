"""U1 merge-matrix unit tests (SURVEY §5.2): every coalesce column keeps the
old value when the incoming one is NULL; overwrite columns take the incoming
value even when NULL; inserts pass through; in-batch duplicates fold in
arrival order."""

from __future__ import annotations

from hnarchive_spark.operators.merge import COALESCE_COLS, OVERWRITE_COLS, merge_items
from hnarchive_spark.plans import fixtures as FX


def _merge(spark, base_rows, upd_rows):
    base = FX.items_df(spark, base_rows)
    upd = FX.items_df_with_seq(spark, upd_rows)
    out = merge_items(base, upd, seq_col="seq")
    return {r["id"]: r.asDict() for r in out.collect()}


def test_coalesce_columns_keep_old_on_null(spark):
    base = [FX._item(1, "story", author="alice", text="t", poll=9, url="u",
                     score=5, title="T", time=FX.T0, retrieved=FX.T0 + 1)]
    # incoming row has ALL coalesce columns null
    upd = [FX._item(1, "story", time=FX.T0, retrieved=FX.T0 + 2)]
    row = _merge(spark, base, upd)[1]
    for c in COALESCE_COLS:
        assert row[c] == base[0][c], c
    assert row["retrieved"] == FX.T0 + 2


def test_coalesce_columns_take_new_when_present(spark):
    base = [FX._item(1, "story", author="alice", score=5, title="Old",
                     time=FX.T0, retrieved=FX.T0 + 1)]
    upd = [FX._item(1, "story", author="bob", score=50, title="New",
                    time=FX.T0, retrieved=FX.T0 + 2)]
    row = _merge(spark, base, upd)[1]
    assert (row["author"], row["score"], row["title"]) == ("bob", 50, "New")


def test_overwrite_columns_take_null(spark):
    """parent/descendants overwrite even with NULL (hnarchive.py:239,246)."""
    base = [FX._item(1, "comment", parent=99, descendants=7, author="a",
                     time=FX.T0, retrieved=FX.T0 + 1)]
    upd = [FX._item(1, "comment", time=FX.T0, retrieved=FX.T0 + 2)]
    row = _merge(spark, base, upd)[1]
    assert row["parent"] is None and row["descendants"] is None
    assert row["author"] == "a"  # coalesce col survives


def test_insert_new_and_keep_untouched(spark):
    base = [FX._item(1, time=FX.T0, author="keepme", retrieved=FX.T0 + 1)]
    upd = [FX._item(2, time=FX.T0 + 5, author="new", retrieved=FX.T0 + 2)]
    merged = _merge(spark, base, upd)
    assert set(merged) == {1, 2}
    assert merged[1]["author"] == "keepme"
    assert merged[2]["author"] == "new"


def test_duplicate_ids_fold_in_arrival_order(spark):
    upd = [
        FX._item(7, author="first", title="A", score=1, time=FX.T0, retrieved=FX.T0),
        FX._item(7, score=2, time=FX.T0, retrieved=FX.T0 + 1),  # author/title absent
        FX._item(7, author="third", time=FX.T0, retrieved=FX.T0 + 2),  # score absent
    ]
    row = _merge(spark, [], upd)[7]
    # last non-null wins for coalesce cols; plain last wins for overwrite
    assert row["author"] == "third"
    assert row["title"] == "A"
    assert row["score"] == 2
    assert row["retrieved"] == FX.T0 + 2


def test_policy_partition_is_total(spark):
    from hnarchive_spark.schema import ITEMS_SCHEMA

    cols = {f.name for f in ITEMS_SCHEMA.fields}
    assert set(COALESCE_COLS) | set(OVERWRITE_COLS) | {"id"} == cols
    assert not (set(COALESCE_COLS) & set(OVERWRITE_COLS))
