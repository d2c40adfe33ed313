"""Exhaustive U1 policy check: one merge over 64 base rows x 64 update rows,
where update row i has present/absent mask i over the six coalesce columns.
Expected output computed by an independent pure-Python fold implementing the
reference's insert_item semantics (hnarchive.py:203-253)."""

from __future__ import annotations

from itertools import product

from hnarchive_spark.operators.merge import COALESCE_COLS, merge_items
from hnarchive_spark.plans import fixtures as FX

T0 = FX.T0
VALS = {"author": "au", "text": "tx", "poll": 77, "url": "uu", "score": 9, "title": "tt"}


def _python_reference_merge(base_row: dict, upd_row: dict) -> dict:
    """The reference's UPDATE branch: coalesce cols keep old when incoming
    None; everything else (incl. parent/descendants) takes incoming."""
    out = dict(upd_row)
    for c in COALESCE_COLS:
        if upd_row[c] is None:
            out[c] = base_row[c]
    return out


def test_all_64_presence_masks(spark):
    base_rows, upd_rows = [], []
    for i, mask in enumerate(product([0, 1], repeat=len(COALESCE_COLS))):
        rid = 1000 + i
        base_rows.append(
            FX._item(rid, "story", time=T0, retrieved=T0 + 1,
                     **{c: (f"old_{VALS[c]}" if isinstance(VALS[c], str) else VALS[c] * 1000)
                        for c in COALESCE_COLS})
        )
        present = {
            c: (f"new_{VALS[c]}" if isinstance(VALS[c], str) else VALS[c])
            for c, bit in zip(COALESCE_COLS, mask)
            if bit
        }
        upd_rows.append(FX._item(rid, "story", time=T0 + 5, retrieved=T0 + 9, **present))

    base = FX.items_df(spark, base_rows)
    upd = FX.items_df_with_seq(spark, upd_rows)
    got = {r["id"]: r.asDict() for r in merge_items(base, upd, seq_col="seq").collect()}

    for b, u in zip(base_rows, upd_rows):
        expect = _python_reference_merge(b, u)
        actual = got[b["id"]]
        for c in FX.ITEM_COLS:
            assert actual[c] == expect[c], (b["id"], c, actual[c], expect[c])
