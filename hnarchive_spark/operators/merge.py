"""The merge engine — the reference's core operator (SURVEY.md §2.3, U1/U2).

Reference semantics (hnarchive.py:203-253, `insert_item`):

* key: ``id``;
* if the id is new -> INSERT the full normalized row;
* if it exists -> UPDATE where six columns keep the old value when the new
  payload doesn't carry one — ``author, text, poll, url, score, title``
  (``data.get(k, existing[k])``) — while ``deleted, type, time, dead,
  retrieved`` are always overwritten and ``parent, descendants`` are
  overwritten **even with NULL** (``data.get(k, None)``);
* an item whose API response is null/tombstone never reaches the merge
  (filtered by schema.normalize_wire), so deleted items keep their old row
  (U2, README.md:18).

Note on absent-vs-null: the reference distinguishes a *missing* JSON key from
an explicit null.  After ``from_json`` Spark cannot (both become NULL), so the
engine's contract is ``coalesce(new, old)`` for the six keep-columns — the
Firebase API never sends explicit nulls for them, making the two readings
equivalent on real data.

Spark-first design: no per-row probe loop.  A batch merge is ONE full outer
join on the key (shuffle or broadcast chosen by Catalyst/AQE) plus a column
spec generated from the policy table below — the declarative equivalent of
Delta's ``MERGE INTO ... WHEN MATCHED THEN UPDATE SET col=coalesce(...)``.
At 100 TB the store would be a Delta/Iceberg table and this exact column spec
becomes the MERGE clause; the join rewrite here is the engine-native fallback
that works on plain parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Columns that keep the stored value when the incoming one is NULL.
COALESCE_COLS = ("author", "text", "poll", "url", "score", "title")
# Columns the incoming row always wins, even when NULL
# (parent/descendants: hnarchive.py:239,246 pass default None).
OVERWRITE_COLS = (
    "deleted",
    "type",
    "time",
    "dead",
    "parent",
    "descendants",
    "retrieved",
    "age_at_retrieval",
)

KEY = "id"


def collapse_batch(updates: DataFrame, seq_col: str | None = None) -> DataFrame:
    """Collapse duplicate ids inside one batch to a single row per id.

    The reference applies batch rows one at a time in arrival order, so a
    later duplicate coalesces against the state left by the earlier one.
    Distributed equivalent: order rows per id by ``seq_col`` (explicit batch
    sequence; required for deterministic semantics when duplicates exist) and
    take, per column, the last non-null value for coalesce columns and the
    plain last value for overwrite columns — exactly the fold the serial loop
    computes.
    """
    cols = [c for c in updates.columns if c != seq_col]
    if seq_col is None:
        seq_col = "_seq"
        updates = updates.withColumn(seq_col, F.monotonically_increasing_id())
    w = (
        Window.partitionBy(KEY)
        .orderBy(F.col(seq_col))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    picked = [
        (
            F.last(c, ignorenulls=(c in COALESCE_COLS)).over(w).alias(c)
            if c != KEY
            else F.col(KEY)
        )
        for c in cols
    ]
    dedup = Window.partitionBy(KEY).orderBy(F.col(seq_col).desc())
    return (
        updates.select(*picked, F.row_number().over(dedup).alias("_rn"))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_items(current: DataFrame, updates: DataFrame, seq_col: str | None = None) -> DataFrame:
    """Batch upsert with the reference's per-column policy.

    ``current`` and ``updates`` must both have the normalized items schema
    (schema.ITEMS_SCHEMA order); ``updates`` may contain duplicate ids if
    ``seq_col`` gives their arrival order.

    Returns the merged table with ``current``'s column order.
    """
    out_cols = current.columns
    batch = collapse_batch(updates, seq_col=seq_col)

    cur = current.alias("t")
    upd = batch.alias("s")
    joined = cur.join(upd, F.col(f"t.{KEY}") == F.col(f"s.{KEY}"), "full_outer")

    matched = F.col(f"s.{KEY}").isNotNull() & F.col(f"t.{KEY}").isNotNull()
    insert_only = F.col(f"t.{KEY}").isNull()

    def pick(c: str):
        t, s = F.col(f"t.{c}"), F.col(f"s.{c}")
        if c == KEY:
            return F.coalesce(F.col(f"t.{KEY}"), F.col(f"s.{KEY}")).alias(KEY)
        if c in COALESCE_COLS:
            merged = F.coalesce(s, t)
        else:  # overwrite columns: incoming wins even when NULL
            merged = s
        return (
            F.when(matched, merged).when(insert_only, s).otherwise(t).alias(c)
        )

    return joined.select(*[pick(c) for c in out_cols])
