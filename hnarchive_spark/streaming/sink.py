"""Streaming merge sink (K2's true streaming form, SURVEY §2.2): a
Structured Streaming query whose every micro-batch is one idempotent MERGE
into the versioned items store via ``foreachBatch``.

This is the production shape of the reference's insert_items loop: the
commit cadence is the trigger cadence, restart safety comes from the
checkpoint (source offsets) + idempotent merge (re-merging a batch is a
no-op by id), and the sink is pluggable (a Delta deployment would call
``MERGE INTO`` here instead of the parquet-store rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from hnarchive_spark.schema import normalize_wire, parse_wire_json
from hnarchive_spark.sources.items_store import ItemsStore


def stream_merge_into_store(
    wire_stream: DataFrame,
    store: ItemsStore,
    checkpoint_dir: str,
    retrieved_at: int,
    available_now: bool = True,
):
    """Wire-JSON payload stream -> normalize -> per-batch merge.

    ``wire_stream`` must have a string column ``payload`` (the raw API
    JSON). Returns the started StreamingQuery; with ``available_now`` the
    caller awaits termination for drain-then-stop (the `update` semantics).
    """
    normalized = normalize_wire(parse_wire_json(wire_stream), retrieved_at=retrieved_at)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch hands us a bounded DataFrame; one store commit per
        # micro-batch (hnarchive.py:255-262's commit_period -> trigger size)
        if batch_df.isEmpty():
            return
        store.merge_batch(batch_df)

    writer = normalized.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
