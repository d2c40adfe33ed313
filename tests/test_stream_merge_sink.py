"""foreachBatch streaming merge: wire-JSON files stream into the versioned
store; a second drop of files (including a re-statement of an existing id)
resumes from the checkpoint and merges with the coalesce policy."""

from __future__ import annotations

import json

from hnarchive_spark.sources.items_store import ItemsStore
from hnarchive_spark.streaming.sink import stream_merge_into_store

T0 = 1_700_000_000


def _write_wire(spark, path, items):
    rows = [(json.dumps(d),) for d in items]
    spark.createDataFrame(rows, "payload string").coalesce(1).write.mode("append").text(path)


def _run(spark, src, store, ckpt, t):
    stream = spark.readStream.format("text").load(src).withColumnRenamed("value", "payload")
    q = stream_merge_into_store(stream, store, ckpt, retrieved_at=t)
    q.awaitTermination()


def test_streaming_merge_with_restart(spark, tmp_path):
    src = str(tmp_path / "wire")
    ckpt = str(tmp_path / "ckpt")
    store = ItemsStore(spark, str(tmp_path / "store"))

    _write_wire(
        spark,
        src,
        [
            {"id": 1, "type": "story", "by": "alice", "time": T0, "title": "A", "score": 1},
            {"id": 2, "type": "comment", "by": "bob", "parent": 1, "time": T0 + 5, "text": "hi"},
            {"id": 3, "type": "story"},  # tombstone: filtered
        ],
    )
    _run(spark, src, store, ckpt, T0 + 100)
    assert store.count() == 2 and store.latest_id() == 2

    # new files while the query is down; id 1 re-stated with score only
    _write_wire(
        spark,
        src,
        [
            {"id": 1, "type": "story", "time": T0, "score": 50},  # title absent -> kept
            {"id": 4, "type": "comment", "by": "eve", "parent": 2, "time": T0 + 9, "text": "x"},
        ],
    )
    _run(spark, src, store, ckpt, T0 + 200)
    rows = {r["id"]: r.asDict() for r in store.read().collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1]["score"] == 50 and rows[1]["title"] == "A"  # coalesce policy
    assert rows[1]["retrieved"] == T0 + 200
    # checkpoint resumed: re-running with no new data changes nothing
    v = store._current_version()
    _run(spark, src, store, ckpt, T0 + 300)
    assert store._current_version() == v  # empty batch -> no commit
