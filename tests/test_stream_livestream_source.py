"""S7/E3 as a REAL Structured Streaming source: maxitem offsets, SkipPolicy
in offset resolution, checkpointed kill/resume, convergence with update().

Reference semantics: hnarchive.py:162-195 (livestream loop + the :165-189
dead-id race policy).  Each test 'run' is a fresh streaming query resuming
from the same checkpoint — the kill-and-resume cycle.
"""

from __future__ import annotations

import json
import os

import pytest

from hnarchive_spark.sources.hn_api import MockTransport
from hnarchive_spark.sources.items_store import ItemsStore
from hnarchive_spark.streaming.livestream import update
from hnarchive_spark.streaming.sink import stream_merge_into_store
from hnarchive_spark.streaming.source import HNLivestreamReader, livestream_readstream

T0 = 1_700_000_000


def wire(i):
    return {"id": i, "type": "story", "by": f"u{i}", "time": T0 + i, "score": i}


def _world(path, ids, max_id):
    json.dump(
        {"items": {str(i): wire(i) for i in ids}, "max_id": max_id},
        open(path, "w"),
    )


def _drain(spark, store, world, ckpt, retrieved_at):
    df = livestream_readstream(
        spark, mock_data=world, skip_margin=3, miss_threshold=2
    )
    q = stream_merge_into_store(df, store, ckpt, retrieved_at=retrieved_at)
    assert q.awaitTermination(180), "stream did not drain in time"


def _ids(store):
    return sorted(r.id for r in store.read().select("id").collect())


def _last_offset(ckpt):
    offdir = os.path.join(ckpt, "offsets")
    last = sorted((n for n in os.listdir(offdir) if n.isdigit()), key=int)[-1]
    return json.loads(open(os.path.join(offdir, last)).read().splitlines()[-1])


def test_livestream_source_restart_skip_policy_and_update_convergence(
    spark, tmp_path
):
    world = str(tmp_path / "world.json")
    ckpt = str(tmp_path / "ckpt")
    store = ItemsStore(spark, str(tmp_path / "store"))

    # run A: initial drain
    _world(world, range(1, 6), 5)
    _drain(spark, store, world, ckpt, T0 + 100)
    assert _ids(store) == [1, 2, 3, 4, 5]

    # run B (kill+resume): head advances past a hole at id 6
    _world(world, list(range(1, 6)) + [7, 8], 8)
    _drain(spark, store, world, ckpt, T0 + 200)
    assert _ids(store) == [1, 2, 3, 4, 5, 7, 8]
    off = _last_offset(ckpt)
    assert off["head"] == 8 and json.loads(off["pending"]) == {"6": 1}

    # convergence: a fresh store caught up via update() on the same world
    # reaches the same item set (6 is null upstream for both paths)
    t = MockTransport(items={i: wire(i) for i in list(range(1, 6)) + [7, 8]}, max_id=8)
    store2 = ItemsStore(spark, str(tmp_path / "store2"))
    update(store2, t, parallelism=2, retrieved_at=T0 + 200)
    assert _ids(store2) == _ids(store)

    # run C: second miss for 6, but head (8) is within the 3-id margin of 9
    _drain(spark, store, world, ckpt, T0 + 300)
    assert json.loads(_last_offset(ckpt)["pending"]) == {"6": 2}

    # run D: head jumps to 10 -> 6 has >=2 misses AND head > 6+3: permanent
    # skip applied IN offset resolution; 9 becomes the new pending id
    _world(world, list(range(1, 6)) + [7, 8, 10], 10)
    _drain(spark, store, world, ckpt, T0 + 400)
    off = _last_offset(ckpt)
    assert json.loads(off["pending"]) == {"9": 1}
    assert 10 in _ids(store) and 6 not in _ids(store)

    # run E: 6 materializes upstream anyway -> stays skipped (never re-asked);
    # 9 materializes while still pending -> ingested (the :171-177 race)
    _world(world, list(range(1, 11)), 10)
    _drain(spark, store, world, ckpt, T0 + 500)
    assert 9 in _ids(store)
    assert 6 not in _ids(store)
    assert json.loads(_last_offset(ckpt)["pending"]) == {}


def test_reader_transitions_pure(tmp_path):
    """Driver-side offset math without Spark: read() rolls head/pending/batch
    exactly like the livestream loop."""
    world = str(tmp_path / "w.json")
    _world(world, [1, 2, 4], 4)
    r = HNLivestreamReader(
        {"mock_data": world, "skip_margin": "2", "miss_threshold": "1"}
    )
    assert r.initialOffset() == {"head": 0, "pending": "{}", "batch": "[]"}

    rows, end = r.read(r.initialOffset())
    assert [json.loads(p)["id"] for (p,) in rows] == [1, 2, 4]
    # 3 missed once (threshold met) but head 4 <= 3+2 -> still pending
    assert end["head"] == 4 and json.loads(end["pending"]) == {"3": 1}

    # replay is deterministic from the recorded batch id list
    replay = [json.loads(p)["id"] for (p,) in r.readBetweenOffsets({}, end)]
    assert replay == [1, 2, 4]

    # head jumps beyond the margin -> 3 is dropped for good
    r.transport.items.update({6: wire(6)})
    r.transport.max_id = 6
    rows, end2 = r.read(end)
    assert [json.loads(p)["id"] for (p,) in rows] == [6]
    assert json.loads(end2["pending"]) == {"5": 1}  # new hole at 5; 3 gone
    assert end2["head"] == 6
