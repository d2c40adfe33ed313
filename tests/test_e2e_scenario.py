"""End-to-end reference-workflow scenario (SURVEY §5.3): one synthetic HN
world driven through backfill -> livestream -> volatile re-crawl -> render,
asserting the final store and page state after each phase."""

from __future__ import annotations

import pytest

from hnarchive_spark.functions.render import render_page
from hnarchive_spark.sources.hn_api import MockTransport
from hnarchive_spark.sources.items_store import ItemsStore
from hnarchive_spark.streaming.livestream import SkipPolicy, livestream_batches, update, update_items

T0 = 1_700_000_000


def w(id, type="comment", **kw):
    d = {"id": id, "type": type, "time": T0 + id * 10}
    d.update(kw)
    return d


@pytest.fixture
def world():
    return {
        1: w(1, "story", by="alice", title="Launch <p>day", score=10, descendants=3, url="https://x"),
        2: w(2, by="bob", parent=1, text="nice<p>work"),
        3: w(3, by="carol", parent=2, text="agreed"),
        4: w(4, by="dave", parent=1, text="hmm"),
        5: w(5, "poll", by="poller", title="Best lang?", score=3, descendants=0),
        6: w(6, "pollopt", poll=5, text="python", score=2),
        7: w(7, "pollopt", poll=5, text="scala", score=1),
    }


def test_full_workflow(spark, tmp_path, world):
    store = ItemsStore(spark, str(tmp_path / "store"))
    t = MockTransport(items=dict(world), max_id=7)

    # phase 1: bounded backfill to fixpoint (E1/E2)
    update(store, t, parallelism=2, retrieved_at=T0 + 100)
    assert store.count() == 7 and store.latest_id() == 7

    # phase 2: livestream — new comment arrives, id 9 is dead (skipped only
    # after misses + margin), id 10 appears (S7/E3)
    t.items[8] = w(8, by="erin", parent=4, text="late reply")
    t.max_id = 8
    policy = SkipPolicy(skip_margin=2, miss_threshold=2)  # tightened for test
    gen = livestream_batches(store, t, policy=policy, max_polls=8, retrieved_at=T0 + 200)
    next(gen)
    assert store.latest_id() == 8
    t.items[10] = w(10, by="frank", parent=1, text="even later")
    t.max_id = 10  # 9 never materializes
    next(gen)  # miss #1 for id 9; head (10) still within the margin
    # head advances past id 9 + margin -> dead-id skip can now trigger
    t.items[11] = w(11, by="gina", parent=1, text="tail")
    t.items[12] = w(12, by="hal", parent=1, text="tail2")
    t.max_id = 12
    skipped = []
    for _ in range(3):
        _, _, s = next(gen)
        skipped += s
    assert 9 in skipped
    ids = {r["id"] for r in store.read().collect()}
    assert 10 in ids and 9 not in ids

    # phase 3: volatile re-crawl (E4) — scores settle upstream
    t.items[1]["score"] = 99
    t.items[1]["descendants"] = 5
    update_items(store, t, days=30, now=T0 + 300)
    row = {r["id"]: r.asDict() for r in store.read().collect()}[1]
    assert row["score"] == 99 and row["descendants"] == 5

    # phase 4: render (E5/G1/G2/F1/F8/F9)
    page = render_page(store.read(), 1)
    assert 'class="story" id="1"' in page
    assert page.index('id="2"') < page.index('id="3"')  # nesting
    assert "<p>nice</p><p>work</p>" in page  # F1 repair
    assert 'id="10"' in page  # livestreamed comment joined the tree
    poll_page = render_page(store.read(), 5)
    assert page and 'id="6"' in poll_page and 'id="7"' in poll_page

    # deletion upstream retains data (U2)
    t.items[2] = None
    update_items(store, t, days=30, now=T0 + 400)
    row2 = {r["id"]: r.asDict() for r in store.read().collect()}[2]
    assert row2["text"] == "nice<p>work"
