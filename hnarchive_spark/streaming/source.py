"""A real Structured Streaming source for HN livestream ingestion (S7/E3).

The reference's livestream is an always-on loop: poll maxitem, fetch the gap,
re-poll unresolved ids, permanently skip dead ones (hnarchive.py:162-195).
Here that loop IS a Spark micro-batch source, implemented with the public
Python DataSource API (``pyspark.sql.datasource``):

* ``latestOffset`` (the read transition) advances to ``transport.max_item()``
  — the external offset is HN's own maxitem counter;
* a micro-batch's candidate ids = unresolved pending ids + the new
  ``(head, maxitem]`` range;
* the SkipPolicy (50-id margin / 5-miss threshold, the :165-189 race) is
  applied IN offset resolution, and its miss-count state rides INSIDE the
  checkpointed offset — so a restart resumes with exactly the pending set
  and head it had committed, no side files;
* ``readBetweenOffsets`` replays a committed batch deterministically from
  the id list recorded in the end offset (recovery path).

``SimpleDataSourceStreamReader`` reads on the driver — deliberately: the
reference's livestream is single-threaded by design (the head advances a
handful of ids per poll; hnarchive.py:139 uses the thread pool only for
backfill).  Catch-up from far behind belongs to ``update()`` / the
``fetch_items`` mapInPandas path, which does fan out to executors.

Offset format (all JSON-scalar values so the checkpoint WAL stays plain):
``{"head": int, "pending": "{id: misses}", "batch": "[ids]"}``.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

from hnarchive_spark.streaming.livestream import SkipPolicy

SOURCE_NAME = "hn_livestream"


def _transport_from_options(options: dict):
    mock = options.get("mock_data")
    if mock:
        from hnarchive_spark.sources.hn_api import MockTransport

        with open(mock) as fh:
            raw = json.load(fh)
        items = {int(k): v for k, v in raw.get("items", raw).items()}
        max_id = raw.get("max_id") if "max_id" in raw else max(items, default=0)
        return MockTransport(items=items, max_id=int(max_id))
    from hnarchive_spark.sources.hn_api import HttpTransport

    return HttpTransport()


class HNLivestreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.options = options
        self.transport = _transport_from_options(options)
        self.skip_margin = int(options.get("skip_margin", 50))
        self.miss_threshold = int(options.get("miss_threshold", 5))
        self.start_from = int(options.get("start_from", 0))

    def initialOffset(self) -> dict:
        return {"head": self.start_from, "pending": "{}", "batch": "[]"}

    def read(self, start: dict):
        """One poll: fetch pending + new ids, roll the SkipPolicy forward."""
        head0 = int(start["head"])
        policy = SkipPolicy(
            skip_margin=self.skip_margin,
            miss_threshold=self.miss_threshold,
            misses={int(k): int(v) for k, v in json.loads(start.get("pending", "{}")).items()},
        )
        live = self.transport.max_item()
        head = max(head0, live)
        candidates = [i for i in policy.pending() if i <= head0] + list(
            range(head0 + 1, live + 1)
        )
        rows, got = [], []
        for i in candidates:
            data = self.transport.get_item(i)
            if data is not None:
                rows.append((json.dumps(data),))
                got.append(i)
                policy.resolve(i)
            else:
                policy.record_miss(i)
                if policy.should_skip(i, head):
                    policy.resolve(i)  # permanent skip (hnarchive.py:184-186)
        end = {
            "head": head,
            "pending": json.dumps(policy.misses, sort_keys=True),
            "batch": json.dumps(got),
        }
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        """Deterministic replay of a committed batch from its id list."""
        for i in json.loads(end.get("batch", "[]")):
            data = self.transport.get_item(i)
            if data is not None:
                yield (json.dumps(data),)

    def commit(self, end: dict) -> None:
        pass  # progress is the checkpointed offset itself


class HNLivestreamDataSource(DataSource):
    """``spark.readStream.format("hn_livestream")`` — options:

    * ``mock_data``: JSON id->wire-item file (offline transport; same format
      as the CLI flag).  Without it the real Firebase transport is used.
    * ``start_from``: initial committed head (default 0 = full history).
    * ``skip_margin`` / ``miss_threshold``: SkipPolicy knobs (50 / 5).
    """

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> str:
        return "payload string"

    def simpleStreamReader(self, schema) -> HNLivestreamReader:
        return HNLivestreamReader(dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(HNLivestreamDataSource)


def livestream_readstream(spark, **options):
    """readStream DataFrame of wire payloads from the livestream source."""
    register(spark)
    reader = spark.readStream.format(SOURCE_NAME)
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()
