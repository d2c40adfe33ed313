"""Streaming materialized-view maintenance: file-streamed events kept
rolled up through checkpoint kill/resume; late rows re-dirty old days;
the maintained table always equals a from-scratch batch aggregate."""

from __future__ import annotations

import datetime as dt

from hnarchive_spark.operators.rollup import DailyRollup
from hnarchive_spark.streaming.rollup_sink import rollup_equals_batch, stream_rollup

D0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _write_events(spark, src, rows):
    spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    ).coalesce(1).write.mode("append").parquet(src)


def _drain(spark, src, record, rollup, ckpt):
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(src)
    q = stream_rollup(stream, record, rollup, ckpt)
    assert q.awaitTermination(180), "stream did not drain"


def test_stream_rollup_restart_and_late_day(spark, tmp_path):
    src = str(tmp_path / "src")
    record = str(tmp_path / "record")
    ckpt = str(tmp_path / "ckpt")
    rollup = DailyRollup(spark, str(tmp_path / "rollup"), "event_type", "value")

    # run A: two days of events
    _write_events(
        spark,
        src,
        [
            (D0, "click", 1.0),
            (D0 + dt.timedelta(hours=1), "click", 2.0),
            (D0 + dt.timedelta(days=1), "buy", 10.0),
        ],
    )
    _drain(spark, src, record, rollup, ckpt)
    rec = spark.read.parquet(record).drop("batch_id")
    assert rollup_equals_batch(rollup, rec)
    assert rollup.read().count() == 2  # (day0, click), (day1, buy)

    # run B (kill+resume): new day PLUS a late row for day 0 -> day 0 must
    # be recomputed, not appended
    _write_events(
        spark,
        src,
        [
            (D0 + dt.timedelta(hours=2), "click", 4.0),  # late for day 0
            (D0 + dt.timedelta(days=2), "buy", 7.0),
        ],
    )
    _drain(spark, src, record, rollup, ckpt)
    rec = spark.read.parquet(record).drop("batch_id")
    assert rec.count() == 5
    assert rollup_equals_batch(rollup, rec)
    day0 = [
        r
        for r in rollup.read().collect()
        if r["day"].date() == D0.date() and r["event_type"] == "click"
    ]
    assert len(day0) == 1 and day0[0]["n"] == 3 and day0[0]["total"] == 7.0

    # run C: no new data -> drain is a no-op, state unchanged
    before = sorted(map(tuple, rollup.read().collect()))
    _drain(spark, src, record, rollup, ckpt)
    assert sorted(map(tuple, rollup.read().collect())) == before


def test_refresh_dirty_filter_prunes_day_partitions(spark, tmp_path):
    """The record store is partitioned by day (day_p), so the dirty-day
    recompute must reach the scan as a PartitionFilter — reading only the
    touched day directories, not full history. Locks the O(batch + dirty
    days) claim in streaming/rollup_sink.py."""
    src = str(tmp_path / "src")
    record = str(tmp_path / "record")
    ckpt = str(tmp_path / "ckpt")
    rollup = DailyRollup(spark, str(tmp_path / "rollup"), "event_type", "value")
    _write_events(
        spark,
        src,
        [(D0 + dt.timedelta(days=i), "click", float(i)) for i in range(4)],
    )
    _drain(spark, src, record, rollup, ckpt)

    events = spark.read.parquet(record).drop("batch_id")
    assert "day_p" in events.columns
    dirty = DailyRollup._dirty_slice(events, [D0])
    plan = dirty._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.split("\n") if "PartitionFilters" in ln]
    assert pf and any("day_p" in ln for ln in pf), pf
    # and the slice really is just the one day
    assert dirty.count() == 1
