"""Incremental rollup: refreshing only dirty days must equal a full
recompute, and untouched-day partitions must not be rewritten."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hnarchive_spark.operators.rollup import DailyRollup


def _events(spark, rows):
    return spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")


def _ts(day, sec):
    from datetime import datetime, timezone

    return datetime.fromtimestamp(1_700_000_000 + day * 86400 + sec, tz=timezone.utc).replace(
        tzinfo=None
    )


def _snapshot(rollup):
    return {
        (str(r["day"]), r["user_id"]): (r["n"], r["total"])
        for r in rollup.read().collect()
    }


def test_incremental_refresh_equals_full(spark, tmp_path):
    path = str(tmp_path / "rollup")
    day0 = [(1, _ts(0, 10), 1, 10.0), (2, _ts(0, 20), 1, 5.0), (3, _ts(0, 30), 2, 1.0)]
    day1 = [(4, _ts(1, 10), 1, 2.0)]
    ev = _events(spark, day0 + day1)
    r = DailyRollup(spark, path, "user_id", "value")
    r.refresh(ev, ev)  # initial build: all days dirty
    assert _snapshot(r)[(str(_ts(0, 0).replace(second=0, minute=0, hour=0)), 1)] == (2, 15.0)

    # a late batch lands in day 0 plus a new day 2; only those days recompute
    late = [(5, _ts(0, 40), 1, 100.0), (6, _ts(2, 5), 3, 7.0)]
    ev2 = _events(spark, day0 + day1 + late)
    r.refresh(ev2, _events(spark, late))

    # incremental result == full recompute
    full = DailyRollup(spark, str(tmp_path / "full"), "user_id", "value")
    full.refresh(ev2, ev2)
    assert _snapshot(r) == _snapshot(full)
    # day-0 user-1 now includes the late row; day-1 partition survived the
    # dynamic overwrite untouched
    key0 = (str(_ts(0, 0).replace(second=0, minute=0, hour=0)), 1)
    assert _snapshot(r)[key0] == (3, 115.0)
    assert len({d for d in os.listdir(path) if d.startswith("day=")}) == 3
