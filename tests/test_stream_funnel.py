"""Stateful streaming funnel: cross-batch state, single emission, and
batch-twin agreement."""

from __future__ import annotations

import datetime as dt

from hnarchive_spark.plans.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_stream_funnel_matches_batch_completed_conversions(spark):
    qs = all_queries()
    stream_rows = {
        (r.user_id, r.t1_us, r.t2_us, r.t3_us)
        for r in qs["q_stream_funnel"](spark, SF).collect()
    }
    batch_rows = {
        (r.user_id, r.t1_us, r.t2_us, r.t3_us)
        for r in qs["q_funnel"](spark, SF).collect()
        if r.reached == 3
    }
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def _drain(spark, src, ckpt, schema):
    from hnarchive_spark.streaming.funnel import funnel_stream

    stream = (
        spark.readStream.schema(schema).parquet(src)
    ).select("user_id", "event_id", "ts", "event_type")
    out = []

    def _collect(df, _epoch):
        out.extend(df.collect())

    q = (
        funnel_stream(stream)
        .writeStream.foreachBatch(_collect)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out


def test_funnel_completes_across_batches_and_emits_once(spark, tmp_path):
    """view+click arrive in batch 1 (no emission — state persists through
    the checkpoint), the purchase in batch 2 completes the funnel (one
    row, stage times spanning both batches), and a second purchase in
    batch 3 must NOT re-emit."""
    schema = "user_id long, event_id long, ts timestamp, event_type string"
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    t = lambda m: dt.datetime(2024, 1, 1, 10, m, 0)  # noqa: E731

    def write(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)

    write([(1, 10, t(0), "view"), (1, 11, t(1), "click"), (2, 12, t(0), "view")])
    assert _drain(spark, src, ckpt, schema) == []

    write([(1, 13, t(5), "purchase"), (2, 14, t(6), "purchase")])  # user 2: no click
    got = _drain(spark, src, ckpt, schema)
    us = lambda m: int(t(m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)  # noqa: E731
    assert [(r.user_id, r.t1_us, r.t2_us, r.t3_us) for r in got] == [
        (1, us(0), us(1), us(5))
    ]

    write([(1, 15, t(9), "purchase")])  # already converted -> no re-emission
    assert _drain(spark, src, ckpt, schema) == []
