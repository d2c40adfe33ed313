"""Cross-check the stateful streaming sessionizer against the batch
sessionization: every session CLOSED by a later event must agree exactly
(start, end, count, sum) with the batch query's non-final sessions."""

from __future__ import annotations

import datetime as dt

import pytest

from hnarchive_spark.plans.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_stream_sessionize_matches_batch_closed_sessions(spark):
    qs = all_queries()
    stream_rows = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["value_cents"])
        for r in qs["q_stream_sessionize"](spark, SF).collect()
    }
    batch = qs["q_sessionize"](spark, SF).collect()
    # batch sessions per user, ordered; drop each user's last (still open at
    # end-of-stream -> held in state, not emitted by the append-mode stream)
    by_user: dict[int, list] = {}
    for r in batch:
        by_user.setdefault(r["user_id"], []).append(r)
    closed = set()
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r["session_id"])
        for r in rows[:-1]:
            closed.add(
                (user, r["session_start"], r["session_end"], r["n_events"], r["session_value_cents"])
            )
    assert stream_rows == closed
    assert len(stream_rows) > 0


def test_old_schema_checkpoint_fails_cleanly(spark, tmp_path):
    """Round 4 changed the sessionizer state schema (value_sum DOUBLE ->
    value_cents LONG, see streaming/sessionize.py docstring). Resuming the
    NEW operator from a checkpoint written under the OLD schema must fail
    with Spark's STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE error — a clean,
    diagnosable refusal, never a silent reinterpretation of old state bytes."""
    from pyspark.errors.exceptions.captured import StreamingQueryException
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from hnarchive_spark.streaming.sessionize import OUTPUT_SCHEMA, sessionize_stream

    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")
    schema = "user_id long, ts timestamp, value double"
    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 0, 0), 1.0)], schema
    ).write.parquet(src)

    old_state = StructType(
        [
            StructField("session_start", LongType()),
            StructField("last_ts", LongType()),
            StructField("n_events", LongType()),
            StructField("value_sum", DoubleType()),  # the pre-round-4 field
        ]
    )

    def old_fn(key, pdfs, state):
        for _ in pdfs:
            pass
        state.update((0, 0, 0, 0.0))
        return
        yield

    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            old_fn, OUTPUT_SCHEMA, old_state, "append", GroupStateTimeout.NoTimeout
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12, 0, 0), 2.0)], schema
    ).write.mode("append").parquet(src)
    with pytest.raises(StreamingQueryException, match="SCHEMA_NOT_COMPATIBLE"):
        q2 = (
            sessionize_stream(spark.readStream.schema(schema).parquet(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
