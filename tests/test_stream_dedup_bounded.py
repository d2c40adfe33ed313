"""State-eviction semantics of dropDuplicatesWithinWatermark (the bounded
form behind q_stream_dedup_bounded).

The registered query's 35-day delay exceeds the corpus span, so eviction
never fires there (by design — it makes the drained result equal batch
DISTINCT for the oracle). This test drives the OTHER half of the contract
on a synthetic 3-batch stream: once the watermark passes a key's event
time plus the delay, its state is dropped and a later arrival of the SAME
key is emitted again — exactly the bounded-state behavior that keeps the
operator viable on an unbounded stream, and exactly what plain
dropDuplicates (infinite state, single emission) does not do.
"""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)


def _write_batch(spark, path: str, rows, mtime: float) -> None:
    """Materialize one batch as a SINGLE parquet file at ``path`` (the
    streaming file source lists plain files, not Spark output dirs)."""
    import glob
    import shutil

    staging = path + ".staging"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    shutil.move(part, path)
    shutil.rmtree(staging, ignore_errors=True)
    os.utime(path, (mtime, mtime))


def _drain(spark, src_dir: str, dedup) -> list:
    raw = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(src_dir)
    )
    out = dedup(raw)
    name = f"dedup_evict_sink_{int(time.time() * 1000)}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).collect()


@pytest.mark.parametrize("bounded", [True, False])
def test_watermark_eviction_reemits_expired_key(spark, tmp_path, bounded):
    import datetime as dt

    def t(day, hour=0):
        return dt.datetime(2024, 1, day, hour)

    src = tmp_path / "stream_src"
    src.mkdir()
    # batch 1: key A (+ B so the batch isn't single-row)
    _write_batch(
        spark, str(src / "b1.parquet"),
        [("A", 1, t(1)), ("B", 2, t(1))], mtime=1_700_000_000,
    )
    # batch 2: unrelated key C four days later — advances the watermark past
    # A's (event time + 1h delay)
    _write_batch(
        spark, str(src / "b2.parquet"),
        [("C", 3, t(5))], mtime=1_700_000_100,
    )
    # batch 3: spacer — eviction is applied at a batch's state COMMIT using
    # the watermark derived from PRIOR batches, so A's state drops at the
    # end of this batch (wm = Jan5 - 1h > Jan1 + 1h), one batch after the
    # advancing event arrived
    _write_batch(
        spark, str(src / "b3.parquet"),
        [("D", 9, t(5, 12))], mtime=1_700_000_200,
    )
    # batch 4: key A AGAIN, well past its evicted horizon
    _write_batch(
        spark, str(src / "b4.parquet"),
        [("A", 4, t(6))], mtime=1_700_000_300,
    )

    if bounded:
        dedup = lambda raw: (  # noqa: E731
            raw.withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["k"])
            .select("k", "event_id")
        )
        # A emitted TWICE: once per state lifetime — bounded state means an
        # expired key is a new key
        expected = {("A", 1), ("B", 2), ("C", 3), ("D", 9), ("A", 4)}
    else:
        dedup = lambda raw: (  # noqa: E731
            raw.withWatermark("ts", "1 hour")
            .dropDuplicates(["k"])
            .select("k", "event_id")
        )
        # infinite state: A suppressed forever after its first emission
        expected = {("A", 1), ("B", 2), ("C", 3), ("D", 9)}

    rows = {tuple(r) for r in _drain(spark, str(src), dedup)}
    assert rows == expected, rows
