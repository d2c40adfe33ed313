"""Custom stateful streaming operator: session windows with an inactivity
gap, via ``applyInPandasWithState`` (SURVEY §2.8's 'custom stateful
operator' slot; the batch twin is plans/streaming_plans.q_sessionize).

State model per user_id: (session_start_us, last_ts_us, n_events,
value_cents), microsecond epochs.  An event later than ``gap`` after
``last_ts`` closes the open session and emits it, then starts a new one.
The final open session per key stays in state (NoTimeout — see
sessionize_stream for why), ready for the next batch or a checkpointed
restart.

Values are accumulated as exact integer cents (``floor(value*100 + 0.5)`` —
an explicit half-UP tie rule: Python's builtin ``round`` is banker's
half-to-even, while Spark ``F.round`` and DuckDB ``round`` are
half-away-from-zero, so the builtin would silently diverge on a true
half-cent value).  ``value`` is 2-decimal money stored as double, so a float
accumulation is summation-order dependent; integer addition is
order-independent, which makes the emitted ``value_cents`` bit-identical to
the batch twin (plans/streaming_plans.q_sessionize) and its DuckDB oracle.

Checkpoint compatibility: the output column changed value_sum DOUBLE ->
value_cents LONG (round 4); checkpoints written by the earlier schema are
not resumable — start a fresh checkpoint directory when upgrading.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

GAP_US = 30 * 60 * 1_000_000

STATE_SCHEMA = StructType(
    [
        StructField("session_start", LongType()),
        StructField("last_ts", LongType()),
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
    ]
)


def _sessionize_group(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    out = []

    rows = pd.concat(list(pdfs)).sort_values("ts")
    if state.exists:
        s0, last, n, cents = state.get
    else:
        s0 = last = None
        n, cents = 0, 0
    for ts, val in zip(rows["ts"], rows["value"]):
        ts_us = int(ts.value // 1000)  # pandas ns -> us
        if last is not None and ts_us - last > GAP_US:
            out.append((user_id, s0, last, n, cents))
            s0, n, cents = ts_us, 0, 0
        if s0 is None:
            s0 = ts_us
        last = ts_us
        n += 1
        # explicit half-up: builtin round() is half-to-even and would
        # diverge from Spark/DuckDB round on a true half-cent tie
        cents += int(math.floor(float(val) * 100 + 0.5))
    state.update((s0, last, n, cents))

    if out:
        yield pd.DataFrame(
            {
                "user_id": [o[0] for o in out],
                "session_start": [pd.Timestamp(o[1], unit="us") for o in out],
                "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
                "n_events": [o[3] for o in out],
                "value_cents": [o[4] for o in out],
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events stream (user_id, ts, value) -> closed-session stream."""
    # NoTimeout: an AvailableNow drain with processing-time timeouts never
    # reaches a terminal batch (timeout churn schedules endless empty
    # micro-batches on Spark 4.1); without timeouts the drain is one pass.
    # Consequence: the final open session per user stays in state — exactly
    # the restart-resumable behavior a continuous deployment wants.
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
