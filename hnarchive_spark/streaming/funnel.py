"""Custom stateful streaming operator: ordered-funnel conversion detection
via ``applyInPandasWithState`` (the streaming twin of the batch
plans/relational2.q_funnel, which models the reference-adjacent analytics
surface; see SURVEY §2.8 'custom stateful operator').

State model per user_id: (t1_us, t2_us, t3_us) — the first 'view', the
first 'click' strictly after it, and the first 'purchase' strictly after
that, as microsecond epochs (-1 = not yet reached).  When an incoming
event completes the funnel (sets t3), the conversion row is emitted ONCE
and t3 stays set so later purchases never re-emit.  Users who never
complete stay in state awaiting the next micro-batch — the same open-tail
contract as streaming/sessionize.py (its NoTimeout rationale applies
verbatim: an AvailableNow drain with processing-time timeouts never
reaches a terminal batch on Spark 4.1).

Determinism: within a batch, rows process in (ts, event_id) order; every
stage test is a STRICT event-time comparison against the stored stage
time, so simultaneous-timestamp events resolve identically to the batch
twin's ``min(ts)``/``ts > t_prev`` aggregation regardless of arrival
interleaving.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

STATE_SCHEMA = StructType(
    [
        StructField("t1_us", LongType()),
        StructField("t2_us", LongType()),
        StructField("t3_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t1_us", LongType()),
        StructField("t2_us", LongType()),
        StructField("t3_us", LongType()),
    ]
)

_UNSET = -1


def _funnel_group(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    t1, t2, t3 = state.get if state.exists else (_UNSET, _UNSET, _UNSET)
    emitted = []
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    for ts, etype in zip(rows["ts"], rows["event_type"]):
        ts_us = int(ts.value // 1000)  # pandas ns -> us
        if etype == "view":
            if t1 == _UNSET:
                t1 = ts_us
        elif etype == "click":
            if t2 == _UNSET and t1 != _UNSET and ts_us > t1:
                t2 = ts_us
        elif etype == "purchase":
            if t3 == _UNSET and t2 != _UNSET and ts_us > t2:
                t3 = ts_us
                emitted.append((user_id, t1, t2, t3))
    state.update((t1, t2, t3))
    if emitted:
        yield pd.DataFrame(emitted, columns=["user_id", "t1_us", "t2_us", "t3_us"])


def funnel_stream(events: DataFrame) -> DataFrame:
    """events stream (user_id, event_id, ts, event_type) -> one conversion
    row per user at the moment the view->click->purchase funnel completes."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
