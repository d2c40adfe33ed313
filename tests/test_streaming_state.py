"""Cross-check the stateful streaming sessionizer against the batch
sessionization: every session CLOSED by a later event must agree exactly
(start, end, count, sum) with the batch query's non-final sessions."""

from __future__ import annotations

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
