"""As-of join — match each left row with the latest right row at or before
its timestamp, per key (the time-series operator Spark lacks natively).

Implementation: the union-and-carry trick, fully distributed —

1. tag and union both inputs;
2. one shuffle: window partitioned by key, ordered by (time, tag) with
   right rows first at equal timestamps (so ``right.t <= left.t`` matches
   DuckDB/kdb ASOF semantics);
3. ``last(payload, ignorenulls=True)`` carries the most recent right row
   forward onto every left row;
4. keep left rows.

Cost: ONE shuffle on the key — same as a regular join — with no range
explosion and no per-key collect, so it scales to arbitrarily long
histories.  Skewed keys are handled by AQE the same way a join would be.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: Sequence[str],
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join; payload columns from the matched right row (NULLs if
    no right row precedes the left row and ``how='left'``; 'inner' drops).

    ``direction='backward'`` (default) matches the latest right row with
    ``r.t <= l.t``; ``direction='forward'`` matches the EARLIEST right row
    with ``r.t >= l.t`` — the time-reversed scan (descending order, min
    payload tiebreak at equal right timestamps), same single shuffle."""
    rpay = F.struct(*[F.col(c) for c in payload_cols])
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(right.select(rpay.alias("_r")).schema["_r"].dataType).alias("_rrow"),
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(left.select(F.struct(*[F.col(c) for c in left.columns]).alias("_l")).schema["_l"].dataType).alias("_lrow"),
        rpay.alias("_rrow"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # _rrow in the sort is a deterministic tiebreak: equal right timestamps
    # carry the max (backward) / min (forward) payload struct instead of an
    # engine-arbitrary row.  Callers should still dedupe the right side per
    # (key, time) when the oracle/engine being matched has its own tie rule.
    if direction == "backward":
        order = [F.col("_t"), F.col("_is_left"), F.col("_rrow")]
    elif direction == "forward":
        # descending time scan: right rows at the SAME timestamp must still
        # precede left rows (r.t >= l.t is inclusive), so _is_left ascends
        order = [F.col("_t").desc(), F.col("_is_left"), F.col("_rrow").desc()]
    else:
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_match", F.last("_rrow", ignorenulls=True).over(w))
    matched = carried.filter(F.col("_is_left") == 1)
    if how == "inner":
        # filter on the match struct itself: a matched right row whose first
        # payload column is NULL must NOT be dropped
        matched = matched.filter(F.col("_match").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    return matched.select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[F.col("_match")[c].alias(c) for c in payload_cols],
    )
