"""Skew-mitigation utilities.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; these explicit tools cover the two places AQE can't help:

* ``salted_aggregate`` — a hot GROUP BY key (one key holding a large share
  of all rows) bottlenecks the final reducer. Two-phase aggregation over a
  salted key spreads phase 1 across ``n_salts`` reducers; phase 2 combines
  the per-salt partials. Correct for any algebraic aggregate (sum/count/
  min/max shown; avg = sum+count composed).
* ``salted_join`` — a skewed LEFT key joined to a small-but-not-broadcastable
  right side: left gets a DETERMINISTIC salt (full-row content hash, so task
  retries and AQE re-plans see the same placement), right is replicated
  n_salts ways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, n_salts: int):
    # spreads rows of the same key across n_salts reducers; ANY salt value
    # is correct (phase-2 combine / right-side replication covers all
    # salts).  Hash the FULL row content so the salt is stable across task
    # retries and AQE re-plans — monotonically_increasing_id would re-salt
    # recomputed rows differently mid-shuffle (duplicate/loss hazard).
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe GROUP BY.

    ``aggs``: out_name -> (function, column) with function in
    {sum, count, min, max}.  Example::

        salted_aggregate(events, "user_id",
                         {"n": ("count", "*"), "total": ("sum", "value")})
    """
    combine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            phase1_exprs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(out))
        elif fn in ("sum", "min", "max"):
            phase1_exprs.append(getattr(F, fn)(F.col(col)).alias(out))
        else:
            raise ValueError(f"unsupported aggregate {fn!r}")
    salted = df.withColumn("_salt", _salt_col(df, n_salts))
    partial = salted.groupBy(key, "_salt").agg(*phase1_exprs)
    final_exprs = [combine[fn](F.col(out)).alias(out) for out, (fn, _) in aggs.items()]
    return partial.groupBy(key).agg(*final_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (big, skewed) left; replicate the right.

    Right-side rows are duplicated n_salts times, so keep the right side
    small (dimension-scale) — if it fits a broadcast, broadcast instead."""
    l_salted = left.withColumn("_salt", _salt_col(left, n_salts))
    r_replicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l_salted.join(r_replicated, [key, "_salt"], how)
    return out.drop("_salt")
