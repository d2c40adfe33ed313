"""SCD2 (type-2 slowly-changing dimension) core algebra, shared by the
registered queries (plans/analytics.py), the persisted dimension store
(sources/scd2_store.py), and streaming maintenance
(streaming/index_maint.maintain_scd2) — one code path, three surfaces,
the same contract as the ANN/text index append family.

The dimension is stored as RUNS (user_id, version, state, valid_from_us,
n_events, last_ts_us, last_event_id): run-length groups of the entity's
event stream under a total (ts, event_id) order.  valid_to_us/is_current
are DERIVED at read time (:func:`close_intervals`) — storing them would
make every append rewrite the predecessor row; deriving them keeps
closed runs physically immutable, which is what makes bucket-pruned
incremental maintenance possible.

``last_ts_us``/``last_event_id`` (the run's final event under the total
order) exist for the at-least-once guard: a re-delivered or late event
at-or-before the open run's last position is dropped, so re-applying a
micro-batch is a pure no-op (see :func:`sources.scd2_store.append_scd2`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RUN_COLS = (
    "user_id",
    "version",
    "state",
    "valid_from_us",
    "n_events",
    "last_ts_us",
    "last_event_id",
)


def scd2_runs(e: DataFrame) -> DataFrame:
    """Run-length collapse of (user_id, ts, event_id, event_type) into
    versioned runs. One exchange on user_id; the change-flag window and
    the run aggregation share it."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    chg = F.when(prev.isNull() | (prev != F.col("event_type")), F.lit(1)).otherwise(F.lit(0))
    ver = F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0))
    last = F.max(F.struct(F.unix_micros("ts").alias("ts_us"), F.col("event_id")))
    return (
        e.withColumn("version", ver)
        .groupBy("user_id", "version", F.col("event_type").alias("state"))
        .agg(
            F.min(F.unix_micros("ts")).alias("valid_from_us"),
            F.count(F.lit(1)).alias("n_events"),
            last.alias("_last"),
        )
        .select(
            "user_id",
            "version",
            "state",
            "valid_from_us",
            "n_events",
            F.col("_last.ts_us").alias("last_ts_us"),
            F.col("_last.event_id").alias("last_event_id"),
        )
    )


def merge_scd2_runs(dim: DataFrame, batch_runs: DataFrame) -> DataFrame:
    """Absorb a batch's runs into an existing runs table.

    Closed runs (version < the user's max) pass through verbatim; each
    batch user's OPEN run is pooled with the batch's runs and run-length
    coalesced again — the only pair that can merge is (open run, first
    batch run) when the state continued across the boundary, in which
    case n_events add and valid_from stays the open run's.  Versions
    renumber from the open run's version (or 1 for brand-new users).
    Users absent from the batch are untouched.  Every shuffle is keyed
    by user_id; pool width per touched user = 1 + that user's batch
    runs."""
    wmax = Window.partitionBy("user_id")
    d = dim.withColumn("_maxv", F.max("version").over(wmax))
    closed = d.filter(F.col("version") < F.col("_maxv")).drop("_maxv")
    open_rows = d.filter(F.col("version") == F.col("_maxv")).drop("_maxv")

    touched = batch_runs.select("user_id").distinct()
    open_untouched = open_rows.join(touched, "user_id", "left_anti")
    open_touched = open_rows.join(touched, "user_id", "left_semi")

    pool = open_touched.withColumn("_src", F.lit(0)).unionByName(
        batch_runs.withColumn("_src", F.lit(1))
    )
    # _src breaks valid_from_us ties deterministically (open run first):
    # a batch event sharing the open run's last microsecond (admitted by
    # the frontier guard on a larger event_id) would otherwise make the
    # lag(state) coalescing and the renumbering order nondeterministic
    w = Window.partitionBy("user_id").orderBy("valid_from_us", "_src")
    prev = F.lag("state").over(w)
    chg = F.when(prev.isNull() | (prev != F.col("state")), F.lit(1)).otherwise(F.lit(0))
    grp = F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0))
    merged = (
        pool.withColumn("_grp", grp)
        .groupBy("user_id", "_grp", "state")
        .agg(
            F.min("valid_from_us").alias("valid_from_us"),
            F.sum("n_events").alias("n_events"),
            F.max(F.struct("last_ts_us", "last_event_id")).alias("_last"),
            F.min(F.when(F.col("_src") == 0, F.col("version"))).alias("_openv"),
        )
    )
    # renumber in _grp order — _grp is assigned under w's total order, so
    # it IS the deterministic run sequence (valid_from_us alone can tie)
    wv = Window.partitionBy("user_id").orderBy("_grp")
    base = F.max("_openv").over(Window.partitionBy("user_id"))
    renum = (
        merged.withColumn("version", F.coalesce(base, F.lit(1)) + F.row_number().over(wv) - 1)
        .select(
            "user_id",
            "version",
            "state",
            "valid_from_us",
            "n_events",
            F.col("_last.last_ts_us").alias("last_ts_us"),
            F.col("_last.last_event_id").alias("last_event_id"),
        )
    )
    return closed.unionByName(open_untouched).unionByName(renum)


def close_intervals(runs: DataFrame) -> DataFrame:
    """The read view: derive valid_to_us (the next run's valid_from) and
    is_current from the immutable runs."""
    w = Window.partitionBy("user_id").orderBy("version")
    nxt = F.lead("valid_from_us").over(w)
    return runs.select(
        "user_id",
        "version",
        "state",
        "valid_from_us",
        nxt.alias("valid_to_us"),
        "n_events",
        nxt.isNull().alias("is_current"),
    )
