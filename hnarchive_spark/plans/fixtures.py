"""Deterministic inline fixtures for the hnarchive-specific operators.

The driver's synthetic star schema has no self-referencing table, so the
merge matrix (U1) and tree closure (G1) are exercised on small inline
fixtures.  The SAME Python constants feed both the Spark builder
(``createDataFrame``) and the DuckDB oracle (generated ``VALUES`` SQL), so
the two sides cannot drift.

Fixture design follows FIXTURES.md §A1/§A2: nested comment forest ≥4 levels,
poll with pollopts, all five types, deleted/dead rows, unbalanced <p> text,
coalesce-vs-overwrite re-statements, duplicate ids in one batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hnarchive_spark.schema import ITEMS_SCHEMA

_SQL_TYPES = {
    "id": "BIGINT",
    "deleted": "BOOLEAN",
    "type": "VARCHAR",
    "author": "VARCHAR",
    "time": "BIGINT",
    "text": "VARCHAR",
    "dead": "BOOLEAN",
    "parent": "BIGINT",
    "poll": "BIGINT",
    "url": "VARCHAR",
    "score": "BIGINT",
    "title": "VARCHAR",
    "descendants": "BIGINT",
    "retrieved": "BIGINT",
    "age_at_retrieval": "BIGINT",
    "seq": "BIGINT",
}

ITEM_COLS = tuple(f.name for f in ITEMS_SCHEMA.fields)

T0 = 1_700_000_000  # fixed epoch base so ages are stable


def _item(id, type="comment", **kw):
    row = {c: None for c in ITEM_COLS}
    row.update(
        id=id,
        type=type,
        deleted=bool(kw.pop("deleted", False)),
        dead=bool(kw.pop("dead", False)),
        time=kw.pop("time", T0),
        retrieved=kw.pop("retrieved", T0 + 1000),
    )
    row.update(kw)
    if row["age_at_retrieval"] is None and row["time"] is not None:
        row["age_at_retrieval"] = row["retrieved"] - row["time"]
    return row


# --- A1: comment forest + poll (tree fixture; 2 stories, 1 poll, 5 types) ---
TREE_ITEMS: list[dict] = [
    _item(1, "story", author="alice", title="Story A", url="https://a.example", score=100, descendants=7, time=T0),
    # 4-level nested chain with shuffled sibling times
    _item(2, author="bob", parent=1, text="b<p>c", time=T0 + 300),
    _item(3, author="carol", parent=1, text="first", time=T0 + 100),
    _item(4, author="dave", parent=1, text="mid", time=T0 + 200),
    _item(5, author="erin", parent=2, text="reply", time=T0 + 400),
    _item(6, author="frank", parent=5, text="deep", time=T0 + 500),
    _item(7, author="gina", parent=6, text="deepest", time=T0 + 600),
    _item(8, author=None, parent=3, text=None, deleted=True, time=T0 + 150),
    # second story, no comments (job-like)
    _item(20, "job", author="hr", title="Job post", text="apply &lt;p&gt; now", time=T0 + 50),
    # Ask-HN story: url NULL, text set
    _item(30, "story", author="ask", title="Ask HN", text="question<p>details", score=5, descendants=0, time=T0 + 80),
    # poll with 3 pollopts (poll edge) and one comment (parent edge)
    _item(40, "poll", author="pollster", title="Poll?", score=30, descendants=1, time=T0 + 500),
    _item(41, "pollopt", poll=40, text="opt 1", score=10, time=T0 + 510),
    _item(42, "pollopt", poll=40, text="opt 2", score=7, time=T0 + 505),
    _item(43, "pollopt", poll=40, text="opt 3", score=1, time=T0 + 520, dead=True),
    _item(44, "comment", parent=40, author="voter", text="I voted", time=T0 + 530),
]

# --- A2-style merge fixture: base table + update batch (with dup ids) -------
MERGE_BASE: list[dict] = [
    _item(1, "story", author="alice", title="Old title", url="https://old", score=10, descendants=3, time=T0, retrieved=T0 + 100),
    _item(2, "comment", author="bob", parent=1, text="old text", time=T0 + 10, retrieved=T0 + 100),
    _item(3, "comment", author="carol", parent=1, text="keep me", score=5, time=T0 + 20, retrieved=T0 + 100),
    _item(4, "story", author="dan", title="Dead soon", url="https://d", score=2, descendants=0, time=T0 + 30, retrieved=T0 + 100),
]

# seq = arrival order inside the batch (the reference folds serially).
# Policy exercised:
#  id=1: score/title present -> overwrite coalesce cols; descendants ABSENT
#        -> overwritten with NULL; author absent -> kept.
#  id=2: text absent -> kept; dead flips true; parent absent -> NULL (policy!)
#  id=3: untouched (not in batch) -> row survives verbatim.
#  id=4: deleted flips true, url absent -> kept old.
#  id=5: brand-new insert.
#  id=6: duplicate in batch — first brings title, second brings score with
#        title absent -> collapsed row must keep title AND take score;
#        second row's parent NULL overwrites the first's parent.
MERGE_UPDATES: list[dict] = [
    dict(_item(1, "story", title="New title", url="https://new", score=50, time=T0, retrieved=T0 + 900), descendants=None),
    _item(2, "comment", dead=True, time=T0 + 10, retrieved=T0 + 900),
    _item(4, "story", deleted=True, title="Dead soon", score=3, time=T0 + 30, retrieved=T0 + 900),
    _item(5, "comment", author="eve", parent=1, text="new comment", time=T0 + 40, retrieved=T0 + 900),
    _item(6, "comment", author="fred", parent=2, title="weird", time=T0 + 50, retrieved=T0 + 900),
    _item(6, "comment", author=None, score=9, time=T0 + 55, retrieved=T0 + 901),
]


def items_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    data = [tuple(r[c] for c in ITEM_COLS) for r in rows]
    return spark.createDataFrame(data, schema=ITEMS_SCHEMA)


def items_df_with_seq(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Items rows + explicit batch arrival order column ``seq``."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([*ITEMS_SCHEMA.fields, StructField("seq", LongType(), False)])
    data = [tuple(r[c] for c in ITEM_COLS) + (i,) for i, r in enumerate(rows)]
    return spark.createDataFrame(data, schema=schema)


def with_seq(rows: list[dict]) -> list[dict]:
    return [{**r, "seq": i} for i, r in enumerate(rows)]


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def values_sql(rows: list[dict], cols: tuple[str, ...]) -> str:
    """Rows -> a typed DuckDB inline relation (SELECT ... FROM VALUES)."""
    tuples = ",\n      ".join("(" + ", ".join(_sql_lit(r[c]) for c in cols) + ")" for r in rows)
    casts = ", ".join(f"CAST(v.c{i} AS {_SQL_TYPES[c]}) AS {c}" for i, c in enumerate(cols))
    colnames = ", ".join(f"c{i}" for i in range(len(cols)))
    return f"SELECT {casts} FROM (VALUES\n      {tuples}\n    ) v({colnames})"
