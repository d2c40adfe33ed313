"""Export sink: materialize the items store as a single-file embedded
database (DuckDB), the modern analog of the reference's deliverable — one
portable `hnarchive.db` file a user can query without Spark
(BASELINE.json's 'JDBC sink to SQLite' option; DuckDB is the embedded
engine available here and reads our parquet natively).

The export is driver-side by design: it produces a SINGLE file, which is
inherently a one-writer operation; the heavy lifting (the scan) stays in
the parquet layer that DuckDB reads directly — no row-by-row transfer
through Python.
"""

from __future__ import annotations

import glob
import os

from hnarchive_spark.sources.items_store import ItemsStore


# The reference's exact physical schema (hnarchive.py:34-60): the items
# table DDL plus its six indexes, including the partial poll index and the
# (retrieved - time) expression index.  Reproduced as a format CONTRACT so
# a .sqlite file we emit is byte-compatible with what the reference's own
# tooling expects to open (parent/poll are TEXT there because the reference
# binds JSON values into TEXT-affinity columns; we bind the same way).
_SQLITE_DDL = """
BEGIN;
PRAGMA user_version = 1;
CREATE TABLE IF NOT EXISTS items(
    id INT PRIMARY KEY NOT NULL,
    deleted INT,
    type TEXT,
    author TEXT,
    time INT,
    text TEXT,
    dead INT,
    parent TEXT,
    poll TEXT,
    url TEXT,
    score INT,
    title TEXT,
    descendants INT,
    retrieved INT
);
CREATE INDEX IF NOT EXISTS index_items_id on items(id);
CREATE INDEX IF NOT EXISTS index_items_parent on items(parent);
CREATE INDEX IF NOT EXISTS index_items_poll on items(poll) WHERE poll IS NOT NULL;
CREATE INDEX IF NOT EXISTS index_items_time on items(time);
CREATE INDEX IF NOT EXISTS index_items_type_time on items(type, time);
CREATE INDEX IF NOT EXISTS index_items_age_at_retrieval on items(retrieved - time);
COMMIT;
"""

_SQLITE_COLS = (
    "id", "deleted", "type", "author", "time", "text", "dead",
    "parent", "poll", "url", "score", "title", "descendants", "retrieved",
)


def export_to_sqlite(
    store: ItemsStore, db_path: str, batch_rows: int = 50_000
) -> int:
    """Write the store's current snapshot as a single ``.sqlite`` file in
    the reference's exact physical schema — the migration path for a user
    whose system of record is the reference's ``hnarchive.db``.

    Driver-side single-writer by design (one output file); the scan stays
    in the Arrow parquet layer, streamed in record batches so the export
    never materializes the store in memory. Booleans bind as 0/1 ints and
    parent/poll bind into the reference's TEXT-affinity columns, exactly
    as the reference's own INSERTs do (hnarchive.py:201-233)."""
    import sqlite3

    import pyarrow.dataset as ds

    v = store._current_version()
    if v is None:
        raise ValueError("store is empty; nothing to export")
    snapshot_dir = store._version_dir(v)
    dataset = ds.dataset(snapshot_dir, format="parquet", partitioning="hive")
    missing = [c for c in _SQLITE_COLS if c not in dataset.schema.names]
    if missing:
        raise ValueError(f"store snapshot missing columns {missing}")
    # write to a sibling temp file and rename into place, so a crashed
    # export never leaves a torn .sqlite where the previous one was (the
    # same atomic-swap discipline as the store's version pointer)
    tmp_path = db_path + ".tmp"
    if os.path.exists(tmp_path):
        os.remove(tmp_path)
    con = sqlite3.connect(tmp_path)
    try:
        con.executescript(_SQLITE_DDL)
        placeholders = ",".join("?" * len(_SQLITE_COLS))
        ins = f"INSERT INTO items({','.join(_SQLITE_COLS)}) VALUES ({placeholders})"
        n = 0
        for batch in dataset.to_batches(columns=list(_SQLITE_COLS), batch_size=batch_rows):
            rows = list(zip(*[batch.column(c).to_pylist() for c in _SQLITE_COLS]))
            con.executemany(ins, rows)
            n += len(rows)
        con.commit()
    except BaseException:
        con.close()
        if os.path.exists(tmp_path):
            os.remove(tmp_path)
        raise
    con.close()
    os.replace(tmp_path, db_path)
    return n


def export_to_duckdb(store: ItemsStore, db_path: str, table: str = "items") -> int:
    """Write the store's current snapshot into ``db_path`` (created or
    replaced). Returns the exported row count."""
    import duckdb

    v = store._current_version()
    if v is None:
        raise ValueError("store is empty; nothing to export")
    snapshot_dir = store._version_dir(v)
    parquet_glob = os.path.join(snapshot_dir, "**", "*.parquet")
    if not glob.glob(parquet_glob, recursive=True):
        raise ValueError(f"no parquet files under {snapshot_dir}")
    if os.path.exists(db_path):
        os.remove(db_path)
    con = duckdb.connect(db_path)
    try:
        con.execute(
            f"CREATE TABLE {table} AS "
            f"SELECT * FROM read_parquet('{parquet_glob}', hive_partitioning=true)"
        )
        # the reference's physical design: index the lookup/traversal keys
        con.execute(f"CREATE INDEX idx_{table}_id ON {table} (id)")
        con.execute(f"CREATE INDEX idx_{table}_parent ON {table} (parent)")
        con.execute(f"CREATE INDEX idx_{table}_time ON {table} (time)")
        n = con.execute(f"SELECT count(*) FROM {table}").fetchone()[0]
    finally:
        con.close()
    return int(n)
