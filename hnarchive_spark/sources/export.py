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
