"""Replay the driver's correctness check for the CURRENT verification
window, locally: for each of the first N names all_queries() returns
(default: the 50-name _VERIFY_FIRST window), run the Spark query and its
DuckDB oracle at the given sf dir and compare exactly the way the driver
does — columns sorted by name, rows sorted, stringified values.

This is the pre-driver confidence check for a rotation: a full
tests/test_oracle_parity.py sweep covers every registered query, but this
script answers the narrower operational question "will the rows the
driver is about to record all be green?", in window order, with timings
(so a window that would blow the driver's wall budget is visible too).

Run: python tools/verify_window.py [sf_dir] [n]
Exit code 1 if any name mismatches.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import duckdb

# reuse the canonical table list and the driver-compare normalization from
# the parity test — two independent recipes WILL drift (review finding r10)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from hnarchive_spark.tables import TABLE_NAMES as TABLES  # noqa: E402
from test_oracle_parity import _norm_rows  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import __spark_entry__ as entry
    from hnarchive_spark.session import get_spark

    spark = get_spark("verify-window")
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_fail = 0
    total = 0.0
    for name in list(qs)[:n]:
        t0 = time.perf_counter()
        if name not in osql:
            print(f"{name}\tROWS-ONLY ({len(qs[name](spark, sf_dir).collect())} rows)")
            total += time.perf_counter() - t0
            continue
        sdf = qs[name](spark, sf_dir)
        s_cols, s_vals = _norm_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
        res = con.execute(osql[name])
        o_cols, o_vals = _norm_rows([d[0] for d in res.description], res.fetchall())
        dt = time.perf_counter() - t0
        total += dt
        ok = s_cols == o_cols and s_vals == o_vals
        srows = s_vals
        n_fail += 0 if ok else 1
        print(f"{name}\t{'MATCH' if ok else 'MISMATCH'}\t{len(srows)} rows\t{dt:.2f}s")
    print(f"# window total {total:.1f}s, {n_fail} mismatches")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
