"""Run the driver-style parity compare for a few named queries.

Usage: python tools/parity_one.py q_name [q_name ...] [--sf /root/testdata/sf0.001]
Reuses tests/test_oracle_parity.py's normalization so a green here means a
green there.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import duckdb  # noqa: E402

from hnarchive_spark.plans.registry import REGISTRY, _ensure_loaded  # noqa: E402
from hnarchive_spark.tables import TABLE_NAMES  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.001"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
    _ensure_loaded()

    from test_oracle_parity import _norm_rows  # type: ignore

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("parity_one")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    failed = 0
    for name in args:
        spec = REGISTRY[name]
        sdf = spec.spark(spark, sf)
        srows = sdf.collect()
        scols, svals = _norm_rows(sdf.columns, [tuple(r) for r in srows])
        if spec.oracle is None:
            print(f"{name}: rows-only, spark_rows={len(srows)}")
            continue
        cur = con.execute(spec.oracle)
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        ocols, ovals = _norm_rows(ocols, orows)
        ok = (scols == ocols) and (svals == ovals)
        print(f"{name}: rows {len(srows)}/{len(orows)} cols_match={scols == ocols} hash_match={svals == ovals}")
        if not ok:
            failed += 1
            if scols != ocols:
                print("  spark cols:", scols, "\n  oracle cols:", ocols)
            else:
                diff_s = [v for v in svals if v not in set(ovals)][:3]
                diff_o = [v for v in ovals if v not in set(svals)][:3]
                print("  spark-only:", diff_s, "\n  oracle-only:", diff_o)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
