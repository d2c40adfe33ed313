"""Isolated fresh-session timing probe — the drifter-adjudication tool
BENCH_NOTES r11/r13 prescribe: run ONE process per invocation, time the
named queries min-of-3 (untimed warmup, cache clears between runs) at
$SPARK_GRAFT_SF_DIR, print one JSON line.  Adjudication = run this
SCRIPT three times (three separate JVMs), pair each drifter with a
code-untouched CONTROL in the same session, and compare drifter/control
RATIOS to the prior round's — the ratio cancels the box's documented
multi-x cross-session variance that raw walls cannot see through.

Run: python tools/isolated_probe.py q_substring_dedup_clean q_asof_join
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hnarchive_spark.plans.registry import all_queries
from hnarchive_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: isolated_probe.py <query> [query ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("isolated-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict = {"sf_dir": sf_dir}
    for name in names:
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"min": min(runs), "runs": runs}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
