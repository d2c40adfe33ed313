"""Verification-window rotation helper: computes, from the driver's
CORRECTNESS_r*.json files, each registered query's LATEST green driver
round (green = rows_match and hash_match-or-None and no err), and prints
the staleness-ordered rotation candidate list for the next round's
_VERIFY_FIRST (hnarchive_spark/plans/registry.py).

Policy (the one used in rounds 8-9): never-driver-verified oracled
queries first, then everything by ascending latest-green round; names
green in the most recent 1-2 rounds need no slot. Rows-only-by-design
queries (no oracle) are listed separately — they can only ever earn a
rows-only row.

Run: python tools/rotation_report.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hnarchive_spark.plans.registry import REGISTRY, _ensure_loaded


def latest_green() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        for name, rec in json.load(open(f)).items():
            green = (
                rec.get("rows_match")
                and rec.get("hash_match") in (True, None)
                and rec.get("err") is None
            )
            if green:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    _ensure_loaded()
    latest = latest_green()
    reg = list(REGISTRY)
    rows_only = [n for n in reg if REGISTRY[n].oracle is None]
    never = [n for n in reg if n not in latest and n not in rows_only]
    stale = sorted(
        (n for n in reg if n in latest), key=lambda n: (latest[n], reg.index(n))
    )
    print(f"# registered: {len(reg)}  oracled: {len(reg) - len(rows_only)}")
    print(f"# rows-only by design (weaker check only): {rows_only}")
    print(f"# never driver-verified (rotate FIRST): {never}")
    print("# staleness order (latest green round, name):")
    for n in stale:
        print(f"    {latest[n]}  {n}")


if __name__ == "__main__":
    main()
