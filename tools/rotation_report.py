"""Verification-window rotation helper: computes, from the driver's
CORRECTNESS_r*.json files, each registered query's LATEST green driver
round (green = rows_match and hash_match-or-None and no err), and prints
the staleness-ordered rotation candidate list for the next round's
_VERIFY_FIRST (hnarchive_spark/plans/registry.py).

Policy (the one used since round 8): never-driver-verified oracled
queries first, then everything by ascending latest-green round — ties
break alphabetically (see rotation_order); names green in the most
recent 1-2 rounds need no slot.
Rows-only-by-design queries (no oracle) are listed separately — they can
only ever earn a rows-only row.

:func:`rotation_order` is the canonical ordering; the registry's
_VERIFY_FIRST must be its prefix (tests/test_rotation_consistency.py
asserts exactly that, so rotations are mechanical and can't silently
skip a name).

Run: python tools/rotation_report.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hnarchive_spark.plans.registry import REGISTRY, _ensure_loaded

_REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def _correctness_files() -> list[tuple[int, str]]:
    out = []
    for f in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        out.append((int(f.rsplit("_r", 1)[1].split(".")[0]), f))
    return out


def max_round() -> int:
    """Highest driver round with a CORRECTNESS file on disk."""
    files = _correctness_files()
    return max(r for r, _ in files) if files else 0


def latest_green(before_round: int | None = None) -> dict[str, int]:
    """name -> latest green driver round, over files with round <
    ``before_round`` (all files if None).  The bound makes a rotation
    reproducible after the NEXT round's file lands: the round-N window
    was computed from rounds 1..N-1."""
    latest: dict[str, int] = {}
    for rnd, f in _correctness_files():
        if before_round is not None and rnd >= before_round:
            continue
        for name, rec in json.load(open(f)).items():
            green = (
                rec.get("rows_match")
                and rec.get("hash_match") in (True, None)
                and rec.get("err") is None
            )
            if green:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


# Per-round FRONT-LOAD lists (VERDICT r18 #3): an optimization round's
# touched query families must be driver-oracle-checked in the NEXT
# correctness window, ahead of pure staleness order — the staleness policy
# alone left only 2 of ~19 r18-touched queries inside the r18 window.
# Keyed by the round the window is built FOR (=_ROTATION_BUILT_FOR_ROUND =
# the before_round bound), so the rotation stays reproducible after that
# round's CORRECTNESS file lands.  Names are alphabetical within the list.
FRONT_LOAD: dict[int, list[str]] = {
    # Round 19: every family touched by the r18 optimization commits
    # (kmeans/PQ/IVF-PQ argmin, SemDeDup x5, pagerank, rerank arms,
    # bpe_train, embed_dup battery, store changelog, minhash probe) plus
    # the r18 verdict's three bench watch entries (minhash indexed/
    # incremental, rerank_recall10 — already in the family lists), plus
    # the three further queries the r19 driver-side probe-routing change
    # touches that the family lists above didn't already carry
    # (q_ann_ivf_indexed, q_ann_ivfpq_rebuild, q_hybrid_search_rrf_indexed).
    19: [
        "q_ann_ivf_indexed",
        "q_ann_ivfpq",
        "q_ann_ivfpq_indexed",
        "q_ann_ivfpq_rebuild",
        "q_ann_ivfpq_residual",
        "q_bpe_merge_pairs",
        "q_bpe_train",
        "q_dedup_minhash",
        "q_dedup_minhash_incremental",
        "q_dedup_minhash_indexed",
        "q_embed_dup",
        "q_embed_dup_capped",
        "q_hybrid_recall_arms",
        "q_hybrid_rerank",
        "q_hybrid_search_rrf_indexed",
        "q_kmeans_assign",
        "q_minhash_accuracy",
        "q_pagerank",
        "q_pq_codes",
        "q_rerank_recall10",
        "q_rerank_top1_fix",
        "q_semdedup",
        "q_semdedup_capped",
        "q_semdedup_incremental",
        "q_semdedup_indexed",
        "q_semdedup_indexed_capped",
        "q_store_changelog",
    ],
}


def rotation_order(before_round: int | None = None) -> list[str]:
    """Canonical candidate order for _VERIFY_FIRST: the round's FRONT_LOAD
    names first (touched-family coverage), then never-driver-verified
    oracled queries, then every driver-green name by ascending
    latest-green round.  Ties break ALPHABETICALLY — registration order
    would be import-order-dependent (a test importing one plan module
    directly before _ensure_loaded reorders REGISTRY), and the order here
    must be reproducible from any process."""
    _ensure_loaded()
    latest = latest_green(before_round)
    reg = list(REGISTRY)
    front = [n for n in FRONT_LOAD.get(before_round, []) if n in reg]
    front_set = set(front)
    rows_only = {n for n in reg if REGISTRY[n].oracle is None}
    never = sorted(
        n for n in reg if n not in latest and n not in rows_only and n not in front_set
    )
    stale = sorted(
        (n for n in reg if n in latest and n not in front_set),
        key=lambda n: (latest[n], n),
    )
    return front + never + stale


def main() -> None:
    _ensure_loaded()
    latest = latest_green()
    reg = list(REGISTRY)
    rows_only = [n for n in reg if REGISTRY[n].oracle is None]
    order = rotation_order()
    never = [n for n in order if n not in latest]
    print(f"# registered: {len(reg)}  oracled: {len(reg) - len(rows_only)}")
    print(f"# rows-only by design (weaker check only): {rows_only}")
    print(f"# never driver-verified (rotate FIRST): {never}")
    print("# staleness order (latest green round, name):")
    for n in order:
        if n in latest:
            print(f"    {latest[n]}  {n}")


if __name__ == "__main__":
    main()
