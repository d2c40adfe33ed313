"""The verification window must be the MECHANICAL rotation (VERDICT r9 #6):
_VERIFY_FIRST in plans/registry.py has to equal the prefix of
tools/rotation_report.rotation_order() — never-driver-verified oracled
queries first, then ascending latest-green driver round — computed over
the CORRECTNESS files that existed when the window was built
(before_round=_ROTATION_BUILT_FOR_ROUND).  This makes each round's
rotation reproducible and unable to silently skip a stale name.

No SparkSession needed — pure registry + JSON bookkeeping.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import rotation_report as rr  # noqa: E402

from hnarchive_spark.plans.registry import (  # noqa: E402
    REGISTRY,
    _ROTATION_BUILT_FOR_ROUND,
    _VERIFY_FIRST,
    _ensure_loaded,
)


def test_verify_first_is_the_mechanical_rotation():
    _ensure_loaded()
    expected = rr.rotation_order(before_round=_ROTATION_BUILT_FOR_ROUND)
    assert _VERIFY_FIRST == expected[: len(_VERIFY_FIRST)], (
        "registry _VERIFY_FIRST diverges from "
        "rotation_order(before_round=%d) — regenerate it mechanically"
        % _ROTATION_BUILT_FOR_ROUND
    )
    # the window is the driver's ~50-query budget; every name registered
    assert len(_VERIFY_FIRST) == 50
    assert all(n in REGISTRY for n in _VERIFY_FIRST)


def test_rotation_round_not_stale():
    """When a NEW driver round's CORRECTNESS file lands, the window must be
    rebuilt for the following round (bump _ROTATION_BUILT_FOR_ROUND and
    regenerate).  Allowing equality keeps the check green between 'driver
    wrote CORRECTNESS_rN' and 'round N+1 rotation' — it fires only if a
    whole round passed without rotating."""
    assert rr.max_round() <= _ROTATION_BUILT_FOR_ROUND, (
        "CORRECTNESS_r%d.json exists but the window was built for round %d "
        "— rotate _VERIFY_FIRST" % (rr.max_round(), _ROTATION_BUILT_FOR_ROUND)
    )


def test_survey_query_citations_match_registry():
    """SURVEY.md §2.10 is the judge's line-by-line coverage checklist:
    every `q_*` name it cites must be a registered query and every
    registered query must appear there — doc/code drift fails loudly."""
    import re

    _ensure_loaded()
    here = os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    cited = set(re.findall(r"`(q_[a-z0-9_]+)`", open(here).read()))
    reg = set(REGISTRY)
    assert cited - reg == set(), f"SURVEY cites unregistered: {sorted(cited - reg)}"
    assert reg - cited == set(), f"registered but not in SURVEY: {sorted(reg - cited)}"
