"""Persisted TRAINED-TOKENIZER store: the iteratively-induced BPE merge
rules as a versioned artifact behind the atomic ``_CURRENT`` pointer.

A production pipeline trains a tokenizer ONCE and applies it everywhere
(every encode/pack/budget pass, forever) — re-inducing per query would be
the retokenize-per-probe mistake the BM25/IVF index families exist to
avoid.  This store persists :func:`induce_bpe_rules`' output so the apply
side (``q_bpe_encode``'s map-only literal-regexp projection) never pays
training.

Unlike the appendable index families (postings, signatures, codes), a
trained tokenizer is IMMUTABLE once published: applying it must be
reproducible forever (a rule list that shifts under consumers would
re-segment already-encoded history), so the lifecycle is build ->
publish -> load/apply, with retrains landing as NEW versions behind the
same pointer (index_version.py) — consumers pin a version or follow the
pointer, and old versions stay readable until pruned.

The artifact is a single tiny JSON (rounds x ~3 short strings): driver-side
IO by design, the bounded-metadata convention (centroid lists, quality
weights).  The 100 TB story lives in training (O(rounds) distributed
passes, induce_bpe_rules) and apply (map-only regexp chain broadcast as
query literals); the store itself is vocabulary-sized.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from hnarchive_spark.sources.index_version import (
    current_index_version,
    index_root,
    publish_index_version,
)


def _publish_rules(path: str, rules: list[tuple[int, str, str, int]]) -> str:
    """Write the rule list as ``<path>/v<N+1>/_RULES.json`` and publish
    at the atomic pointer swap.  ``rounds`` is recorded as len(rules) —
    the count actually induced, which is SHORTER than the requested
    rounds when induction exhausts a tiny corpus (review r16: build
    previously recorded the request, extend the reality)."""
    new_v = (current_index_version(path) or 0) + 1
    vdir = os.path.join(path, f"v{new_v}")
    os.makedirs(vdir, exist_ok=True)
    tmp = os.path.join(vdir, "_RULES.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(
            {
                "rounds": len(rules),
                "rules": [
                    {"merge_round": k, "left": a, "right": b, "n_occurrences": n}
                    for k, a, b, n in rules
                ],
            },
            fh,
        )
    os.replace(tmp, os.path.join(vdir, "_RULES.json"))
    publish_index_version(path, new_v)
    return vdir


def build_tokenizer_store(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    rounds: int | None = None,
    text_col: str = "text",
) -> str:
    """Induce ``rounds`` BPE merge rules over ``docs`` (the full iterative
    re-count loop) and publish them as ``<path>/v<N+1>/_RULES.json``
    behind the atomic pointer swap.  Returns the new version directory."""
    from hnarchive_spark.plans.textops import BPE_TRAIN_ROUNDS, induce_bpe_rules

    n_rounds = BPE_TRAIN_ROUNDS if rounds is None else rounds
    return _publish_rules(path, induce_bpe_rules(spark, docs, n_rounds, text_col))


def extend_tokenizer_store(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    extra_rounds: int,
    text_col: str = "text",
) -> str:
    """CONTINUE training from the published rules: apply the current
    version's rule list to the corpus (one chained map-only pass —
    BPE's training state IS the rule list, so the evolved streams are
    reproduced exactly), induce ``extra_rounds`` more merges, and
    publish prefix+new as a new version behind the pointer.

    On the SAME corpus this is provably identical to training
    rounds+extra_rounds from scratch (the equivalence the test locks) —
    which is the point: growing a vocabulary costs only the NEW rounds,
    never a from-scratch retrain.  Returns the new version directory."""
    from hnarchive_spark.plans.textops import induce_bpe_rules

    prefix = load_tokenizer_rules(path)
    new = induce_bpe_rules(
        spark, docs, extra_rounds, text_col, initial_rules=prefix
    )
    return _publish_rules(path, prefix + new)


def load_tokenizer_rules(path: str) -> list[tuple[int, str, str, int]]:
    """The CURRENT version's rules, in induction order."""
    with open(os.path.join(index_root(path), "_RULES.json")) as fh:
        meta = json.load(fh)
    return [
        (r["merge_round"], r["left"], r["right"], r["n_occurrences"])
        for r in meta["rules"]
    ]
