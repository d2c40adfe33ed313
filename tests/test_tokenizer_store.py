"""Trained-tokenizer store (sources/tokenizer_store.py): the induced BPE
rule list must round-trip exactly, retrains must land as new versions
behind the atomic pointer (immutable-once-published — no append path),
and the maintenance scheduler must classify it as non-executable."""

from __future__ import annotations

import os

from hnarchive_spark.sources.index_version import (
    current_index_version,
    prune_index_versions,
)
from hnarchive_spark.sources.maintenance import _ACTIONS, detect_index_kind
from hnarchive_spark.sources.tokenizer_store import (
    build_tokenizer_store,
    load_tokenizer_rules,
)
from hnarchive_spark.plans.textops import induce_bpe_rules
from hnarchive_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_build_load_roundtrip_and_detection(spark, tmp_path):
    docs = load(spark, SF, "documents")
    root = str(tmp_path / "tok")
    vdir = build_tokenizer_store(spark, docs, root, rounds=4)
    assert os.path.exists(os.path.join(vdir, "_RULES.json"))
    assert detect_index_kind(root) == "tokenizer"
    assert _ACTIONS["tokenizer"][0] is False  # retrain-only, never compacted

    got = load_tokenizer_rules(root)
    assert got == induce_bpe_rules(spark, docs, rounds=4)
    assert [k for k, *_ in got] == [1, 2, 3, 4]


def test_retrain_publishes_new_version(spark, tmp_path):
    from pyspark.sql import functions as F

    docs = load(spark, SF, "documents")
    root = str(tmp_path / "tok")
    build_tokenizer_store(spark, docs, root, rounds=2)
    v1_rules = load_tokenizer_rules(root)
    assert current_index_version(root) == 1

    # retrain on a different slice -> new version, old one intact on disk
    build_tokenizer_store(
        spark, docs.filter(F.col("doc_id") % 2 == 0), root, rounds=3
    )
    assert current_index_version(root) == 2
    assert len(load_tokenizer_rules(root)) == 3
    assert os.path.exists(os.path.join(root, "v1", "_RULES.json"))

    removed = prune_index_versions(root)
    assert any("v1" in p for p in removed)
    assert len(load_tokenizer_rules(root)) == 3  # current survives prune
    assert v1_rules  # (rules captured before prune were non-empty)


def test_extend_equals_training_longer(spark, tmp_path):
    """The incremental-training identity: build(4 rounds) then
    extend(+3) over the same corpus publishes EXACTLY the rule list
    build(7 rounds) induces from scratch — BPE's training state is the
    rule list, so applying the prefix reproduces round 4's streams and
    the continuation sees what a longer run would have seen.  Growing a
    vocabulary therefore costs only the new rounds."""
    from hnarchive_spark.sources.tokenizer_store import extend_tokenizer_store

    docs = load(spark, SF, "documents")
    root = str(tmp_path / "tok")
    build_tokenizer_store(spark, docs, root, rounds=4)
    extend_tokenizer_store(spark, docs, root, extra_rounds=3)
    assert current_index_version(root) == 2
    got = load_tokenizer_rules(root)
    assert got == induce_bpe_rules(spark, docs, rounds=7)
    assert [k for k, *_ in got] == list(range(1, 8))
