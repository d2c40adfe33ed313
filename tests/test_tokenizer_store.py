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


def test_freshness_drift_flags_then_extend_clears(spark, tmp_path):
    """VERDICT r16 #5 — the tokenizer-freshness loop: the store records
    its training-corpus subtoken snapshot; a drifted corpus (novel
    subtokens the training never saw) drops coverage below the floor
    and the scheduler recommends `tokenizer extend`; running the extend
    refreshes both the rules AND the snapshot, so the recommendation
    clears."""
    from pyspark.sql import functions as F

    from hnarchive_spark.sources.maintenance import run_maintenance
    from hnarchive_spark.sources.tokenizer_store import (
        extend_tokenizer_store,
        tokenizer_coverage,
        tokenizer_needs_extend,
    )

    docs = load(spark, SF, "documents")
    root = str(tmp_path / "tok")
    build_tokenizer_store(spark, docs, root, rounds=3)

    # same corpus: 100% coverage by construction, nothing due
    cov = tokenizer_coverage(spark, docs, root)
    assert cov["coverage_e6"] == 1_000_000 and cov["oov_tokens"] == 0
    assert not tokenizer_needs_extend(spark, docs, root)

    # drifted corpus: half the docs speak a vocabulary that did not
    # exist at training time
    drift_rows = [
        (100_000 + i, " ".join(f"neolex{i}x{j}" for j in range(30)))
        for i in range(60)
    ]
    drifted = docs.select("doc_id", "text").union(
        spark.createDataFrame(drift_rows, "doc_id long, text string")
    )
    cov2 = tokenizer_coverage(spark, drifted, root)
    assert cov2["oov_tokens"] > 0 and cov2["coverage_e6"] < 990_000
    assert tokenizer_needs_extend(spark, drifted, root)

    # the scheduler surfaces it (report-only, like every trained family)
    [rec] = run_maintenance(spark, [root], dry_run=True, corpus=drifted)
    assert rec["kind"] == "tokenizer" and rec["due"] and not rec["executed"]
    assert "tokenizer extend" in rec["action"]
    assert rec["coverage"]["coverage_e6"] == cov2["coverage_e6"]

    # extend over the drifted corpus -> snapshot refreshes -> quiet
    extend_tokenizer_store(spark, drifted, root, extra_rounds=2)
    assert not tokenizer_needs_extend(spark, drifted, root)
    [rec2] = run_maintenance(spark, [root], dry_run=True, corpus=drifted)
    assert not rec2["due"] and rec2["action"] is None

    # without a corpus there is nothing to measure drift against
    [rec3] = run_maintenance(spark, [root], dry_run=True)
    assert not rec3["due"]


def test_legacy_store_without_snapshot_is_unverifiable(spark, tmp_path):
    """A store published before the snapshot existed must not trip the
    scheduler (freshness unverifiable, report says so)."""
    import json

    from hnarchive_spark.sources.index_version import index_root
    from hnarchive_spark.sources.maintenance import run_maintenance
    from hnarchive_spark.sources.tokenizer_store import (
        load_tokenizer_vocab,
        tokenizer_needs_extend,
    )

    docs = load(spark, SF, "documents")
    root = str(tmp_path / "tok")
    build_tokenizer_store(spark, docs, root, rounds=2)
    # strip the snapshot in place: the legacy on-disk shape
    rules_file = os.path.join(index_root(root), "_RULES.json")
    meta = json.load(open(rules_file))
    meta.pop("vocab")
    json.dump(meta, open(rules_file, "w"))

    assert load_tokenizer_vocab(root) is None
    assert not tokenizer_needs_extend(spark, docs, root)
    [rec] = run_maintenance(spark, [root], dry_run=True, corpus=docs)
    assert not rec["due"] and "unverifiable" in rec["result"]


def test_extend_on_delta_corpus_unions_snapshot(spark, tmp_path):
    """Review r17: an extend driven by ONLY the drifted delta must not
    forget the original training corpus's subtokens — the snapshot
    unions (counts summed, re-capped), so the post-extend audit over the
    FULL corpus still clears.  A replace-semantics snapshot would flag
    the store due forever after any delta-corpus extend."""
    from hnarchive_spark.sources.tokenizer_store import (
        extend_tokenizer_store,
        tokenizer_coverage,
        tokenizer_needs_extend,
    )

    docs = load(spark, SF, "documents")
    root = str(tmp_path / "tok")
    build_tokenizer_store(spark, docs, root, rounds=2)

    delta = spark.createDataFrame(
        [(200_000 + i, " ".join(f"brandnew{i}z{j}" for j in range(25)))
         for i in range(40)],
        "doc_id long, text string",
    )
    full = docs.select("doc_id", "text").union(delta)
    assert tokenizer_needs_extend(spark, full, root)  # drift detected

    # extend on the DELTA ONLY — the natural operator response
    extend_tokenizer_store(spark, delta, root, extra_rounds=1)
    cov = tokenizer_coverage(spark, full, root)
    assert cov["coverage_e6"] == 1_000_000 and cov["oov_tokens"] == 0
    assert not tokenizer_needs_extend(spark, full, root)


def test_id_map_base_preferred_and_first_merge_wins(tmp_path):
    """load_tokenizer_id_map edge semantics, on a hand-built store: id 0
    is <unk>; base snapshot ids are lexicographic 1..B; merge round k ->
    id B+k; a merged string equal to a BASE subtoken keeps the base id
    (base-preferred); a re-induced duplicate merged string keeps its
    FIRST merge id; decode stays total over every id."""
    import json as _json
    import os as _os

    from hnarchive_spark.sources.index_version import publish_index_version
    from hnarchive_spark.sources.tokenizer_store import (
        decode_token_ids,
        load_tokenizer_id_map,
    )

    root = str(tmp_path / "tok")
    vdir = _os.path.join(root, "v1")
    _os.makedirs(vdir)
    # base vocab: ab, x, y, z  (note: "ab" is ALSO rule 1's merged token)
    rules = [
        {"merge_round": 1, "left": "a", "right": "b", "n_occurrences": 9},
        {"merge_round": 2, "left": "x", "right": "y", "n_occurrences": 5},
        {"merge_round": 3, "left": "x", "right": "y", "n_occurrences": 2},
    ]
    with open(_os.path.join(vdir, "_RULES.json"), "w") as fh:
        _json.dump(
            {"rounds": 3, "rules": rules,
             "vocab": {"ab": 4, "x": 3, "y": 2, "z": 1}},
            fh,
        )
    publish_index_version(root, 1)

    tok2id, id2tok = load_tokenizer_id_map(root)
    # base: lexicographic ab=1, x=2, y=3, z=4 (B=4)
    assert tok2id["ab"] == 1 and tok2id["x"] == 2
    assert tok2id["y"] == 3 and tok2id["z"] == 4
    # merge 1's "ab" collides with base "ab" -> base id kept
    # merge 2's "xy" -> B+2 = 6; merge 3 re-induces "xy" -> first wins
    assert tok2id["xy"] == 6
    # decode is total: every id names exactly one string
    assert id2tok[0] == "<unk>"
    assert decode_token_ids([0, 1, 5, 6, 7], id2tok) == [
        "<unk>", "ab", "ab", "xy", "xy",
    ]
    assert len(id2tok) == 1 + 4 + 3
    # unknown token maps to <unk>
    assert tok2id.get("never-seen", 0) == 0


def test_id_map_none_for_legacy_store(tmp_path):
    """A store published before the snapshot existed has no base
    vocabulary — the id map is unavailable (retrain to upgrade), not
    silently wrong."""
    import json as _json
    import os as _os

    from hnarchive_spark.sources.index_version import publish_index_version
    from hnarchive_spark.sources.tokenizer_store import load_tokenizer_id_map

    root = str(tmp_path / "tok")
    vdir = _os.path.join(root, "v1")
    _os.makedirs(vdir)
    with open(_os.path.join(vdir, "_RULES.json"), "w") as fh:
        _json.dump({"rounds": 0, "rules": []}, fh)
    publish_index_version(root, 1)
    assert load_tokenizer_id_map(root) is None


def test_non_clearing_extend_disarms_not_unbounded(spark, tmp_path, monkeypatch):
    """review r18: an executed extend whose post-audit coverage is STILL
    below the floor (snapshot cap on a heavy-tailed corpus) must not
    re-arm an identical extend on the next scheduler pass — before the
    fix every pass burned another full distributed training pass,
    unbounded.  The non-clearing outcome is recorded in a sidecar keyed
    to the published version; a newer publish re-arms execution, and a
    clearing extend removes the sidecar."""
    import hnarchive_spark.sources.tokenizer_store as ts
    from hnarchive_spark.sources.maintenance import _EXTEND_AUDIT, run_maintenance

    docs = load(spark, SF, "documents").limit(20)
    root = str(tmp_path / "tok")
    build_tokenizer_store(spark, docs, root, rounds=2)

    # simulate the capped-snapshot ceiling: every audit reads below the
    # floor no matter what the extend publishes
    low = {
        "total_tokens": 10,
        "in_vocab_tokens": 1,
        "oov_tokens": 9,
        "oov_types": 9,
        "coverage_e6": 100_000,
    }
    monkeypatch.setattr(ts, "tokenizer_coverage", lambda *a, **k: dict(low))

    [rec] = run_maintenance(spark, [root], corpus=docs, tokenizer_extend_rounds=1)
    assert rec["due"] and rec["executed"] and rec["cleared"] is False
    assert "WARNING" in rec["result"]
    assert os.path.exists(os.path.join(root, _EXTEND_AUDIT))
    v_after = current_index_version(root)
    assert v_after == 2  # the one extend DID publish

    # pass 2: still due, but DISARMED — no second training pass, no new
    # version, and the report says why and how to force
    [rec2] = run_maintenance(spark, [root], corpus=docs, tokenizer_extend_rounds=1)
    assert rec2["due"] and not rec2["executed"]
    assert "skipped" in rec2["result"] and "retrain" in rec2["result"]
    assert current_index_version(root) == v_after

    # any newer publish (manual retrain/extend) makes the sidecar stale
    # and re-arms exactly one more attempt
    build_tokenizer_store(spark, docs, root, rounds=2)
    assert current_index_version(root) == 3
    [rec3] = run_maintenance(spark, [root], corpus=docs, tokenizer_extend_rounds=1)
    assert rec3["executed"] and rec3["cleared"] is False
    assert current_index_version(root) == 4

    # clearing path: due before the extend, clears after -> sidecar gone
    build_tokenizer_store(spark, docs, root, rounds=2)  # re-arm at v5
    seen = {"n": 0}

    def low_then_high(*a, **k):
        seen["n"] += 1
        return dict(low) if seen["n"] == 1 else {**low, "coverage_e6": 1_000_000}

    monkeypatch.setattr(ts, "tokenizer_coverage", low_then_high)
    [rec4] = run_maintenance(spark, [root], corpus=docs, tokenizer_extend_rounds=1)
    assert rec4["executed"] and rec4["cleared"] is True
    assert "WARNING" not in rec4["result"]
    assert not os.path.exists(os.path.join(root, _EXTEND_AUDIT))
