"""q_bpe_train / q_bpe_encode: the ITERATIVE BPE induction (re-count pair
frequencies after EACH merge — VERDICT r15 #2) and the apply step must match
a literal Python greedy-fold reference on an ADVERSARIAL corpus (regex
metachars as tokens, consecutive same-pair runs, digit runs, rules that only
exist after an earlier merge) — the DuckDB oracle covers the synthetic
corpus; this covers the inputs the fixture never exercises.  The Spark side
applies each merge rule as one literal regexp_replace pass with zero-width
token-boundary lookarounds, so the equivalence under test is regex-greedy ==
fold-greedy on every edge the regex could plausibly get wrong — including
multi-char non-alnum MERGED tokens as rule sides (per-char quoting)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pytest

from hnarchive_spark.functions.text import SUBTOKEN_PATTERN
from hnarchive_spark.plans.registry import all_queries
from hnarchive_spark.plans.textops import BPE_TRAIN_ROUNDS, induce_bpe_rules

# texts chosen to stress: '(' '.' '$' '\\' '*' '+' single-glyph tokens (regex
# quoting), runs like "! ! !" (greedy non-overlap within a same-token run),
# pairs whose merged product equals a base subtoken elsewhere ("ab"), and
# rules that only fire after an earlier rule has merged their left side.
_TEXTS = [
    "a b a b a b c",
    "! ! ! ! !",
    "x ( y ( z ( (",
    "$ $ $ \\ \\ \\",
    "ab c ab c a b c",
    "1 2 3 1 2 3 1 2",
    "a b b a b b",
    ". . + + * * . .",
    "the quick fox the quick fox",
    "a a a a",  # space-separated single letters: pair ('a','a') is live,
    # exercising the greedy every-other-merge within a same-token run
    "q $ q $ q $",
    "end",
]


def _fold(ts: list[str], a: str, b: str) -> list[str]:
    """One greedy left-to-right merge pass of rule (a, b)."""
    acc: list[str] = []
    for x in ts:
        if acc and acc[-1] == a and x == b:
            acc[-1] = a + b
        else:
            acc.append(x)
    return acc


def _py_induce(
    toks: dict[int, list[str]], rounds: int
) -> list[tuple[int, str, str, int]]:
    """Literal iterative reference: per round, count adjacent pairs on the
    CURRENT streams, take the argmax (count desc, pair asc), apply it."""
    streams = [list(ts) for ts in toks.values() if len(ts) >= 2]
    rules: list[tuple[int, str, str, int]] = []
    for k in range(1, rounds + 1):
        pairs: Counter[str] = Counter()
        for ts in streams:
            for x, y in zip(ts, ts[1:]):
                pairs[f"{x} {y}"] += 1
        if not pairs:
            break
        pair, n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        a, b = pair.split(" ")
        rules.append((k, a, b, n))
        streams = [_fold(ts, a, b) for ts in streams]
    return rules


def _py_bpe(texts: list[str]) -> dict[int, tuple[int, int, str]]:
    """Iterative reference encode: induce BPE_TRAIN_ROUNDS rules, then one
    greedy fold pass per rule in induction order over every document."""
    toks = {i: re.findall(SUBTOKEN_PATTERN, t) for i, t in enumerate(texts)}
    rules = _py_induce(toks, BPE_TRAIN_ROUNDS)
    out = {}
    for i, ts in toks.items():
        if not ts:
            continue
        cur = ts
        for _k, a, b, _n in rules:
            cur = _fold(cur, a, b)
        joined = "\x01".join(cur)
        fp = hashlib.md5(joined.encode("utf-8")).hexdigest()[:16]
        out[i] = (len(ts), len(cur), fp)
    return out


@pytest.fixture(scope="module")
def crafted_sf(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe_sf")
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_bpe_encode_matches_python_reference(spark, crafted_sf):
    got = {
        r["doc_id"]: (r["n_subtokens"], r["n_bpe_tokens"], r["enc_fp"])
        for r in all_queries()["q_bpe_encode"](spark, crafted_sf).collect()
    }
    assert got == _py_bpe(_TEXTS)


def test_induction_matches_python_reference(spark, crafted_sf):
    from hnarchive_spark.tables import load

    got = induce_bpe_rules(spark, load(spark, crafted_sf, "documents"))
    toks = {i: re.findall(SUBTOKEN_PATTERN, t) for i, t in enumerate(_TEXTS)}
    assert got == _py_induce(toks, BPE_TRAIN_ROUNDS)


def test_iterative_induction_composes_merges(spark):
    """THE case one-shot induction gets wrong (VERDICT r15 #2's required
    test): merge #2's pair exists ONLY in merge #1's output.  'ab ab ab
    ab' has one distinct pair ('ab','ab'); after that merge the stream is
    [abab, abab], so round 2 must induce ('abab','abab') — a pair whose
    raw-corpus count is ZERO and which a frequency snapshot can never
    rank."""
    docs = spark.createDataFrame(
        [("ab ab ab ab",), ("ab ab ab ab",)], "text string"
    )
    rules = induce_bpe_rules(spark, docs, rounds=2)
    assert [(a, b) for _k, a, b, _n in rules] == [("ab", "ab"), ("abab", "abab")]
    # round-2's pair has zero occurrences in the RAW corpus
    raw_pairs = Counter()
    for t in ["ab ab ab ab", "ab ab ab ab"]:
        ts = re.findall(SUBTOKEN_PATTERN, t)
        for x, y in zip(ts, ts[1:]):
            raw_pairs[(x, y)] += 1
    assert raw_pairs[("abab", "abab")] == 0
    assert rules[1][3] == 2  # one post-merge occurrence per doc


def test_induced_multichar_metachar_rule_sides(spark):
    """Round 2+ rule sides can be MERGED multi-char non-alnum tokens
    ('..' from '. .') — the per-char regex quoting must keep them literal
    (the old whole-token single escape would emit '\\..' where the second
    '.' is a metachar)."""
    docs = spark.createDataFrame([(". . . .",), (". . . .",)], "text string")
    rules = induce_bpe_rules(spark, docs, rounds=2)
    assert [(a, b) for _k, a, b, _n in rules] == [(".", "."), ("..", "..")]


def test_bpe_encode_compresses_fixture(spark):
    """On the synthetic corpus the induced merges must actually fire: total
    encoded tokens strictly below total subtokens, and never above per-doc."""
    from pyspark.sql import functions as F

    df = all_queries()["q_bpe_encode"](spark, "/root/testdata/sf0.001")
    agg = df.agg(
        F.sum("n_subtokens").alias("before"),
        F.sum("n_bpe_tokens").alias("after"),
        F.max(F.col("n_bpe_tokens") > F.col("n_subtokens")).alias("grew"),
    ).collect()[0]
    assert agg["after"] < agg["before"]
    assert not agg["grew"]


def test_bpe_encode_conserves_characters(spark):
    """Merging can move token boundaries but never characters: the
    delimiter-stripped encoded stream must equal the concatenated
    subtokens, byte for byte, for every fixture doc.  Replays the
    builder's own regexp chain (the ITERATIVELY-induced rules, same
    quoting) and strips the chr(1) delimiters."""
    from pyspark.sql import functions as F

    from hnarchive_spark.functions import text as T
    from hnarchive_spark.plans.textops import (
        _BPE_DELIM,
        _bpe_merge_pattern,
        _bpe_replacement_quote,
    )
    from hnarchive_spark.tables import load

    sf = "/root/testdata/sf0.001"
    rules = [
        (a, b) for _k, a, b, _n in induce_bpe_rules(spark, load(spark, sf, "documents"))
    ]
    stoks = (
        load(spark, sf, "documents")
        .select("doc_id", T.subtokens(F.col("text")).alias("stk"))
        .filter(F.size("stk") > 0)
    )
    e = F.concat_ws(_BPE_DELIM, F.col("stk"))
    for a, b in rules:
        e = F.regexp_replace(
            e, F.lit(_bpe_merge_pattern(a, b)), F.lit(_bpe_replacement_quote(a + b))
        )
    stripped = F.regexp_replace(e, F.lit("\x01"), F.lit(""))
    diff = stoks.filter(F.concat_ws("", F.col("stk")) != stripped)
    assert diff.count() == 0


def test_induction_matches_reference_on_seeded_fuzz_corpus(spark):
    """Seeded-random corpus (fixed seed — deterministic, no flake): 40
    docs over a small alphabet stacked with same-glyph runs and regex
    metachars, 6 induction rounds — the Spark regexp-greedy trainer must
    equal the Python fold-greedy reference on inputs nobody hand-picked
    (the crafted-corpus test's complement)."""
    import random

    rng = random.Random(0xBEEF)
    alphabet = ["a", "b", "ab", "1", "2", ".", "(", "$", "\\", "*"]
    texts = [
        " ".join(rng.choice(alphabet) for _ in range(rng.randint(2, 30)))
        for _ in range(40)
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = induce_bpe_rules(spark, docs, rounds=6)
    toks = {i: re.findall(SUBTOKEN_PATTERN, t) for i, t in enumerate(texts)}
    assert got == _py_induce(toks, 6) and len(got) == 6
