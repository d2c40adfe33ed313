"""Arrow-kernel BPE apply locked row-identical to the chained-regexp
projection (VERDICT r16 #1, the test_udtf_chunking.py twin discipline):

* fixture corpus — q_bpe_encode_kernel == q_bpe_encode, every column;
* seeded-fuzz STREAMS — the kernel's skip-scan sequential application
  (operators/bpe_encode.encode_tokens) == the naive one-fold-pass-per-
  rule-in-order reference over thousands of random token streams and
  adversarial rule lists (duplicate pairs, a == b runs, rules over
  merged tokens, punctuation needing regex quoting);
* seeded-fuzz CORPUS through Spark — a corpus of random texts, rules
  TRAINED on it by induce_bpe_rules, applied by both the regexp chain
  and the kernel: identical frames;
* the metering twin — bpe_token_counts_kernel == textops.bpe_token_count
  per doc_id on the fixture (the release --tokenizer-encoder contract).

The chain stays the hash-checked oracle twin; the kernel is what a
30k-merge production vocabulary runs (one plan node, O(doc pairs)
work per doc — not O(|rules|) corpus passes)."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from hnarchive_spark.functions import text as T
from hnarchive_spark.operators.bpe_encode import (
    bpe_token_counts_kernel,
    build_rank,
    encode_bpe_kernel,
    encode_tokens,
)
from hnarchive_spark.plans.registry import all_queries
from hnarchive_spark.plans.textops import (
    _BPE_DELIM,
    _bpe_merge_pattern,
    bpe_token_count,
    induce_bpe_rules,
)
from hnarchive_spark.tables import load

SF = "/root/testdata/sf0.001"


def _reference_apply(ts: list[str], rules: list[tuple[str, str]]) -> list[str]:
    """The regexp chain's LITERAL semantics, independently of the kernel's
    code: every rule, in order, as one leftmost non-overlapping regex
    substitution over the chr(1)-joined stream — Python ``re.sub`` with
    the SAME pattern string the Spark chain compiles
    (textops._bpe_merge_pattern: per-char-quoted pair with zero-width
    token-boundary lookarounds), whose leftmost-scan semantics match
    Java's replaceAll.  If the kernel's fold had a shared bug, this
    reference would catch it — it never calls the kernel's primitives."""
    e = _BPE_DELIM.join(ts)
    for a, b in rules:
        merged = a + b
        e = re.sub(_bpe_merge_pattern(a, b), lambda _m: merged, e)
    return e.split(_BPE_DELIM)


def test_kernel_matches_naive_sequential_fold_fuzz():
    """Thousands of random (stream, rule-list) cases, adversarially
    weighted: tiny alphabets force repeated merges, rule lists include
    duplicate pairs, self-pairs (a == b), and rules whose sides are
    other rules' MERGED tokens (so later merges re-create earlier
    rules' pairs — the cursor case a last-index-wins rank map would
    break)."""
    rng = random.Random(0xB9E17)
    alphabet = ["a", "b", "c", ".", "1"]
    for case in range(3000):
        # n >= 1: the kernel's domain is non-empty streams (the query
        # filters size(st) > 0 before the kernel, matching the chain) —
        # the joined-string reference can't represent [] at all
        n = rng.randint(1, 24)
        ts = [rng.choice(alphabet) for _ in range(n)]
        # grow a rule list over an expanding token universe, so rules can
        # legitimately reference merged tokens (and duplicate earlier pairs)
        universe = list(alphabet)
        rules: list[tuple[str, str]] = []
        for _ in range(rng.randint(0, 12)):
            a, b = rng.choice(universe), rng.choice(universe)
            rules.append((a, b))
            universe.append(a + b)
        want = _reference_apply(list(ts), rules)
        got = encode_tokens(list(ts), rules, build_rank(rules))
        assert got == want, (case, ts, rules)


def test_kernel_query_matches_regexp_chain_on_fixture(spark):
    q = all_queries()
    chain = sorted(map(tuple, q["q_bpe_encode"](spark, SF).collect()))
    kernel = sorted(map(tuple, q["q_bpe_encode_kernel"](spark, SF).collect()))
    assert len(chain) > 0 and chain == kernel


def test_kernel_matches_chain_on_trained_fuzz_corpus(spark):
    """End-to-end through Spark on a NON-fixture corpus: train rules on
    seeded random texts (more rounds than the fixture's 10), apply with
    the chained regexp projection and the kernel, compare frames."""
    rng = random.Random(0xFADE)
    words = ["ab", "abc", "a", "bc", "cc", "x1", "12", "..", ".", "b"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(1, 40))))
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    trained = induce_bpe_rules(spark, docs, rounds=12)
    pairs = [(a, b) for _k, a, b, _n in trained]
    assert len(pairs) >= 8  # the corpus must actually sustain training

    from hnarchive_spark.plans.textops import (
        _BPE_DELIM,
        _bpe_merge_pattern,
        _bpe_replacement_quote,
    )

    st = docs.select("doc_id", T.subtokens(F.col("text")).alias("st")).filter(
        F.size("st") > 0
    )
    enc = F.concat_ws(_BPE_DELIM, F.col("st"))
    for a, b in pairs:
        enc = F.regexp_replace(
            enc, F.lit(_bpe_merge_pattern(a, b)), F.lit(_bpe_replacement_quote(a + b))
        )
    chain = {
        r["doc_id"]: (r["fp"][:16], r["n"])
        for r in st.select(
            "doc_id",
            F.md5(enc).alias("fp"),
            F.size(F.split(enc, _BPE_DELIM)).alias("n"),
        ).collect()
    }
    kern = {
        r["doc_id"]: (r["enc_fp"], int(r["n_bpe_tokens"]))
        for r in encode_bpe_kernel(docs, pairs).collect()
    }
    assert len(chain) == 200 and chain == kern


def test_kernel_metering_matches_chain_meter(spark):
    """bpe_token_counts_kernel (the release --tokenizer-encoder=kernel
    meter) equals textops.bpe_token_count per doc on the fixture, over
    the SAME trained store rules q_select_token_budget_bpe uses."""
    from hnarchive_spark.scratch import built_once
    from hnarchive_spark.sources.tokenizer_store import (
        build_tokenizer_store,
        load_tokenizer_rules,
    )

    d = load(spark, SF, "documents")
    path = built_once(
        "bpe_tokenizer", SF, lambda p: build_tokenizer_store(spark, d, p)
    )
    rules = load_tokenizer_rules(path)
    eligible = d.filter(F.size(T.subtokens(F.col("text"))) > 0)
    chain = eligible.select("doc_id", bpe_token_count(rules).alias("n_tokens"))
    kern = bpe_token_counts_kernel(d, rules)
    joined = chain.withColumnRenamed("n_tokens", "c").join(kern, "doc_id", "full")
    bad = joined.filter(
        F.col("c").isNull()
        | F.col("n_tokens").isNull()
        | (F.col("c") != F.col("n_tokens"))
    )
    assert chain.count() > 0 and bad.count() == 0


def _chain_frame(spark, docs, pairs):
    """The actual Spark regexp chain (q_bpe_encode's expression, verbatim
    construction) producing (doc_id, enc_fp16, n_bpe_tokens)."""
    from hnarchive_spark.plans.textops import _bpe_replacement_quote

    st = docs.select("doc_id", T.subtokens(F.col("text")).alias("st")).filter(
        F.size("st") > 0
    )
    enc = F.concat_ws(_BPE_DELIM, F.col("st"))
    for a, b in pairs:
        enc = F.regexp_replace(
            enc, F.lit(_bpe_merge_pattern(a, b)), F.lit(_bpe_replacement_quote(a + b))
        )
    return st.select(
        "doc_id",
        F.substring(F.md5(enc), 1, 16).alias("fp"),
        F.size(F.split(enc, _BPE_DELIM)).alias("n"),
    )


def test_kernel_matches_chain_on_adversarial_handcrafted_rules(spark):
    """Chain-vs-kernel through SPARK with HAND-CRAFTED rule lists the
    trainer would rarely emit — duplicate pairs, self-pairs, rules whose
    sides are other rules' merged tokens (re-creating earlier rules'
    pairs), punctuation needing regex quoting — over docs built to
    trigger each shape.  This is the independence the fuzz reference
    cannot give alone: the right side here is Java's actual regexp
    engine."""
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # run of the same pair
            (2, "a a a a a"),            # self-pair chain (a,a)
            (3, "x y z x y z"),          # pair created by an earlier merge
            (4, ". . .. . ."),           # punctuation quoting
            (5, "a b c a b c a b"),      # (ab,c) over merged tokens
            (6, "b a b a b"),            # offset phase of rule (a,b)
        ],
        "doc_id long, text string",
    )
    rule_sets = [
        [("a", "b"), ("ab", "ab"), ("a", "b")],       # duplicate rule entry
        [("a", "a"), ("aa", "a"), ("aa", "aa")],      # self-pairs stacking
        [("x", "y"), ("xy", "z"), ("xyz", "xyz")],
        [(".", "."), ("..", ".."), ("..", ".")],      # metachar quoting
        [("a", "b"), ("c", "ab"), ("ab", "c")],       # sides from merges
    ]
    for pairs in rule_sets:
        chain = {
            r["doc_id"]: (r["fp"], r["n"])
            for r in _chain_frame(spark, docs, pairs).collect()
        }
        kern = {
            r["doc_id"]: (r["enc_fp"], r["n_bpe_tokens"])
            for r in encode_bpe_kernel(docs, pairs).collect()
        }
        assert chain == kern, pairs


def test_kernel_matches_chain_with_delimiter_collision(spark):
    """A document CONTAINING chr(1): the subtoken pattern's punctuation
    class emits it as a token, the chain's joined-stream representation
    then sees spurious segment boundaries — and row-identity demands the
    kernel reproduce exactly that behavior (it round-trips the token
    list through the delimiter representation; operators/bpe_encode.py).
    Production corpora are the kernel's whole audience, so this
    assumption is tested, not just documented."""
    docs = spark.createDataFrame(
        [
            (1, "a b \x01 a b"),          # stray control char between words
            (2, "a\x01b a b"),            # control char inside a word
            (3, "\x01\x01 a b"),          # leading run
            (4, "normal a b text"),       # control-free control group
        ],
        "doc_id long, text string",
    )
    pairs = [("a", "b"), ("ab", "ab")]
    chain = {
        r["doc_id"]: (r["fp"], r["n"])
        for r in _chain_frame(spark, docs, pairs).collect()
    }
    kern = {
        r["doc_id"]: (r["enc_fp"], r["n_bpe_tokens"])
        for r in encode_bpe_kernel(docs, pairs).collect()
    }
    assert chain == kern
    # and n_subtokens stays the RAW token-array length on both sides
    raw = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(T.subtokens(F.col("text"))).alias("n")
        ).collect()
    }
    for r in encode_bpe_kernel(docs, pairs).collect():
        assert r["n_subtokens"] == raw[r["doc_id"]]


def test_incremental_encoder_matches_scan_twin_fuzz():
    """encode_tokens (the incremental O(n log n) path — ADVICE r17) ==
    encode_tokens_scan (the per-pass-rescan reference) on LONGER fuzz
    streams than the re.sub harness can afford, including merge-dense
    tiny-alphabet streams where most adjacent pairs fold (the shape
    that made the rescan quadratic) and deep rule lists over merged
    tokens (cursor refresh paths in the heap)."""
    from hnarchive_spark.operators.bpe_encode import encode_tokens_scan

    rng = random.Random(0x1C4)
    for case in range(400):
        alphabet = ["a", "b", "c", "d", ".", "1"][: rng.randint(2, 6)]
        n = rng.randint(1, 400)
        ts = [rng.choice(alphabet) for _ in range(n)]
        universe = list(alphabet)
        rules: list[tuple[str, str]] = []
        for _ in range(rng.randint(0, 60)):
            a, b = rng.choice(universe), rng.choice(universe)
            rules.append((a, b))
            universe.append(a + b)
        rank = build_rank(rules)
        want = encode_tokens_scan(list(ts), rules, rank)
        got = encode_tokens(list(ts), rules, rank)
        assert got == want, (case, n, len(rules))
