"""q_bpe_encode: the BPE apply step must match a literal Python greedy-fold
reference on an ADVERSARIAL corpus (regex metachars as tokens, consecutive
same-pair runs, digit runs) — the DuckDB oracle covers the synthetic corpus;
this covers the inputs the fixture never exercises.  The Spark side applies
each merge rule as one literal regexp_replace pass with zero-width token-
boundary lookarounds, so the equivalence under test is regex-greedy ==
fold-greedy on every edge the regex could plausibly get wrong."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pytest

from hnarchive_spark.functions.text import SUBTOKEN_PATTERN
from hnarchive_spark.plans.registry import all_queries
from hnarchive_spark.plans.textops import BPE_TOP_PAIRS

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


def _py_bpe(texts: list[str]) -> dict[int, tuple[int, int, str]]:
    """Literal reference: top-K adjacent pairs (count desc, pair asc), then
    one greedy left-to-right fold pass per rule in rank order."""
    toks = {i: re.findall(SUBTOKEN_PATTERN, t) for i, t in enumerate(texts)}
    pairs: Counter[str] = Counter()
    for ts in toks.values():
        for x, y in zip(ts, ts[1:]):
            pairs[f"{x} {y}"] += 1
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
    rules = [p.split(" ") for p, _ in ranked[:BPE_TOP_PAIRS]]
    out = {}
    for i, ts in toks.items():
        if not ts:
            continue
        cur = ts
        for a, b in rules:
            acc: list[str] = []
            for x in cur:
                if acc and acc[-1] == a and x == b:
                    acc[-1] = a + b
                else:
                    acc.append(x)
            cur = acc
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


def test_bpe_encode_compresses_fixture(spark):
    """On the synthetic corpus the top-20 merges must actually fire: total
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
    builder's own regexp chain (same rules, same quoting) and strips
    the chr(1) delimiters."""
    from pyspark.sql import functions as F

    from hnarchive_spark.functions import text as T
    from hnarchive_spark.plans.textops import (
        _BPE_DELIM,
        _bpe_merge_pairs_df,
        _bpe_regex_quote,
        _bpe_replacement_quote,
    )
    from hnarchive_spark.tables import load

    sf = "/root/testdata/sf0.001"
    rules = [
        (r["pair"].split(" ")[0], r["pair"].split(" ")[1])
        for r in sorted(
            _bpe_merge_pairs_df(spark, sf).collect(), key=lambda r: r["rank"]
        )
    ]
    stoks = (
        load(spark, sf, "documents")
        .select("doc_id", T.subtokens(F.col("text")).alias("stk"))
        .filter(F.size("stk") > 0)
    )
    e = F.concat_ws(_BPE_DELIM, F.col("stk"))
    for a, b in rules:
        pat = (
            "(?<![^\x01])" + _bpe_regex_quote(a) + "\x01"
            + _bpe_regex_quote(b) + "(?![^\x01])"
        )
        e = F.regexp_replace(e, F.lit(pat), F.lit(_bpe_replacement_quote(a + b)))
    stripped = F.regexp_replace(e, F.lit("\x01"), F.lit(""))
    diff = stoks.filter(F.concat_ws("", F.col("stk")) != stripped)
    assert diff.count() == 0
