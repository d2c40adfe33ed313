"""BPE apply scaling probe: chain-vs-kernel encode walls as the merge
list GROWS — the measurement behind the kernel's reason to exist
(operators/bpe_encode.py).  The regexp chain pays one Catalyst node and
one corpus regex pass per rule, so its wall should grow ~linearly in
|rules|; the kernel is one mapInPandas stage whose per-doc work is
bounded by the doc's distinct adjacent pairs, so its wall should stay
~flat.  Trains REAL rules on the corpus (induce_bpe_rules — synthetic
rules would never fire and flatter the chain), then times both apply
paths at growing rule-list prefixes, min-of-3 with cache clears, noop
sink.

Run: python tools/bpe_apply_scaling_probe.py [rounds] [prefix ...]
     (defaults: 50 rounds, prefixes 10 25 50)

DOC-LENGTH axis (VERDICT r17 'what's wrong' #1 — the r17 probe varied
|rules| only, never doc length, leaving the per-doc worst case
unprobed):

Run: python tools/bpe_apply_scaling_probe.py doclen [len ...]
     (default lengths 1000 10000 100000)

Builds adversarially merge-dense synthetic docs (tiny alphabet, rules
TRAINED on the stream so most passes actually fire), then times
(a) the pure-Python encoders — encode_tokens (incremental O(n log n))
vs encode_tokens_scan (per-pass rescan, O(passes x n)) — per doc
length, and (b) the Spark kernel end-to-end wall over one such doc per
core.  The scan's wall should grow superlinearly on the merge-dense
stream; the incremental path near-linearly.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from hnarchive_spark.functions import text as T
from hnarchive_spark.operators.bpe_encode import encode_bpe_kernel
from hnarchive_spark.plans.textops import (
    _BPE_DELIM,
    _bpe_merge_pattern,
    _bpe_replacement_quote,
    induce_bpe_rules,
)
from hnarchive_spark.session import get_spark
from hnarchive_spark.tables import load


def _chain_apply(docs, pairs):
    st = docs.select("doc_id", T.subtokens(F.col("text")).alias("st")).filter(
        F.size("st") > 0
    )
    enc = F.concat_ws(_BPE_DELIM, F.col("st"))
    for a, b in pairs:
        enc = F.regexp_replace(
            enc, F.lit(_bpe_merge_pattern(a, b)), F.lit(_bpe_replacement_quote(a + b))
        )
    return st.select(
        "doc_id", F.size(F.split(enc, _BPE_DELIM)).alias("n_bpe_tokens")
    )


def _time(df_fn, spark) -> float:
    df_fn().write.mode("overwrite").format("noop").save()  # untimed warmup
    spark.catalog.clearCache()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        df_fn().write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    return round(min(runs), 3)


def _synthetic_tail(spark, docs, real: list, upto: int) -> list:
    """Extend the trained rule list to ``upto`` entries with a seeded
    cascade over the growing token universe — the model of a production
    vocabulary's LONG TAIL (rules that exist but rarely fire on a given
    doc).  Inert rules still exercise exactly what each path pays for
    them: one regexp corpus pass + one plan node for the chain, one
    dict probe per adjacent pair for the kernel."""
    import random

    from pyspark.sql import functions as F

    from hnarchive_spark.functions import text as T

    rng = random.Random(0x30AD)
    universe = sorted(
        r["tok"]
        for r in docs.select(
            F.explode(T.subtokens(F.col("text"))).alias("tok")
        )
        .distinct()
        .collect()
    ) + [a + b for a, b in real]
    pairs = list(real)
    while len(pairs) < upto:
        a, b = rng.choice(universe), rng.choice(universe)
        pairs.append((a, b))
        universe.append(a + b)
    return pairs


def _train_pure(ts: list[str], rounds: int) -> list[tuple[str, str]]:
    """Pure-Python BPE training on one stream (argmax pair, fold,
    re-count — induce_bpe_rules' loop without Spark), so the probe's
    rule list is maximally LIVE on the probe's own doc: nearly every
    pass applies, which is exactly the shape that made the rescan
    encoder quadratic."""
    from collections import Counter

    from hnarchive_spark.operators.bpe_encode import _fold_pass

    rules: list[tuple[str, str]] = []
    for _ in range(rounds):
        counts = Counter(zip(ts, ts[1:]))
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        rules.append((a, b))
        ts = _fold_pass(ts, a, b, a + b)
    return rules


def doclen_probe(lengths: list[int]) -> None:
    """The doc-length axis: encoder walls as ONE document grows."""
    import random

    from hnarchive_spark.operators.bpe_encode import (
        build_rank,
        encode_bpe_kernel,
        encode_tokens,
        encode_tokens_scan,
    )

    rng = random.Random(0xD0C1E)
    train_rounds = int(os.environ.get("BPE_DOCLEN_ROUNDS", "300"))
    out: dict = {"axis": "doc_length", "train_rounds": train_rounds}
    spark = get_spark("bpe-doclen-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for L in lengths:
        # merge-dense, pair-diverse stream: a tiny alphabet keeps pair
        # frequencies high (many passes fire), the random draw keeps
        # adjacent-pair diversity up (many DISTINCT rules fire)
        ts = [rng.choice("abcd") for _ in range(L)]
        rules = _train_pure(list(ts), train_rounds)
        rank = build_rank(rules)
        rec: dict = {"n_rules": len(rules)}
        for label, fn in (
            ("incremental", encode_tokens),
            ("scan", encode_tokens_scan),
        ):
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                enc = fn(list(ts), rules, rank)
                runs.append(time.perf_counter() - t0)
            rec[label + "_s"] = round(min(runs), 3)
            rec.setdefault("n_encoded", len(enc))
        # identity while we're here: the two encoders must agree exactly
        assert encode_tokens(list(ts), rules, rank) == encode_tokens_scan(
            list(ts), rules, rank
        )
        # Spark end-to-end: one L-token doc per core through the kernel
        n_cores = spark.sparkContext.defaultParallelism
        docs = spark.createDataFrame(
            [(i, " ".join(ts)) for i in range(n_cores)],
            "doc_id long, text string",
        )
        rec["kernel_spark_s"] = _time(
            lambda: encode_bpe_kernel(docs, rules).select(
                "doc_id", "n_bpe_tokens"
            ),
            spark,
        )
        rec["kernel_docs"] = n_cores
        out[f"len_{L}"] = rec
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "doclen":
        doclen_probe([int(x) for x in sys.argv[2:]] or [1000, 10_000, 100_000])
        return
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    prefixes = [int(x) for x in sys.argv[2:]] or [10, 25, 50]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bpe-apply-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    rules = induce_bpe_rules(spark, docs, rounds=rounds)
    train_s = round(time.perf_counter() - t0, 3)
    pairs = [(a, b) for _k, a, b, _n in rules]
    if max(prefixes) > len(pairs):  # synthetic long tail past the trained head
        pairs = _synthetic_tail(spark, docs, pairs, max(prefixes))
    out = {"sf_dir": sf_dir, "trained_rules": len(rules), "train_s": train_s}
    for k in prefixes:
        sub = pairs[:k]
        out[f"kernel_{k}"] = _time(
            lambda: encode_bpe_kernel(docs, sub).select("doc_id", "n_bpe_tokens"),
            spark,
        )
        try:
            out[f"chain_{k}"] = _time(lambda: _chain_apply(docs, sub), spark)
        except BaseException as ex:  # the chain's plan-size cliff, recorded
            out[f"chain_{k}"] = f"FAILED: {type(ex).__name__}"
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
