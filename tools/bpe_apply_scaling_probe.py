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


def main() -> None:
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
