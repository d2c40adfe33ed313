"""Winnowing's defining guarantee: two documents sharing ANY contiguous
token run of length >= K + W - 1 must share at least one fingerprint
(Schleimer/Wilkerson/Aiken). Planted-overlap construction over many random
placements in one Spark pass; also the negative control (disjoint
vocabularies share nothing)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from hnarchive_spark.plans.registry import REGISTRY
from hnarchive_spark.plans.textops import WINNOW_K, WINNOW_W

RUN = WINNOW_K + WINNOW_W - 1  # 7 tokens


def _winnow_df(spark, docs):
    """Apply the q_winnow_fingerprint expression pipeline to (doc_id, text)."""
    from hnarchive_spark.functions import text as T
    from hnarchive_spark.plans.textops import WINNOW_B, WINNOW_P

    d = spark.createDataFrame(docs, "doc_id long, text string")
    tid = F.transform(
        T.tokens(F.col("text")),
        lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long"),
    )
    k, w, b, p = WINNOW_K, WINNOW_W, WINNOW_B, WINNOW_P
    rows = d.select("doc_id", tid.alias("tid")).filter(F.size("tid") >= k + w - 1)
    hs = F.transform(
        F.sequence(F.lit(1), F.size("tid") - (k - 1)),
        lambda i: (
            F.element_at(F.col("tid"), i) * (b ** 3)
            + F.element_at(F.col("tid"), i + 1) * (b ** 2)
            + F.element_at(F.col("tid"), i + 2) * b
            + F.element_at(F.col("tid"), i + 3)
        )
        % p,
    )
    fps = F.transform(
        F.sequence(F.lit(1), F.size(F.col("hs")) - (w - 1)),
        lambda j: F.array_min(F.slice(F.col("hs"), j, w)),
    )
    return (
        rows.select("doc_id", hs.alias("hs"))
        .select("doc_id", F.explode(F.array_distinct(fps)).alias("fp"))
        .distinct()
    )


def test_shared_run_implies_shared_fingerprint(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(200)]
    docs = []
    for case in range(25):
        shared = [rng.choice(vocab) for _ in range(RUN)]
        a = [rng.choice(vocab) for _ in range(rng.randint(10, 40))]
        b = [rng.choice(vocab) for _ in range(rng.randint(10, 40))]
        ia = rng.randint(0, len(a))
        ib = rng.randint(0, len(b))
        docs.append((case * 2, " ".join(a[:ia] + shared + a[ia:])))
        docs.append((case * 2 + 1, " ".join(b[:ib] + shared + b[ib:])))
    out = _winnow_df(spark, docs).collect()
    by_doc: dict[int, set] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    for case in range(25):
        common = by_doc[case * 2] & by_doc[case * 2 + 1]
        assert common, f"case {case}: planted {RUN}-token run yielded no shared fp"


def test_disjoint_vocab_shares_nothing(spark):
    rng = random.Random(11)
    a = [(0, " ".join(f"a{rng.randint(0, 50)}" for _ in range(40)))]
    b = [(1, " ".join(f"b{rng.randint(0, 50)}" for _ in range(40)))]
    out = _winnow_df(spark, a + b).collect()
    fps0 = {r["fp"] for r in out if r["doc_id"] == 0}
    fps1 = {r["fp"] for r in out if r["doc_id"] == 1}
    assert fps0 and fps1 and not (fps0 & fps1)


def test_registered_query_uses_same_pipeline(spark):
    """The helper above must stay in lockstep with the registered query —
    compare both on the real corpus."""
    sf = "/root/testdata/sf0.001"
    from hnarchive_spark.tables import load

    docs = [(r["doc_id"], r["text"]) for r in load(spark, sf, "documents").collect()]
    a = sorted(map(tuple, _winnow_df(spark, docs).collect()))
    b = sorted(map(tuple, REGISTRY["q_winnow_fingerprint"].spark(spark, sf).collect()))
    assert a == b
