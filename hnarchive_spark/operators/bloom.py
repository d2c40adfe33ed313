"""DataFrame-native Bloom filter: build a bitmap as (word, bits) rows, probe
with broadcast hash joins — no shuffle on the probed side, no driver collect.

Spark's own BloomFilterAggregate/BloomFilterMightContain expressions are not
registered in the public function registry (and PySpark exposes no
``df.stat.bloomFilter``), so this is the idiomatic-from-public-API version of
the same idea:

* build: each key hashes to ``k`` bit positions (xxhash64 with per-hash
  seeds); positions aggregate into 64-bit words with ``bit_or`` — ONE
  partial-aggregated shuffle of at most ``2^log2_bits / 64`` rows;
* probe: the bitmap is broadcast and the probe side takes ``k`` broadcast
  hash joins + a bit test — zero probe-side shuffles, so the filter runs
  strictly BEFORE any downstream exchange;
* guarantees: no false negatives ever (a pruned row is definitely absent),
  false positives only pass extra rows to whatever exact operator follows.

At 100 TB: size ``log2_bits`` to the build side's distinct-key count
(m ~ 14.4 bits/key for 1% fpp at k=3); the bitmap stays a DataFrame end to
end, so a billion-key filter is still just a 2 GB broadcast of longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_LOG2_BITS = 20  # 1 Mi bits -> 16 Ki (word, bits) rows
BLOOM_K = 3


def _positions(col, log2_bits: int, k: int) -> list[F.Column]:
    mask = (1 << log2_bits) - 1
    return [F.xxhash64(F.lit(i), col).bitwiseAND(F.lit(mask)) for i in range(k)]


def bloom_build(
    df: DataFrame, col: str, log2_bits: int = BLOOM_LOG2_BITS, k: int = BLOOM_K
) -> DataFrame:
    """Bloom bitmap of ``df[col]`` as a DataFrame[(w: long, bits: long)]."""
    pos = df.select(
        F.explode(F.array(*_positions(F.col(col), log2_bits, k))).alias("pos")
    )
    return (
        pos.select(
            F.shiftright("pos", 6).alias("w"),
            F.expr("shiftleft(1L, cast(pos & 63 AS int))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_prune(
    df: DataFrame,
    col: str,
    bitmap: DataFrame,
    log2_bits: int = BLOOM_LOG2_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Rows of ``df`` whose ``col`` MIGHT be in the bloom set (same schema).

    ``k`` broadcast joins on the word index + bit tests; a key hashing into
    an all-zero (hence absent) bitmap word is dropped by the inner join
    itself.  No shuffle of ``df`` and no change to row content — callers
    follow with the exact join/aggregate for final semantics.
    """
    out = df
    for i, pos in enumerate(_positions(F.col(col), log2_bits, k)):
        bm = bitmap.select(F.col("w").alias(f"_w{i}"), F.col("bits").alias(f"_bits{i}"))
        out = (
            out.withColumn(f"_p{i}", pos)
            .join(F.broadcast(bm), F.shiftright(f"_p{i}", 6) == F.col(f"_w{i}"))
            .filter(
                F.expr(f"(_bits{i} & shiftleft(1L, cast(_p{i} & 63 AS int))) != 0")
            )
            .drop(f"_p{i}", f"_w{i}", f"_bits{i}")
        )
    return out
