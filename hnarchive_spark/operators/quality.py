"""Model-based quality scoring over an arbitrary document frame — the
operator behind `q_quality_score` (plans/curation.py) and the streaming
quality gate (streaming/index_maint.py maintain_quality_gate), factored
here so batch and per-micro-batch inference share one code path.

The model is a (bucket, w_e4) integer weight table — in production the
output of offline training (fastText-style), here reproducible from
:func:`fixture_model`.  A doc's score is the mean of its tokens' bucket
weights: the integer dot product of the doc's bucket-count vector with
the weight vector divided by n_tokens.  Weights are kept NON-NEGATIVE
so the floor division is portable across engines (Spark `div` truncates
toward zero, DuckDB `//` floors — they agree only on nonnegative
operands); the sigmoid is deferred to a monotone threshold compare.

Scale shape: ONE tokenize-explode pass over the scored frame, a tiny
broadcast hash join, partial-agg per-doc collapse — model size never
touches the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hnarchive_spark.functions import text as T

QUALITY_W_BUCKETS = 256


def fixture_model(spark: SparkSession, n_buckets: int = QUALITY_W_BUCKETS) -> DataFrame:
    """The deterministic stand-in for trained weights: each bucket's
    weight derives from md5 of the bucket id, in [0, 20000] e4 — a user
    supplies real trained weights as the same (bucket, w_e4) table."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
            .cast("long")
            % 20001
        ).alias("w_e4"),
    )


def quality_scores(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = QUALITY_W_BUCKETS,
) -> DataFrame:
    """(doc_id, n_tokens, quality_e4) for every doc with at least one
    token (zero-token docs have no features and drop — the DSIR
    convention; the streaming gate counts them separately as
    ``quality_unscored``).

    The model joins in as a LEFT join with weight 0 for unmatched
    buckets (ADVICE r14): ``n_tokens`` is therefore the doc's TRUE token
    count even under a user-supplied SPARSE weight table, docs whose
    tokens all miss still score (as 0), and a sparse model reads as
    "absent buckets carry zero weight" rather than silently renaming
    matched-token counts to n_tokens.  With a full-coverage table (the
    fixture) left and inner are identical."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(T.tokens(F.col(text_col))).alias("tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .join(F.broadcast(model), "bucket", "left")
        .select("doc_id", F.coalesce(F.col("w_e4"), F.lit(0)).alias("w_e4"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.expr("sum(w_e4) div count(1)").alias("quality_e4"),
        )
    )
