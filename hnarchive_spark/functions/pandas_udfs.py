"""Pandas UDF surface (SURVEY §2.9 'UDF/UDAF'): Arrow-vectorized scalar and
grouped-aggregate UDFs — the sanctioned path when an expression genuinely
needs Python (here numpy math), ~10-100x faster than row-at-a-time UDFs.

Both kernels are deterministic arithmetic so the DuckDB oracles can replay
them exactly; the point of the queries using them is to exercise the REAL
Arrow batch path end-to-end.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf

# a DataType INSTANCE, not the "double" DDL string: the string form is
# parsed lazily and can end up parsed inside a Python worker where no
# SparkSession exists (module-level UDFs pickled to executors)
from pyspark.sql.types import LongType


@pandas_udf(LongType())
def readability_score_e4(text: pd.Series) -> pd.Series:
    """Scalar pandas UDF: a Flesch-like score from mean word length and
    sentence-less text shape, vectorized over the Arrow batch in exact
    int64 e4 units: 1e6 - (5e4*(chars - spaces)) // n_words - 1e3*n_words
    (numerators nonnegative, so numpy floor-div == DuckDB //).

    NULL text -> NULL score (nullable Int64 result; a real corpus has
    missing fields and a NaN->int64 cast would kill the whole Arrow batch).
    """
    null_mask = text.isna()
    filled = text.fillna("")
    words = filled.str.split(" ")
    n_words = words.str.len().astype("int64")
    n_chars = filled.str.len().astype("int64")
    net_chars = n_chars - (n_words - 1)  # chars net of separators
    score = 1_000_000 - (50_000 * net_chars) // n_words - 1_000 * n_words
    return score.astype("Int64").mask(null_mask)


@pandas_udf(LongType())
def weighted_mean_e4(value_cents: pd.Series, weight: pd.Series) -> int | None:
    """Grouped-aggregate pandas UDF: weight-averaged value per group, exact
    int64 — (sum(cents*w) * 100) // sum(w) = the weighted mean in e4 dollar
    units (nonnegative, so floor-div == DuckDB //).

    SQL-aggregate null semantics: rows with a NULL value or weight are
    ignored; a group with no usable rows (or zero weight sum) yields NULL
    instead of raising from inside the executor batch.
    """
    ok = value_cents.notna() & weight.notna()
    v = value_cents[ok]
    w = weight[ok]
    den = int(w.sum()) if len(w) else 0
    if den == 0:
        return None
    num = int((v.astype("int64") * w.astype("int64")).sum())
    return (num * 100) // den
