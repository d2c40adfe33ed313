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
    (numerators nonnegative, so numpy floor-div == DuckDB //)."""
    words = text.str.split(" ")
    n_words = words.str.len().astype("int64")
    n_chars = text.str.len().astype("int64")
    net_chars = n_chars - (n_words - 1)  # chars net of separators
    return 1_000_000 - (50_000 * net_chars) // n_words - 1_000 * n_words


@pandas_udf(LongType())
def weighted_mean_e4(value_cents: pd.Series, weight: pd.Series) -> int:
    """Grouped-aggregate pandas UDF: weight-averaged value per group, exact
    int64 — (sum(cents*w) * 100) // sum(w) = the weighted mean in e4 dollar
    units (nonnegative, so floor-div == DuckDB //)."""
    num = int((value_cents.astype("int64") * weight.astype("int64")).sum())
    den = int(weight.sum())
    return (num * 100) // den
