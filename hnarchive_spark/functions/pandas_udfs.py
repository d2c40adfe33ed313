"""Pandas UDF surface (SURVEY §2.9 'UDF/UDAF'): Arrow-vectorized scalar and
grouped-aggregate UDFs — the sanctioned path when an expression genuinely
needs Python (here numpy math), ~10-100x faster than row-at-a-time UDFs.

Both kernels are deterministic arithmetic so the DuckDB oracles can replay
them exactly; the point of the queries using them is to exercise the REAL
Arrow batch path end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf

# a DataType INSTANCE, not the "double" DDL string: the string form is
# parsed lazily and can end up parsed inside a Python worker where no
# SparkSession exists (module-level UDFs pickled to executors)
from pyspark.sql.types import DoubleType


def _round_half_away(x: np.ndarray, decimals: int) -> np.ndarray:
    """SQL-style rounding (half away from zero); np.round is half-even and
    diverges from DuckDB/Spark round() on exact .5 ties."""
    scale = 10.0**decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


@pandas_udf(DoubleType())
def readability_score(text: pd.Series) -> pd.Series:
    """Scalar pandas UDF: a Flesch-like score from mean word length and
    sentence-less text shape, computed vectorized over the Arrow batch."""
    words = text.str.split(" ")
    n_words = words.str.len().astype("float64")
    n_chars = text.str.len().astype("float64")
    mean_wl = (n_chars - (n_words - 1)) / n_words  # chars net of separators
    return pd.Series(_round_half_away((100.0 - 5.0 * mean_wl - 0.1 * n_words).to_numpy(), 4))


@pandas_udf(DoubleType())
def weighted_mean(value: pd.Series, weight: pd.Series) -> float:
    """Grouped-aggregate pandas UDF: weight-averaged value per group."""
    x = float((value * weight).sum()) / float(weight.sum())
    return float(_round_half_away(np.array([x]), 4)[0])
