"""Vectorized UDAFs (GROUPED_AGG pandas_udf tier).

Deliberately NO `from __future__ import annotations` here: pandas_udf
infers the eval type (scalar vs grouped-agg) from REAL type hints
(pd.Series -> scalar), and stringified annotations defeat the
inference, forcing the deprecated PandasUDFType enum. Keeping the
UDAF definitions in this hint-preserving module is the supported
Spark 3/4 style (SPARK-28264).
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def mad_cents(cents: pd.Series) -> float:
    """Median absolute deviation over exact integer cents: every
    intermediate (interpolated medians at x.5, absolute differences)
    is an exact binary fraction, so the result is bit-equal to the
    oracle's quantile_cont-based median chain."""
    a = cents.to_numpy(dtype=np.float64)
    med = np.median(a)
    return float(np.median(np.abs(a - med)))


@pandas_udf("long")
def n_rows(cents: pd.Series) -> int:
    """Group size as a pandas aggregate: Spark refuses mixing
    GROUPED_AGG pandas UDFs with built-in aggregates in one agg
    (INVALID_PANDAS_UDF_PLACEMENT), so the count rides the same tier."""
    return len(cents)
