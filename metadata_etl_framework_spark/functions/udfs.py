"""User-function application operators.

Parity targets (reference):
- apply_custom_function    src/transform/transformation_library.py:722-753
  (column-wise fn → ``{col}_transformed``)
- apply_row_wise_function  src/transform/transformation_library.py:755-786
  (row → scalar over the whole row)

Both run as Arrow-vectorized pandas UDFs — the reference's
``Series.apply`` / ``apply(axis=1)`` equivalents, but batched: the
user fn receives pandas objects per Arrow batch instead of per row, so
a vectorized fn approaches built-in speed and even a scalar fn avoids
per-row IPC. Row-at-a-time Python UDFs are deliberately not offered.
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_custom_function(
    df: DataFrame,
    column: str,
    fn: Callable[[Any], Any],
    return_type: str = "double",
    output_col: str | None = None,
    vectorized: bool = False,
) -> DataFrame:
    """Column-wise user function → ``{col}_transformed``.

    ``vectorized=True`` passes the whole pandas Series to ``fn`` (fast
    path); otherwise ``fn`` is mapped element-wise (reference
    ``Series.apply`` semantics).
    """
    out = output_col or f"{column}_transformed"

    @F.pandas_udf(return_type)
    def _udf(s: pd.Series) -> pd.Series:
        return fn(s) if vectorized else s.map(fn)

    return df.withColumn(out, _udf(F.col(column)))


def apply_row_wise_function(
    df: DataFrame,
    fn: Callable[[dict[str, Any]], Any],
    return_type: str = "double",
    output_col: str = "row_result",
    columns: list[str] | None = None,
) -> DataFrame:
    """Row → scalar over the selected columns (reference ``apply(axis=1)``).

    The row reaches ``fn`` as a plain dict. Implemented as a pandas UDF
    over a struct of the needed columns — only those columns serialize
    to Python, so keep ``columns`` tight on wide tables.
    """
    cols = columns or df.columns

    @F.pandas_udf(return_type)
    def _udf(rows: pd.DataFrame) -> pd.Series:
        return rows.apply(lambda r: fn(r.to_dict()), axis=1)

    return df.withColumn(output_col, _udf(F.struct(*[F.col(c) for c in cols])))
