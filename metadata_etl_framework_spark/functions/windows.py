"""Window-function operators.

Parity targets (reference):
- rank_within_group   src/transform/transformation_library.py:623-653
- window (step type)  src/transform/transform_engine.py:234-260
- lag_lead            src/transform/transformation_library.py:655-687
- running_total       src/transform/transformation_library.py:689-720
- rolling_aggregate   src/transform/transformation_library.py:578-620

Design deviation (documented, SURVEY §7.2): the reference's rolling /
cumulative ops rely on implicit single-node row order. Spark has no
implicit order, so every order-dependent operator here REQUIRES an
explicit ``order_by`` column. Ties in ``order_by`` are non-deterministic
across runs — callers should order by a unique key (or key tuple).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RANK_FNS = {
    "rank": F.rank,
    "dense_rank": F.dense_rank,
    "row_number": F.row_number,
    "percent_rank": F.percent_rank,
    "cume_dist": F.cume_dist,
}

_ROLLING_FNS = {"mean": F.avg, "avg": F.avg, "sum": F.sum, "std": F.stddev_samp}


def _window(partition_by: Sequence[str] | None, order_by: Sequence[str] | str):
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return w.orderBy(*order_by)


def rank_within_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str] | str,
    output_col: str = "rank",
    method: str = "dense_rank",
    ascending: bool = True,
    ntile_n: int = 4,
) -> DataFrame:
    """Rank rows within groups. ``method`` ∈ rank/dense_rank/row_number/
    percent_rank/cume_dist/ntile (bucket count via ``ntile_n``)/average.

    Reference default is dense rank (transformation_library.py:632).
    """
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    ordering = [F.col(c) if ascending else F.col(c).desc() for c in order_cols]
    w = Window.partitionBy(*partition_by).orderBy(*ordering)
    if method in ("average", "avg_rank"):
        # pandas rank(method='average') semantics (reference window-step arm,
        # transform_engine.py:244): a tie group of size n starting at SQL rank
        # r gets (r + (r+n-1)) / 2 = r + (n-1)/2. One extra unordered window
        # over (partition, order value) — same shuffle key, no second exchange.
        tie_w = Window.partitionBy(*partition_by, *order_cols)
        n_ties = F.count(F.lit(1)).over(tie_w)
        avg = (F.rank().over(w) + (n_ties - F.lit(1)) / F.lit(2.0)).cast("double")
        return df.withColumn(output_col, avg)
    if method == "ntile":
        return df.withColumn(output_col, F.ntile(ntile_n).over(w))
    fn = _RANK_FNS.get(method)
    if fn is None:
        raise ValueError(f"unsupported rank method {method!r}")
    return df.withColumn(output_col, fn().over(w))


def lag_lead(
    df: DataFrame,
    column: str,
    offset: int,
    partition_by: Sequence[str],
    order_by: Sequence[str] | str,
    output_col: str | None = None,
) -> DataFrame:
    """Shift within partition; positive offset = lag, negative = lead."""
    w = _window(partition_by, order_by)
    out = output_col or (
        f"{column}_lag_{offset}" if offset >= 0 else f"{column}_lead_{-offset}"
    )
    expr = F.lag(column, offset).over(w) if offset >= 0 else F.lead(column, -offset).over(w)
    return df.withColumn(out, expr)


def running_total(
    df: DataFrame,
    column: str,
    partition_by: Sequence[str],
    order_by: Sequence[str] | str,
    output_col: str | None = None,
) -> DataFrame:
    """Cumulative sum within partition (unbounded preceding → current row)."""
    w = _window(partition_by, order_by).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(output_col or f"{column}_running_total", F.sum(column).over(w))


def rolling_aggregate(
    df: DataFrame,
    column: str,
    window_size: int,
    fn: str = "mean",
    partition_by: Sequence[str] | None = None,
    order_by: Sequence[str] | str = (),
    output_col: str | None = None,
    min_periods: int = 1,
) -> DataFrame:
    """Fixed-size trailing row frame: fn over the last ``window_size`` rows.

    pandas ``rolling(N)`` yields null until N rows are seen unless
    min_periods=1; we default min_periods=1 (every prefix computes) and
    expose the parameter for strict parity.
    """
    agg = _ROLLING_FNS.get(fn.lower())
    if agg is None:
        raise ValueError(f"unsupported rolling fn {fn!r}")
    w = _window(partition_by, order_by).rowsBetween(-(window_size - 1), 0)
    out = output_col or f"{column}_rolling_{fn}"
    result = agg(column).over(w)
    if min_periods > 1:
        cnt = F.count(column).over(w)
        result = F.when(cnt >= min_periods, result)
    return df.withColumn(out, result)


def positional_value(
    df: DataFrame,
    column: str,
    partition_by: Sequence[str],
    order_by: Sequence[str] | str,
    method: str = "first",
    n: int = 1,
    output_col: str | None = None,
) -> DataFrame:
    """first/last/nth value within an ordered partition — the remaining
    positional window family (pandas ``groupby().first()/last()/nth()``
    in the reference's window-step vocabulary).

    ``first``/``nth`` use the default frame (unbounded preceding →
    current row suffices); ``last`` widens to the FULL partition frame —
    with the default frame last_value degenerates to the current row,
    the classic SQL-window footgun this wrapper exists to hide.
    """
    w = _window(partition_by, order_by)
    if method == "first":
        expr = F.first(column).over(w)
    elif method == "last":
        expr = F.last(column).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
    elif method == "nth":
        expr = F.nth_value(column, n).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
    else:
        raise ValueError(f"unknown positional method: {method!r}")
    return df.withColumn(output_col or f"{column}_{method}", expr)


def rolling_quantile(
    df,
    value_col: str,
    order_by,
    window_size: int,
    q: float = 0.5,
    partition_by=(),
    out: str | None = None,
):
    """Rolling EXACT quantile (default: moving median) over the trailing
    ``window_size`` rows — the robust moving-average: one wild spike
    moves a rolling mean for the whole window but barely moves the
    rolling median, so threshold alerts don't echo.

    ``F.percentile`` evaluated over a rows-between frame; state per
    window is ``window_size`` values (bounded by construction).
    ``partition_by`` keeps the window distributed — same contract as
    the other rolling operators: never a partitionless global window
    at scale. Output: input + ``{out}`` (6 dp).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if not (0.0 <= q <= 1.0):
        raise ValueError("q must be in [0, 1]")
    name = out or f"rolling_p{int(q * 100):02d}"
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order)
        .rowsBetween(-(window_size - 1), 0)
    )
    return df.withColumn(
        name, F.round(F.percentile(value_col, F.lit(q)).over(w), 6)
    )
