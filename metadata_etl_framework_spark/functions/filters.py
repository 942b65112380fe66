"""Filter operators.

Parity targets (reference, behavior only — implementation is Spark-native):
- filter_by_condition            src/transform/transformation_library.py:78-148
- filter_by_multiple_conditions  src/transform/transformation_library.py:150-177
- filter_by_date_range           src/transform/transformation_library.py:179-208
- filter (step type, string cond) src/transform/transform_engine.py:121-136

All filters are single `Column` predicates so Catalyst pushes them into the
parquet/JDBC scan (check `.explain()` → PushedFilters). At 100 TB this is
the difference between scanning a partition and scanning the lake.
"""

from __future__ import annotations

import operator as _op
from functools import reduce
from typing import Any, Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPERATORS = {
    "==": _op.eq,
    "=": _op.eq,
    "!=": _op.ne,
    ">": _op.gt,
    "<": _op.lt,
    ">=": _op.ge,
    "<=": _op.le,
}


def _predicate(column: str, op: str, value: Any) -> Column:
    if op not in _OPERATORS:
        raise ValueError(f"unsupported operator {op!r}; expected one of {sorted(_OPERATORS)}")
    return _OPERATORS[op](F.col(column), F.lit(value))


def filter_by_condition(df: DataFrame, column: str, op: str, value: Any) -> DataFrame:
    """Keep rows where ``column <op> value``; op ∈ {==, !=, >, <, >=, <=}."""
    return df.filter(_predicate(column, op, value))


def filter_by_multiple_conditions(
    df: DataFrame, conditions: Iterable[dict[str, Any]]
) -> DataFrame:
    """AND-chain of simple conditions.

    Each condition is ``{"column": c, "operator": op, "value": v}``. The
    chain folds into ONE filter expression (single scan predicate), not a
    sequence of filter nodes.
    """
    preds = [_predicate(c["column"], c["operator"], c["value"]) for c in conditions]
    if not preds:
        return df
    return df.filter(reduce(lambda a, b: a & b, preds))


def filter_by_date_range(df: DataFrame, column: str, start: Any, end: Any) -> DataFrame:
    """Keep rows with ``start <= column <= end`` (inclusive both ends)."""
    return df.filter(F.col(column).between(F.lit(start), F.lit(end)))


def filter_expr(df: DataFrame, condition: str) -> DataFrame:
    """Filter by a SQL boolean expression string, e.g. ``"age > 30"``.

    The reference routed strings through pandas ``df.query`` / polars
    ``sql_expr``; Spark SQL accepts the same syntax natively via ``F.expr``.
    """
    return df.filter(F.expr(condition))
