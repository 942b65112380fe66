"""Projection operators: rename / drop / reorder.

Parity targets (reference):
- rename_columns   src/transform/transformation_library.py:211-238
- drop_columns     src/transform/transformation_library.py:240-267
- reorder_columns  src/transform/transformation_library.py:269-296

All are pure projections — Catalyst collapses them with adjacent selects
and prunes unused columns out of the scan (ReadSchema narrowing).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Rename columns via ``{old: new}``; unknown keys are ignored (reference
    semantics: pandas ``rename`` silently skips missing columns)."""
    present = {old: new for old, new in mapping.items() if old in df.columns}
    return df.withColumnsRenamed(present)


def drop_columns(df: DataFrame, columns: Iterable[str]) -> DataFrame:
    """Drop the listed columns; missing names are ignored (pandas
    ``drop(errors='ignore')`` equivalence — Spark drop is already lenient)."""
    return df.drop(*columns)


def reorder_columns(df: DataFrame, order: list[str]) -> DataFrame:
    """Project to an explicit column order. Columns not listed are dropped
    (reference behavior: projection to the given list)."""
    missing = [c for c in order if c not in df.columns]
    if missing:
        raise ValueError(f"columns not present: {missing}")
    return df.select(*order)


def melt(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long unpivot (inverse of pivot_table; pandas.melt parity).

    Uses Spark's native ``unpivot`` — an executor-side row fan-out
    (one output row per (input row, value column)), no shuffle. Value
    columns must share a common type; cast upstream when they don't.
    """
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )
