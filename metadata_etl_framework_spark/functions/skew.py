"""Skew mitigation: salted equi-join.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains the tool when a handful of hot keys
dominate a shuffle join and the skewed side must be spread BEFORE the
exchange (e.g. under static planning, or a skewed aggregation feeding a
join). Pattern: append a salt in [0, buckets) to the skewed side,
replicate the other side once per bucket via explode, join on
(keys + salt). Result is row-identical to the unsalted join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    buckets: int = 8,
) -> DataFrame:
    """Equi-join with the skewed side salted across ``buckets`` partitions.

    ``other`` is replicated ``buckets``× (explode of a literal range), so
    keep it the smaller side. Supported how: inner / left (semantics where
    replication cannot manufacture or drop matches).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    on = list(on)
    # spread rows of the same hot key uniformly; crc32 over the full row
    # keeps the salt deterministic for a given input (unlike rand())
    salt_src = F.crc32(F.concat_ws("\x01", *[F.col(c).cast("string") for c in skewed.columns]))
    left_s = skewed.withColumn(SALT_COL, (salt_src % buckets).cast("int"))
    right_s = other.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = left_s.join(right_s, on + [SALT_COL], how)
    return out.drop(SALT_COL)
