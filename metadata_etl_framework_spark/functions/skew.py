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


def diagnose_skew(
    df: DataFrame,
    key_cols: Sequence[str],
    top_n: int = 10,
) -> DataFrame:
    """Key-distribution report for shuffle planning: the ``top_n``
    heaviest keys with their row count, share of all rows, and skew
    factor (count / mean-rows-per-key). A skew factor ≫ 1 on a join or
    aggregation key says AQE skew-splitting or ``salted_join`` is worth
    it; ~1 means the key hashes evenly.

    Cost: the same one shuffle the diagnosed groupBy/join would do, then
    a 1-row stats broadcast over the (already small) per-key counts.
    Deterministic output: count desc, keys as tiebreak.
    """
    keys = list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.agg(
        F.sum("cnt").alias("__total"), F.count(F.lit(1)).alias("__groups")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            *keys,
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("__total"), 6).alias(
                "share"
            ),
            F.round(
                F.col("cnt").cast("double")
                / (F.col("__total").cast("double") / F.col("__groups")),
                6,
            ).alias("skew_factor"),
        )
        .orderBy(F.desc("cnt"), *[F.asc(k) for k in keys])
        .limit(top_n)
    )
