"""Hypertable-style continuous rollups: materialized time-bucket
aggregates + query-time merge with the raw tail (TimescaleDB
continuous-aggregate semantics, batch-incremental on Spark).

The contract: ``rollup_with_tail(materialized, raw, cutoff)`` must equal
aggregating the raw table directly — guaranteed here because the bucket
aggregates accumulate as DECIMAL (order-independent, mergeable) and the
cutoff aligns to bucket boundaries, so every bucket comes entirely from
ONE side. At 100 TB the materialized side is tiny (one row per bucket ×
key) and the raw scan is pruned to the tail partition(s).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_aggregate(
    df: DataFrame,
    ts_col: str,
    bucket: str,
    group_by: Sequence[str] = (),
    value_col: str = "value",
) -> DataFrame:
    """One row per (bucket_start, *group_by): count + decimal-exact sum +
    min/max — the mergeable rollup shape. ``bucket`` is a Spark window
    duration ('1 hour', '15 minutes', ...)."""
    agg = df.groupBy(F.window(ts_col, bucket), *group_by).agg(
        F.count(value_col).alias("n"),
        F.sum(F.col(value_col).cast("decimal(27,6)")).alias("value_sum_dec"),
        F.min(value_col).alias("value_min"),
        F.max(value_col).alias("value_max"),
    )
    return agg.select(
        F.col("window.start").alias("bucket_start"),
        *group_by,
        "n", "value_sum_dec", "value_min", "value_max",
    )


def materialize_rollup(
    df: DataFrame,
    ts_col: str,
    bucket: str,
    cutoff,
    rollup_path: str,
    group_by: Sequence[str] = (),
    value_col: str = "value",
) -> None:
    """Materialize CLOSED buckets (ts < cutoff) to parquet, partitioned by
    bucket date so incremental refreshes rewrite only new partitions.
    ``cutoff`` must lie on a bucket boundary (caller aligns it — e.g. the
    current watermark truncated to the bucket)."""
    closed = bucket_aggregate(
        df.filter(F.col(ts_col) < F.lit(cutoff)), ts_col, bucket,
        group_by, value_col,
    )
    (
        closed.withColumn("bucket_date", F.to_date("bucket_start"))
        .write.mode("overwrite")
        .partitionBy("bucket_date")
        .parquet(rollup_path)
    )


def rollup_with_tail(
    spark,
    rollup_path: str,
    raw: DataFrame,
    ts_col: str,
    bucket: str,
    cutoff,
    group_by: Sequence[str] = (),
    value_col: str = "value",
) -> DataFrame:
    """Continuous-aggregate read: materialized closed buckets UNION the
    raw tail (ts >= cutoff) aggregated on the fly. Output adds
    ``value_sum`` (double) and ``value_avg`` derived from the mergeable
    decimal state."""
    materialized = spark.read.parquet(rollup_path).drop("bucket_date")
    tail = bucket_aggregate(
        raw.filter(F.col(ts_col) >= F.lit(cutoff)), ts_col, bucket,
        group_by, value_col,
    )
    merged = materialized.unionByName(tail)
    return merged.select(
        "bucket_start",
        *group_by,
        "n",
        F.col("value_sum_dec").cast("double").alias("value_sum"),
        F.when(
            F.col("n") > 0, F.col("value_sum_dec").cast("double") / F.col("n")
        ).alias("value_avg"),
        "value_min", "value_max",
    )
