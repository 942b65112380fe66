"""Ordered-funnel analysis over an event stream.

Classic product-analytics operator: given an ordered list of step event
types (e.g. view → click → purchase), count how many users completed
each prefix of the funnel *in order* — a user reaches step k only via
the earliest step-k event at-or-after their step-(k-1) arrival time.

Design for scale: ONE shuffle (the per-user window partitioning), then k
sequential window projections over the SAME partitioning — Catalyst
collapses them onto one Exchange, so funnel depth costs no extra data
movement. No joins, no per-user collect; state is a handful of
timestamp columns.

Beyond-reference operator (analytics family); no reference counterpart.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_arrivals(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    max_lag_seconds: "float | None" = None,
) -> DataFrame:
    """Per-user funnel arrival times: adds ``step_{i}_ts`` for each step —
    the earliest qualifying event time given in-order progression
    (step i counts only at-or-after the user's step i-1 arrival).
    Users never entering the funnel keep all-null step columns.

    ``max_lag_seconds`` adds the conversion-window constraint product
    analytics usually wants ("completed the NEXT step within 48h"):
    step i then counts only within ``max_lag_seconds`` of the step i-1
    arrival. Without it a funnel started in January "converts" on a
    December purchase.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(user_col)
    out = df
    prev: Column | None = None
    for i, step in enumerate(steps):
        cond = F.col(event_col) == step
        if prev is not None:
            cond = cond & prev.isNotNull() & (F.col(ts_col) >= prev)
            if max_lag_seconds is not None:
                deadline = F.timestamp_add(
                    "SECOND", F.lit(int(max_lag_seconds)), prev
                )
                cond = cond & (F.col(ts_col) <= deadline)
        arrival = F.min(F.when(cond, F.col(ts_col))).over(w)
        out = out.withColumn(f"step_{i}_ts", arrival)
        prev = F.col(f"step_{i}_ts")
    return out


def funnel_counts(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    max_lag_seconds: "float | None" = None,
) -> DataFrame:
    """Funnel summary: one row per step with the distinct users reaching
    it in order and the conversion rate from the previous step
    (null-guarded; step 0's rate is 1.0 by convention when reached).

    Output: (step_index, step_name, users_reached, conversion_from_prev).
    """
    arrivals = funnel_arrivals(
        df, steps, user_col, ts_col, event_col, max_lag_seconds
    )
    per_user = arrivals.groupBy(user_col).agg(
        *[
            F.min(f"step_{i}_ts").alias(f"step_{i}_ts")
            for i in range(len(steps))
        ]
    )
    counts = per_user.agg(
        *[
            F.count(f"step_{i}_ts").cast("long").alias(f"n_{i}")
            for i in range(len(steps))
        ]
    )
    # reshape 1-row agg to per-step rows inside one branch (stack pattern —
    # multi-reference of an agg frame in a union would replay the scan)
    stack_args = ", ".join(
        f"{i}, '{steps[i]}', n_{i}" for i in range(len(steps))
    )
    long_form = counts.select(
        F.expr(
            f"stack({len(steps)}, {stack_args}) AS (step_index, step_name, users_reached)"
        )
    )
    w = Window.orderBy("step_index")
    prev_n = F.lag("users_reached").over(w)
    return long_form.select(
        "step_index",
        "step_name",
        "users_reached",
        F.round(
            F.when(prev_n.isNull(), F.lit(1.0)).otherwise(
                F.when(
                    prev_n > 0,
                    F.col("users_reached").cast("double") / prev_n,
                ).otherwise(F.lit(0.0))
            ),
            6,
        ).alias("conversion_from_prev"),
    )


def conversion_latency(
    df: DataFrame,
    from_step: str,
    to_step: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    quantiles: Sequence[float] = (0.5, 0.9),
) -> DataFrame:
    """Time-to-convert distribution between two funnel steps: for every
    user, latency = first in-order ``to_step`` arrival minus first
    ``from_step`` arrival; summarized as count, exact decimal mean, and
    exact interpolated quantiles — "how long does view → purchase take,
    and is the tail growing?".

    The quantiles ride the scale-safe prefix-scan formulation
    (functions/aggregations.py::global_quantiles), never a single-task
    percentile buffer over every converting user. Output: 1 row —
    (n_converted long, mean_s, p{q}_s … — seconds, 6 dp).
    """
    from metadata_etl_framework_spark.functions.aggregations import (
        global_quantiles,
    )

    arrivals = funnel_arrivals(
        df, [from_step, to_step], user_col, ts_col, event_col
    )
    lat = (
        arrivals.groupBy(user_col)
        .agg(
            F.min("step_0_ts").alias("_t0"),
            F.min("step_1_ts").alias("_t1"),
        )
        .where(F.col("_t1").isNotNull())
        .select(
            (
                F.col("_t1").cast("double") - F.col("_t0").cast("double")
            ).alias("lat_s")
        )
    )
    stats = lat.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(
            F.sum(F.col("lat_s").cast("decimal(30,10)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_s"),
    )
    qrows = {
        r["p"]: r["value"]
        for r in global_quantiles(lat, "lat_s", quantiles).collect()
    }
    qcols = [
        F.lit(qrows.get(float(q))).cast("double").alias(
            f"p{int(q * 100):02d}_s"
        )
        for q in quantiles
    ]
    return stats.select("n_converted", "mean_s", *qcols)
