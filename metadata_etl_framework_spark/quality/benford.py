"""Benford's-law conformance check for numeric columns.

Naturally occurring magnitudes (amounts, populations, transaction
values) follow the first-digit law P(d) = log10(1 + 1/d); fabricated or
truncated data usually doesn't — which makes the deviation a standard
fraud/data-quality screen on financial columns. Single aggregation pass
(digit extraction is pure double math replayable in SQL), chi-square
against the expected distribution.

Extends the reference's distribution checks
(`src/quality/dq_rule_examples.py:980-1032` stops at Shapiro normality)
with the magnitude-data shape test those checks can't express.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def benford_first_digit(ref: DataFrame, col: str) -> DataFrame:
    """Per-digit observed vs Benford-expected first-digit shares.

    Only strictly positive finite values participate (zero/negative/NULL
    have no Benford first digit; their count is excluded, not errored).
    The digit comes from ``floor(x / 10^floor(log10(x)))`` — pure libm
    double arithmetic, bit-identical across engines on one host.

    Output: 9 rows — (digit, n, observed, expected, chi2_term) — plus
    ``chi2_total`` on every row (tall-plus-total, oracle convention).
    """
    x = F.col(col).cast("double")
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("int")
    counts = (
        ref.where(x.isNotNull() & (x > 0))
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # complete the 1..9 grid so absent digits surface with share 0
    digits = ref.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    full = digits.join(counts, "digit", "left").select(
        "digit", F.coalesce("n", F.lit(0)).alias("n")
    )
    total = full.agg(F.sum("n").alias("_t"))
    expected = F.log10(1.0 + 1.0 / F.col("digit"))
    obs = F.col("n") / F.col("_t")
    terms = full.crossJoin(F.broadcast(total)).select(
        "digit",
        F.col("n").cast("long").alias("n"),
        F.round(obs, 6).alias("observed"),
        F.round(expected, 6).alias("expected"),
        F.round(
            F.when(
                F.col("_t") > 0,
                F.pow(obs - expected, 2) / expected * F.col("_t"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("chi2_term"),
    )
    tot = terms.agg(F.round(F.sum("chi2_term"), 6).alias("chi2_total"))
    return terms.crossJoin(F.broadcast(tot))


def benford_expected(digit: int) -> float:
    """Closed-form Benford probability for a first digit (test helper)."""
    return math.log10(1.0 + 1.0 / digit)
