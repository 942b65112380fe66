"""Mergeability + accuracy properties of the sketch family
(ops/sketch.py): building a sketch over a whole dataset must equal
merging sketches built over any partition of it — the property that
makes per-day sketch tables roll up to arbitrary ranges."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from metadata_etl_framework_spark.ops.sketch import (
    countmin_merge,
    countmin_query,
    countmin_sketch,
    hll_estimate,
    hll_merge,
    hll_registers,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)


def _norm(df):
    p = df.toPandas()
    p = p.reindex(sorted(p.columns), axis=1)
    return p.sort_values(list(p.columns)).reset_index(drop=True)


def _keys(spark, n=5000, stride=7):
    return spark.range(n).select((F.col("id") * stride + 3).alias("k"))


def test_hll_merge_equals_whole(spark):
    df = _keys(spark)
    whole = hll_registers(df, "k", m=64)
    h1 = hll_registers(df.where(F.col("k") % 2 == 0), "k", m=64)
    h2 = hll_registers(df.where(F.col("k") % 2 == 1), "k", m=64)
    merged = hll_merge(h1, h2)
    pd.testing.assert_frame_equal(_norm(whole), _norm(merged))


def test_hll_merge_idempotent(spark):
    df = _keys(spark, n=1000)
    s = hll_registers(df, "k", m=64)
    pd.testing.assert_frame_equal(_norm(s), _norm(hll_merge(s, s)))


def test_hll_estimate_accuracy(spark):
    # 5000 distinct keys, m=64 -> relative error ~ 1.04/sqrt(64) = 13%;
    # allow 3 sigma. Deterministic hash -> deterministic estimate.
    df = _keys(spark, n=5000)
    est = hll_estimate(hll_registers(df, "k", m=64), m=64).collect()[0]
    assert est["regime"] == "raw"
    assert abs(est["estimate"] - 5000) / 5000 < 0.4
    # and the estimate is a pinned deterministic value (merge-order
    # independent dyadic sums): re-run must reproduce it exactly
    est2 = hll_estimate(hll_registers(df, "k", m=64), m=64).collect()[0]
    assert est["estimate"] == est2["estimate"]


def test_hll_small_range_regime(spark):
    df = _keys(spark, n=20)
    est = hll_estimate(hll_registers(df, "k", m=64), m=64).collect()[0]
    assert est["regime"] == "linear"
    assert abs(est["estimate"] - 20) <= 8


def test_kmv_merge_equals_whole(spark):
    df = _keys(spark, n=3000)
    whole = kmv_sketch(df, "k", k=64)
    s1 = kmv_sketch(df.where(F.col("k") % 3 == 0), "k", k=64)
    s2 = kmv_sketch(df.where(F.col("k") % 3 != 0), "k", k=64)
    merged = kmv_merge(64, s1, s2)
    pd.testing.assert_frame_equal(_norm(whole), _norm(merged))


def test_kmv_exact_below_saturation(spark):
    df = _keys(spark, n=40)
    est = kmv_estimate(kmv_sketch(df, "k", k=64), k=64).collect()[0]
    assert est["regime"] == "exact"
    assert est["estimate"] == 40.0
    assert est["kth_hash"] is None


def test_kmv_estimate_accuracy(spark):
    df = _keys(spark, n=5000)
    est = kmv_estimate(kmv_sketch(df, "k", k=256), k=256).collect()[0]
    assert est["regime"] == "estimate"
    assert abs(est["estimate"] - 5000) / 5000 < 0.25


def test_countmin_merge_and_upper_bound(spark):
    # skewed frequencies: key i appears (i % 10 + 1) times
    df = spark.range(2000).select(
        (F.col("id") % 50).alias("k"),
        F.explode(
            F.array_repeat(F.lit(1), (F.col("id") % 3 + 1).cast("int"))
        ).alias("_"),
    ).select("k")
    whole = countmin_sketch(df, "k", depth=3, width=64)
    c1 = countmin_sketch(df.where(F.col("k") < 25), "k", depth=3, width=64)
    c2 = countmin_sketch(df.where(F.col("k") >= 25), "k", depth=3, width=64)
    merged = countmin_merge(c1, c2)
    pd.testing.assert_frame_equal(_norm(whole), _norm(merged))

    true = df.groupBy("k").count()
    est = countmin_query(
        whole, true.select(F.col("k")), "k", depth=3, width=64
    )
    j = (
        true.join(est, true["k"] == est["key"])
        .select("count", "est_count")
        .collect()
    )
    assert len(j) == 50
    assert all(r["est_count"] >= r["count"] for r in j)


def test_countmin_query_missing_key_zero_or_collision(spark):
    df = spark.range(100).select((F.col("id") + 1000).alias("k"))
    cm = countmin_sketch(df, "k", depth=3, width=256)
    probe = df.sparkSession.range(1).select(F.lit(1).alias("k"))
    est = countmin_query(cm, probe, "k", depth=3, width=256).collect()[0]
    assert est["est_count"] >= 0


def test_windowed_rollup_merges_to_global(spark):
    from datetime import datetime

    from metadata_etl_framework_spark.ops.sketch import (
        hll_rollup_estimate,
        windowed_hll_rollup,
    )

    df = spark.range(3000).select(
        (F.col("id") % 700).alias("uid"),
        F.to_timestamp(
            F.concat(
                F.lit("2024-01-01 "),
                F.lpad((F.col("id") % 24).cast("string"), 2, "0"),
            ),
            "yyyy-MM-dd HH",
        ).alias("ts"),
    )
    # the rollup covers hours 00..23 of one day
    rollup = windowed_hll_rollup(df, "ts", "uid", "1 hour", m=64)
    merged = (
        rollup.groupBy("register").agg(F.max("max_rank").alias("max_rank"))
    )
    direct = hll_registers(df, "uid", m=64)
    pd.testing.assert_frame_equal(_norm(direct), _norm(merged))

    # range estimate over a half-day prefix equals registers built
    # directly on the time-filtered rows
    cut = datetime(2024, 1, 1, 12)
    est_range = hll_rollup_estimate(rollup, m=64, end=cut).collect()[0]
    direct_cut = hll_estimate(
        hll_registers(df.where(F.col("ts") < F.lit(cut)), "uid", m=64),
        m=64,
    ).collect()[0]
    assert est_range["estimate"] == direct_cut["estimate"]
    assert est_range["observed"] == direct_cut["observed"]


def test_histogram_sketch_merge_and_bracket(spark):
    from metadata_etl_framework_spark.ops.sketch import (
        histogram_sketch,
        histogram_sketch_merge,
        quantile_from_histogram,
    )

    df = spark.range(10000).select((F.col("id") % 1000).cast(
        "double").alias("x"))
    whole = histogram_sketch(df, "x", 0.0, 1000.0, 50)
    s1 = histogram_sketch(df.where(F.col("x") < 400), "x", 0.0, 1000.0, 50)
    s2 = histogram_sketch(df.where(F.col("x") >= 400), "x", 0.0, 1000.0, 50)
    merged = histogram_sketch_merge(s1, s2)
    pd.testing.assert_frame_equal(_norm(whole), _norm(merged))

    # uniform 0..999: true median 500 (QUANTILE_DISC); the bracket
    # must contain it and the bound is half a bin (10)
    q = {r["q"]: r for r in
         quantile_from_histogram(whole, (0.5, 0.99)).collect()}
    med = q[0.5]
    assert med["err_bound"] == 10.0
    assert med["bin_lo"] <= 500 <= med["bin_hi"]
    p99 = q[0.99]
    assert p99["bin_lo"] <= 990 <= p99["bin_hi"]

    # NULL values land in bin -1 and are excluded from quantile n
    withnull = df.unionByName(
        spark.range(100).select(F.lit(None).cast("double").alias("x"))
    )
    h = histogram_sketch(withnull, "x", 0.0, 1000.0, 50)
    nulls = {r["bin"]: r["cnt"] for r in h.collect()}.get(-1)
    assert nulls == 100
    qn = quantile_from_histogram(h, (0.5,)).collect()[0]
    assert qn["n"] == 10000
