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


# ---------------------------------------------------------------------------
# KLL-family deterministic quantile sketch (round 13)
# ---------------------------------------------------------------------------


def _vals(spark, n=3000, groups=3):
    # deterministic skewed-ish values with ties: v = (id*id) % 997
    return spark.range(n).select(
        (F.col("id") % groups).cast("int").alias("g"),
        ((F.col("id") * F.col("id")) % 997).cast("double").alias("v"),
    )


def test_kll_sketch_exact_when_small(spark):
    """A group with fewer rows than k keeps every distinct value with
    its exact count — the sketch IS the data, zero rank error."""
    from metadata_etl_framework_spark.ops.sketch import kll_sketch

    df = spark.range(20).select(
        F.lit(0).alias("g"), (F.col("id") % 7).cast("double").alias("v")
    )
    sk = kll_sketch(df, "v", k=64, group_cols=["g"]).orderBy("value")
    rows = sk.collect()
    exact = (
        df.groupBy("v").count().orderBy("v").collect()
    )
    assert [(r["value"], r["weight"]) for r in rows] == [
        (r["v"], r["count"]) for r in exact
    ]


def test_kll_sketch_weight_conservation_and_size(spark):
    """Σ weight = exact group row count, and ≤ k items per group."""
    from metadata_etl_framework_spark.ops.sketch import kll_sketch

    df = _vals(spark, n=5000, groups=3)
    sk = kll_sketch(df, "v", k=32, group_cols=["g"])
    agg = (
        sk.groupBy("g")
        .agg(F.sum("weight").alias("w"), F.count(F.lit(1)).alias("c"))
        .orderBy("g")
        .collect()
    )
    exact = df.groupBy("g").count().orderBy("g").collect()
    for got, ref in zip(agg, exact):
        assert got["w"] == ref["count"]
        assert got["c"] <= 32


def test_kll_merge_associative_commutative(spark):
    """The merge-associativity property pin: (A⊎B)⊎C, A⊎(B⊎C) and
    C⊎(B⊎A) produce IDENTICAL sketch tables (exact integer weights,
    no compaction inside merge)."""
    from metadata_etl_framework_spark.ops.sketch import (
        kll_merge,
        kll_sketch,
    )

    df = _vals(spark, n=4000, groups=3)
    parts = [
        kll_sketch(df.where(F.col("g") == i), "v", k=16, group_cols=["g"])
        .drop("g")
        for i in range(3)
    ]
    a, b, c = parts

    def table(sk):
        return sorted(
            (r["value"], r["weight"]) for r in sk.collect()
        )

    m1 = table(kll_merge([], kll_merge([], a, b), c))
    m2 = table(kll_merge([], a, kll_merge([], b, c)))
    m3 = table(kll_merge([], c, kll_merge([], b, a)))
    assert m1 == m2 == m3 and len(m1) > 0


def test_kll_quantiles_rank_error_bound(spark):
    """Estimated quantile's TRUE rank is within the documented bound:
    build error ≤ Σ_g ⌈n_g/k⌉/2 + selection ≤ 1 item block."""
    from metadata_etl_framework_spark.ops.sketch import (
        kll_merge,
        kll_quantiles,
        kll_sketch,
    )

    k = 64
    df = _vals(spark, n=6000, groups=3)
    sk = kll_sketch(df, "v", k=k, group_cols=["g"])
    merged = kll_merge([], sk)
    est = {
        r["p"]: r["estimate"]
        for r in kll_quantiles(merged, (0.25, 0.5, 0.9)).collect()
    }
    n = df.count()
    vals = [r["v"] for r in df.orderBy("v").collect()]
    # per-group block ≤ ceil(2000/64)=32; 3 groups → ±(3*16 + 32) ranks
    slack = 3 * 16 + 32
    for p, v in est.items():
        target = max(1, -(-int(p * n) // 1))
        import bisect

        lo = bisect.bisect_left(vals, v) + 1
        hi = bisect.bisect_right(vals, v)
        # the estimate's true rank interval must overlap target±slack
        assert lo - slack <= p * n <= hi + slack, (p, v, lo, hi)


def test_kll_compress_bounds_state_and_error(spark):
    """kll_compress shrinks a merged sketch to ≤ k items, conserves
    total weight exactly, and its median stays within the extra
    ⌈T/k⌉/2 rank error."""
    from metadata_etl_framework_spark.ops.sketch import (
        kll_compress,
        kll_merge,
        kll_quantiles,
        kll_sketch,
    )

    df = _vals(spark, n=6000, groups=3)
    merged = kll_merge([], kll_sketch(df, "v", k=64, group_cols=["g"]))
    small = kll_compress(merged, k=16)
    rows = small.collect()
    assert len(rows) <= 16
    assert sum(r["weight"] for r in rows) == 6000
    med_big = kll_quantiles(merged, (0.5,)).collect()[0]["estimate"]
    med_small = kll_quantiles(small, (0.5,)).collect()[0]["estimate"]
    vals = sorted(r["v"] for r in df.collect())
    import bisect

    r_big = bisect.bisect_left(vals, med_big)
    r_small = bisect.bisect_left(vals, med_small)
    assert abs(r_big - r_small) <= 6000 // 16 + 6000 // 64 + 2


def test_kll_sketch_requires_groups(spark):
    import pytest

    from metadata_etl_framework_spark.ops.sketch import kll_sketch

    df = _vals(spark, n=10)
    with pytest.raises(ValueError):
        kll_sketch(df, "v", k=8, group_cols=[])


def test_countmin_rollup_range_equals_direct_sketch(spark):
    """A range query over the materialized hourly rollup must equal a
    count-min sketch built directly on the raw slice (counter
    addition is lossless), and estimates never undercount truth."""
    import datetime as dt

    from pyspark.sql import functions as F

    from metadata_etl_framework_spark.ops.sketch import (
        countmin_query,
        countmin_rollup_query,
        countmin_sketch,
        windowed_countmin_rollup,
    )

    rows = []
    for i in range(2000):
        key = i % 17
        hour = i % 50
        rows.append((key, dt.datetime(2024, 1, 1) +
                     dt.timedelta(hours=hour)))
    df = spark.createDataFrame(rows, "k long, ts timestamp")
    roll = windowed_countmin_rollup(df, "ts", "k", "1 hour",
                                    depth=3, width=64)
    keys = spark.range(0, 17).select(F.col("id").alias("k"))
    lo = dt.datetime(2024, 1, 1, 10)
    hi = dt.datetime(2024, 1, 2, 5)
    got = {r["key"]: r["est_count"] for r in countmin_rollup_query(
        roll, keys, "k", depth=3, width=64, start=lo, end=hi
    ).collect()}
    raw = df.where((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
    direct = {r["key"]: r["est_count"] for r in countmin_query(
        countmin_sketch(raw, "k", depth=3, width=64),
        keys, "k", depth=3, width=64
    ).collect()}
    assert got == direct
    truth = {r["k"]: r["c"] for r in raw.groupBy("k")
             .agg(F.count(F.lit(1)).alias("c")).collect()}
    for k, est in got.items():
        assert est >= truth.get(k, 0)  # never undercounts
