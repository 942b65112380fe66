"""as-of join tests: pandas merge_asof / DuckDB ASOF JOIN semantics via a
pure DataFrame composition (one shuffle, no UDF)."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_etl_framework_spark.functions import asof_join


def _ts(df, *cols):
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def test_asof_backward_semantics(spark):
    left = _ts(spark.createDataFrame(
        [(1, "u1", "2024-01-01 10:00:00"),
         (2, "u1", "2024-01-01 11:00:00"),
         (3, "u1", "2024-01-01 09:00:00"),   # before any right row
         (4, "u2", "2024-01-01 10:30:00")],
        "id int, user string, ts string"), "ts")
    right = _ts(spark.createDataFrame(
        [("u1", "2024-01-01 09:30:00", 10.0),
         ("u1", "2024-01-01 10:00:00", 20.0),   # equal ts → matches (<=)
         ("u1", "2024-01-01 10:45:00", 30.0),
         ("u2", "2024-01-01 10:00:00", 99.0)],
        "user string, ts string, rate double"), "ts")

    out = asof_join(left, right, "ts", by=["user"])
    got = {r.id: (r.rate_right, str(r.ts_right)) for r in out.collect()}
    assert got[1] == (20.0, "2024-01-01 10:00:00")   # equal-ts right row wins
    assert got[2] == (30.0, "2024-01-01 10:45:00")   # latest ≤ 11:00
    assert got[3] == (None, "None")                  # nothing before 09:00
    assert got[4] == (99.0, "2024-01-01 10:00:00")   # per-key isolation


def test_asof_tolerance_and_null_values(spark):
    left = _ts(spark.createDataFrame(
        [(1, "u1", "2024-01-01 12:00:00")], "id int, user string, ts string"), "ts")
    right = _ts(spark.createDataFrame(
        [("u1", "2024-01-01 09:00:00", 10.0),
         ("u1", "2024-01-01 11:30:00", None)],   # newest row has NULL value
        "user string, ts string, rate double"), "ts")

    # the newest right ROW wins atomically — its null value must NOT be
    # backfilled from the older row
    out = asof_join(left, right, "ts", by=["user"]).collect()[0]
    assert out.rate_right is None
    assert str(out.ts_right) == "2024-01-01 11:30:00"

    # tolerance: a match older than the window nulls out entirely
    out2 = asof_join(left, right.filter(F.col("rate").isNotNull()),
                     "ts", by=["user"], tolerance="30 minutes").collect()[0]
    assert out2.rate_right is None and out2.ts_right is None


def test_asof_plan_single_shuffle(spark):
    import io
    from contextlib import redirect_stdout

    left = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
    )
    right = spark.range(20).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 300).alias("ts"),
        (F.col("id") * 1.0).alias("v"),
    )
    out = asof_join(left, right, "ts", by=["k"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("simple")
    p = buf.getvalue()
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # union + one window ⇒ exactly one hash-partitioning exchange on k
    assert p.count("Exchange hashpartitioning") == 1, p


def test_range_join_matches_naive_and_no_cartesian(spark):
    import io
    from contextlib import redirect_stdout

    from metadata_etl_framework_spark.functions import range_join

    points = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "pid int, x double"
    )
    intervals = spark.createDataFrame(
        [(1, 3.0, 7.0), (2, 6.5, 10.0), (3, 40.0, 45.5), (4, 100.0, 110.0)],
        "iid int, lo double, hi double",
    )
    out = range_join(points, intervals, "x", "lo", "hi", bin_size=5.0)
    got = {(r.pid, r.iid) for r in out.collect()}
    naive = {
        (p, i)
        for p in range(50)
        for i, lo, hi in [(1, 3.0, 7.0), (2, 6.5, 10.0), (3, 40.0, 45.5),
                          (4, 100.0, 110.0)]
        if lo <= float(p) <= hi
    }
    assert got == naive
    # boundary inclusivity: x == lo and x == hi both match
    assert (3, 1) in got and (7, 1) in got

    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("simple")
    p = buf.getvalue()
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_range_join_ignores_malformed_intervals(spark):
    from metadata_etl_framework_spark.functions import range_join

    points = spark.createDataFrame([(1, 5.0)], "pid int, x double")
    intervals = spark.createDataFrame(
        [(1, 4.0, 6.0),      # valid, matches
         (2, 8.0, 2.0),      # inverted → must not match anything
         (3, None, 6.0)],    # null bound → dropped
        "iid int, lo double, hi double",
    )
    got = {(r.pid, r.iid) for r in
           range_join(points, intervals, "x", "lo", "hi", bin_size=5.0).collect()}
    assert got == {(1, 1)}


def test_range_join_auto_bin_size_bounds_skewed_fanout(spark):
    """bin_size=None derives the bin from the MEDIAN interval width, so one
    pathologically wide interval can't blow up the explode fan-out: with 99
    width-1 intervals and one width-10000 outlier, a width-quantile bin (~1)
    keeps typical intervals in <=2 bins; the outlier alone pays its width."""
    from pyspark.sql import functions as F

    from metadata_etl_framework_spark.functions import range_join

    intervals = spark.createDataFrame(
        [(i, float(i * 100), float(i * 100) + 1.0) for i in range(1, 100)]
        + [(0, 0.0, 10_000.0)],
        "iid int, lo double, hi double",
    )
    points = spark.createDataFrame(
        [(i, float(i * 100) + 0.5) for i in range(100)], "pid int, x double"
    )
    out = range_join(points, intervals, "x", "lo", "hi")  # bin_size=None
    got = {(r.pid, r.iid) for r in out.collect()}
    expected = {(i, i) for i in range(1, 100)} | {(i, 0) for i in range(101)
                if i * 100 + 0.5 <= 10_000.0 and i < 100}
    assert got == expected

    # fan-out bound: total exploded interval-bin rows ~= sum(width_i/bin)+n.
    # With bin≈median width (1.0): 99*2 + 10001 bins max; a naive bin sized
    # to the OUTLIER (e.g. width/100) would be fine too, but a tiny
    # caller-chosen bin like 0.01 would emit 1M rows for the outlier alone.
    b = 1.0  # the derived bin (median of 99 widths of 1.0 and one 10000.0)
    binned = intervals.withColumn(
        "_n", F.floor(F.col("hi") / b) - F.floor(F.col("lo") / b) + 1
    )
    total = binned.agg(F.sum("_n")).collect()[0][0]
    assert total <= 99 * 2 + 10_002


def test_range_count_matches_range_join_groupby(spark):
    """range_count (CDF-difference rewrite) must agree exactly with the
    materializing range_join + groupBy count, including boundary
    inclusivity, duplicate bound values, empty-bin bounds, and intervals
    with zero matches (kept, n_matches=0)."""
    from pyspark.sql import functions as F

    from metadata_etl_framework_spark.functions import range_count, range_join

    points = spark.createDataFrame(
        [(i, float(i % 97) + (i % 3) * 0.25) for i in range(500)],
        "pid int, x double",
    )
    intervals = spark.createDataFrame(
        [(1, 3.0, 7.0), (2, 6.5, 10.0), (3, 40.0, 45.5),
         (4, 3.0, 7.0),          # duplicate bounds of iid 1
         (5, 200.0, 210.0),      # beyond max point → zero matches
         (6, -50.0, -10.0),      # below min point → zero matches
         (7, 0.0, 96.75)],       # whole span
        "iid int, lo double, hi double",
    )
    naive = {
        r["iid"]: r["n"]
        for r in range_join(points, intervals, "x", "lo", "hi", bin_size=5.0)
        .groupBy("iid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {
        r["iid"]: r["n_matches"]
        for r in range_count(points, intervals, "x", "lo", "hi",
                             target_bins=64).collect()
    }
    # zero-match intervals present with 0; equal counts elsewhere
    assert got[5] == 0 and got[6] == 0
    assert {k: v for k, v in got.items() if v > 0} == naive
    # duplicate-bound intervals counted independently
    assert got[1] == got[4]


def test_range_count_drops_malformed_keeps_empty_points(spark):
    from metadata_etl_framework_spark.functions import range_count

    points = spark.createDataFrame([(1, 5.0)], "pid int, x double")
    intervals = spark.createDataFrame(
        [(1, 4.0, 6.0), (2, 8.0, 2.0), (3, None, 6.0)],
        "iid int, lo double, hi double",
    )
    got = {r["iid"]: r["n_matches"]
           for r in range_count(points, intervals, "x", "lo", "hi").collect()}
    assert got == {1: 1}  # inverted + null-bound intervals dropped

    empty = points.filter("x > 100")
    got2 = {r["iid"]: r["n_matches"]
            for r in range_count(empty, intervals, "x", "lo", "hi").collect()}
    assert got2 == {1: 0}  # no points → valid intervals kept at zero
