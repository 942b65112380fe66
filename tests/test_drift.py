"""Edge-case pins for the drift statistics (quality/drift.py).

The differential suite proves lineitem-shaped parity vs DuckDB; these
pin the degenerate shapes the testdata never produces: identical
snapshots, disjoint supports, a constant reference column, NULLs, and
the KS prefix scan's exactness against a closed-form value.
"""

from __future__ import annotations

import math

import pytest

from metadata_etl_framework_spark.quality.drift import (
    chi_square_categorical,
    drift_suite,
    ks_statistic,
    psi_numeric,
)


def _df(spark, values, col="x"):
    return spark.createDataFrame([(float(v),) for v in values], f"{col} double")


def test_psi_identical_snapshots_is_zero(spark):
    a = _df(spark, range(100))
    out = psi_numeric(a, _df(spark, range(100)), "x", n_bins=5).collect()
    assert all(r.psi_total == 0.0 for r in out)
    assert all(r.psi_term == 0.0 for r in out)
    # 5 in-range bins, no under/overflow rows
    assert sorted(r.bin for r in out) == [0, 1, 2, 3, 4]


def test_psi_disjoint_ranges_all_overflow(spark):
    ref = _df(spark, [0, 1, 2, 3])
    cur = _df(spark, [100, 200])
    rows = {r.bin: r for r in psi_numeric(ref, cur, "x", n_bins=4).collect()}
    # every current row lands in the explicit overflow bin (n_bins)
    assert rows[4].cur_frac == 1.0 and rows[4].ref_frac == 0.0
    # overflow term: (1 - 0) * ln(1 / eps) = ln(1e6)
    assert abs(rows[4].psi_term - round(math.log(1.0 / 1e-6), 6)) < 1e-9


def test_psi_constant_reference_column(spark):
    ref = _df(spark, [5, 5, 5])
    cur = _df(spark, [5, 5])
    rows = psi_numeric(ref, cur, "x", n_bins=10).collect()
    assert [r.bin for r in rows] == [0]
    assert rows[0].psi_total == 0.0


def test_ks_identical_is_zero_and_disjoint_is_one(spark):
    a = _df(spark, range(50))
    assert ks_statistic(a, _df(spark, range(50)), "x").collect()[0].ks_stat == 0.0
    d = ks_statistic(_df(spark, range(10)), _df(spark, range(100, 110)), "x")
    row = d.collect()[0]
    assert row.ks_stat == 1.0 and row.n_ref == 10 and row.n_cur == 10


def test_ks_closed_form(spark):
    # ref = {1,2,3,4}, cur = {3,4,5,6}: D = |F_ref - F_cur| peaks at x=2
    # (ref CDF 0.5, cur CDF 0) and x=4 (1.0 vs 0.5) -> 0.5
    ref = _df(spark, [1, 2, 3, 4])
    cur = _df(spark, [3, 4, 5, 6])
    assert ks_statistic(ref, cur, "x").collect()[0].ks_stat == 0.5


def test_ks_ignores_nulls(spark):
    ref = spark.createDataFrame([(1.0,), (None,), (2.0,)], "x double")
    cur = spark.createDataFrame([(1.0,), (2.0,), (None,)], "x double")
    row = ks_statistic(ref, cur, "x").collect()[0]
    assert row.ks_stat == 0.0 and row.n_ref == 2 and row.n_cur == 2


def test_chi2_identical_is_zero_null_is_a_level(spark):
    mk = lambda rows: spark.createDataFrame(rows, "c string")
    a = mk([("a",), ("b",), (None,)])
    out = chi_square_categorical(a, mk([("a",), ("b",), (None,)]), "c").collect()[0]
    assert out.chi2 == 0.0
    assert out.n_categories == 3  # NULL counts as its own category
    assert out.dof == 2


def test_chi2_total_shift(spark):
    mk = lambda rows: spark.createDataFrame([(r,) for r in rows], "c string")
    # complete separation, equal sizes: chi2 = N (both terms saturate)
    out = chi_square_categorical(mk(["a"] * 10), mk(["b"] * 10), "c").collect()[0]
    assert out.chi2 == 20.0 and out.n_categories == 2


def test_drift_suite_shape(spark):
    ref = spark.createDataFrame(
        [(float(i), "a" if i % 2 else "b") for i in range(20)], "x double, c string"
    )
    cur = spark.createDataFrame(
        [(float(i + 5), "a") for i in range(20)], "x double, c string"
    )
    rows = drift_suite(ref, cur, ["x"], ["c"]).collect()
    got = {(r.column, r.metric) for r in rows}
    assert got == {("x", "psi"), ("x", "ks"), ("c", "chi2")}
    vals = {(r.column, r.metric): r.value for r in rows}
    assert vals[("x", "ks")] > 0.0 and vals[("c", "chi2")] > 0.0


def test_psi_by_period_detects_shift(spark):
    from datetime import datetime

    from metadata_etl_framework_spark.quality.drift import psi_by_period

    rows = []
    # three days: day1/day2 uniform over [0,100), day3 shifted to [200,300)
    for day, lo in ((1, 0), (2, 0), (3, 200)):
        rows += [
            (datetime(2024, 3, day, 10, 0, 0), float(lo + i)) for i in range(100)
        ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r.period.day: r for r in psi_by_period(df, "ts", "value", "day").collect()}
    assert set(out) == {2, 3}  # first observed period has no predecessor
    assert out[2].psi_vs_prev == 0.0        # identical distributions
    assert out[3].psi_vs_prev > 5.0         # total shift on the global grid
    assert out[3].n_rows == 100


def test_psi_by_period_skips_empty_periods(spark):
    from datetime import datetime

    from metadata_etl_framework_spark.quality.drift import psi_by_period

    rows = [(datetime(2024, 3, 1), 1.0), (datetime(2024, 3, 9), 1.0)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = psi_by_period(df, "ts", "value", "day").collect()
    # gap days don't exist; the two observed days compare directly
    assert len(out) == 1 and out[0].psi_vs_prev == 0.0


def test_schema_drift_all_change_kinds(spark):
    from metadata_etl_framework_spark.quality.drift import schema_drift

    ref = spark.createDataFrame([(1, "a", 1.0)], "id int, name string, bal double")
    cur = spark.createDataFrame([(1, 2, "x")], "id int, bal bigint, extra string")
    got = {(r.column, r.change): (r.ref_type, r.cur_type)
           for r in schema_drift(ref, cur).collect()}
    assert got[("extra", "added")] == (None, "string")
    assert got[("name", "removed")] == ("string", None)
    assert got[("bal", "type_changed")] == ("double", "bigint")
    assert ("id", "type_changed") not in got


def test_schema_drift_identical_is_empty(spark):
    from metadata_etl_framework_spark.quality.drift import schema_drift

    df = spark.createDataFrame([(1,)], "id int")
    assert schema_drift(df, df).count() == 0


def _py_ks(a, b):
    """Pure-Python two-sample KS (independent reference implementation)."""
    import bisect

    sa, sb = sorted(a), sorted(b)
    best = 0.0
    for x in set(a) | set(b):
        fa = bisect.bisect_right(sa, x) / len(sa)
        fb = bisect.bisect_right(sb, x) / len(sb)
        best = max(best, abs(fa - fb))
    return round(best, 6)


@pytest.mark.nightly
def test_ks_matches_python_reference_randomized(spark):
    import random

    from metadata_etl_framework_spark.quality.drift import ks_statistic

    rng = random.Random(42)
    for trial in range(5):
        a = [round(rng.gauss(0, 1), 3) for _ in range(rng.randint(5, 300))]
        b = [round(rng.gauss(rng.uniform(-1, 1), 1.5), 3)
             for _ in range(rng.randint(5, 300))]
        got = ks_statistic(_df(spark, a), _df(spark, b), "x").collect()[0]
        assert got.ks_stat == _py_ks(a, b), f"trial {trial}"
        assert 0.0 <= got.ks_stat <= 1.0


def test_psi_total_is_nonnegative_randomized(spark):
    import random

    from metadata_etl_framework_spark.quality.drift import psi_numeric

    rng = random.Random(7)
    for _ in range(3):
        a = [round(rng.uniform(0, 100), 2) for _ in range(200)]
        b = [round(rng.uniform(20, 140), 2) for _ in range(200)]
        rows = psi_numeric(_df(spark, a), _df(spark, b), "x").collect()
        # PSI is a sum of KL-style terms: nonnegative up to 6dp rounding
        assert rows[0].psi_total >= -1e-5 * len(rows)


def test_emd_closed_form_and_identity(spark):
    from metadata_etl_framework_spark.quality.drift import emd_1d

    # ref = {0,1}, cur = {1,2}: |F_ref-F_cur| is 0.5 on [0,1) and [1,2)
    ref = _df(spark, [0, 1])
    cur = _df(spark, [1, 2])
    row = emd_1d(ref, cur, "x").collect()[0]
    assert row.emd == 1.0 and row.n_ref == 2 and row.n_cur == 2

    same = _df(spark, range(100))
    assert emd_1d(same, _df(spark, range(100)), "x").collect()[0].emd == 0.0

    # pure translation by +10: W1 equals the shift
    assert emd_1d(_df(spark, range(50)),
                  _df(spark, [v + 10 for v in range(50)]), "x"
                  ).collect()[0].emd == 10.0


@pytest.mark.nightly
def test_emd_matches_python_reference_randomized(spark):
    import random

    from metadata_etl_framework_spark.quality.drift import emd_1d

    def py_emd(a, b):
        vals = sorted(set(a) | set(b))
        sa, sb = sorted(a), sorted(b)
        import bisect
        tot = 0.0
        for v, nv in zip(vals, vals[1:]):
            fa = bisect.bisect_right(sa, v) / len(sa)
            fb = bisect.bisect_right(sb, v) / len(sb)
            tot += abs(fa - fb) * (nv - v)
        return round(tot, 6)

    rng = random.Random(11)
    for trial in range(4):
        a = [round(rng.uniform(0, 50), 2) for _ in range(rng.randint(5, 200))]
        b = [round(rng.uniform(10, 80), 2) for _ in range(rng.randint(5, 200))]
        got = emd_1d(_df(spark, a), _df(spark, b), "x").collect()[0].emd
        assert abs(got - py_emd(a, b)) <= 2e-6, f"trial {trial}"


def test_psi_by_group_matches_per_group_psi(spark):
    from metadata_etl_framework_spark.quality.drift import (
        psi_by_group,
        psi_numeric,
    )

    def mk(rows):
        return spark.createDataFrame(rows, "x double, g string")

    ref = mk([(float(i % 40), "a") for i in range(200)]
             + [(float(i % 40), "b") for i in range(100)])
    cur = mk([(float(i % 40 + 20), "a") for i in range(150)]
             + [(float(i % 40), "b") for i in range(100)])
    grouped = {r.g: r for r in psi_by_group(ref, cur, "x", "g").collect()}
    assert grouped["b"].psi == 0.0  # unchanged group
    assert grouped["a"].psi > 0.1   # shifted group
    assert grouped["a"].n_ref == 200 and grouped["a"].n_cur == 150
    # per-group psi on the GLOBAL grid != standalone psi (its edges are
    # per-call), so compare against psi_numeric run on the same full
    # frames (same global edges) restricted to group b
    # -> only sanity: psi_by_group over a single-group frame equals
    #    psi_numeric's total on that frame
    only_b_ref = ref.where(ref.g == "b")
    only_b_cur = cur.where(cur.g == "b")
    solo = psi_numeric(only_b_ref, only_b_cur, "x").collect()[0].psi_total
    assert grouped["b"].psi == solo == 0.0


def test_psi_by_group_one_sided_group(spark):
    from metadata_etl_framework_spark.quality.drift import psi_by_group

    ref = spark.createDataFrame([(1.0, "a")], "x double, g string")
    cur = spark.createDataFrame([(1.0, "a"), (2.0, "new")],
                                "x double, g string")
    rows = {r.g: r for r in psi_by_group(ref, cur, "x", "g").collect()}
    assert set(rows) == {"a", "new"}
    assert rows["new"].n_ref == 0 and rows["new"].n_cur == 1
    assert rows["new"].psi > 10.0  # saturates at the smoothing bound


def test_psi_vs_baseline_matches_direct(spark, tmp_path):
    from metadata_etl_framework_spark.quality.drift import (
        psi_numeric,
        psi_vs_baseline,
        save_drift_baseline,
    )

    ref = _df(spark, [float(i % 40) for i in range(300)])
    cur = _df(spark, [float(i % 40 + 15) for i in range(200)])
    path = str(tmp_path / "baseline")
    save_drift_baseline(ref, "x", path)

    direct = {r.bin: r for r in psi_numeric(ref, cur, "x").collect()}
    via = {r.bin: r for r in psi_vs_baseline(cur, "x", path).collect()}
    # identical bins, fractions, terms, and total — without rescanning ref
    assert set(via) == set(direct)
    for b in direct:
        assert via[b].ref_frac == direct[b].ref_frac
        assert via[b].cur_frac == direct[b].cur_frac
        assert via[b].psi_term == direct[b].psi_term
        assert via[b].psi_total == direct[b].psi_total


def test_psi_vs_baseline_constant_reference(spark, tmp_path):
    from metadata_etl_framework_spark.quality.drift import (
        psi_vs_baseline,
        save_drift_baseline,
    )

    path = str(tmp_path / "b2")
    save_drift_baseline(_df(spark, [5.0] * 10), "x", path)
    rows = psi_vs_baseline(_df(spark, [5.0, 5.0]), "x", path).collect()
    assert all(r.psi_total == 0.0 for r in rows)


def test_psi_categorical_identity_and_shift(spark):
    from metadata_etl_framework_spark.quality.drift import psi_categorical

    mk = lambda rows: spark.createDataFrame([(r,) for r in rows], "c string")
    same = psi_categorical(mk(["a", "b", "a"]), mk(["a", "a", "b"]), "c")
    rows = {r.category: r for r in same.collect()}
    # proportions differ: 2/3 vs 2/3 for a... actually ref a=2/3, cur a=2/3
    assert all(r.psi_term == 0.0 for r in rows.values())

    shifted = psi_categorical(mk(["a"] * 10), mk(["b"] * 10), "c").collect()
    assert all(r.psi_total > 10.0 for r in shifted)  # total separation
    cats = {r.category for r in shifted}
    assert cats == {"a", "b"}

    with_null = psi_categorical(
        spark.createDataFrame([("a",), (None,)], "c string"),
        spark.createDataFrame([("a",), (None,)], "c string"), "c"
    ).collect()
    assert {r.category for r in with_null} == {"a", None}
    assert all(r.psi_term == 0.0 for r in with_null)


def test_benford_digit_extraction_and_conformance(spark):
    import math
    import random

    from metadata_etl_framework_spark.quality.benford import (
        benford_expected,
        benford_first_digit,
    )

    # sub-1, exact powers of 10, negatives/zero/NULL edge cases
    df = spark.createDataFrame(
        [(0.5,), (100.0,), (999.0,), (-3.0,), (0.0,), (None,)], "x double"
    )
    rows = {r.digit: r for r in benford_first_digit(df, "x").collect()}
    assert len(rows) == 9                      # completed 1..9 grid
    assert rows[5].n == 1 and rows[1].n == 1 and rows[9].n == 1
    assert sum(r.n for r in rows.values()) == 3  # neg/zero/NULL excluded
    assert rows[1].expected == round(math.log10(2), 6)

    # Benford-distributed sample conforms: chi2 stays small
    rng = random.Random(5)
    vals = [(10 ** rng.uniform(0, 4),) for _ in range(5000)]
    bdf = spark.createDataFrame(vals, "x double")
    out = benford_first_digit(bdf, "x").collect()
    assert out[0].chi2_total < 21.7  # chi2_{0.995, dof=8}

    # uniform-magnitude data violates the law loudly
    u = spark.createDataFrame([(float(v),) for v in range(1000, 9999)], "x double")
    assert benford_first_digit(u, "x").collect()[0].chi2_total > 100.0


def test_ks_binned_brackets_exact(spark):
    """Binned KS must bracket the exact statistic: D_binned <= D_exact
    <= D_binned + err_bound (round-6 verdict item 2)."""
    import random

    rng = random.Random(7)
    a = _df(spark, [rng.gauss(0, 1) for _ in range(400)])
    b = _df(spark, [rng.gauss(0.4, 1.3) for _ in range(300)])
    exact = ks_statistic(a, b, "x").collect()[0]
    for bins in (10, 50, 200):
        r = ks_statistic(a, b, "x", n_bins=bins).collect()[0]
        assert (r.n_ref, r.n_cur) == (exact.n_ref, exact.n_cur)
        assert r.ks_stat <= exact.ks_stat + 1e-9, (bins, r, exact)
        assert exact.ks_stat <= r.ks_stat + r.err_bound + 1e-9, (bins, r, exact)
    # enough bins that every distinct value gets its own bin -> exact
    fine = ks_statistic(a, b, "x", n_bins=100_000).collect()[0]
    assert abs(fine.ks_stat - exact.ks_stat) < 1e-4


def test_ks_binned_degenerate_shapes(spark):
    # identical snapshots -> 0; disjoint supports -> 1 (any binning)
    a = _df(spark, range(50))
    r = ks_statistic(a, _df(spark, range(50)), "x", n_bins=8).collect()[0]
    assert r.ks_stat == 0.0
    d = ks_statistic(
        _df(spark, range(50)), _df(spark, range(100, 150)), "x", n_bins=8
    ).collect()[0]
    assert d.ks_stat == 1.0
    # constant column on both sides: one bin, no division blowup
    c = ks_statistic(
        _df(spark, [5.0] * 10), _df(spark, [5.0] * 7), "x", n_bins=8
    ).collect()[0]
    assert c.ks_stat == 0.0 and (c.n_ref, c.n_cur) == (10, 7)


def test_drift_suite_binned_psi_identical_ks_bracketed(spark):
    """Forcing the high-cardinality arm (gate=0) must leave PSI
    bit-identical (PSI is bin-defined) and produce a KS within the
    reported err_bound of the exact arm, plus the ks_err_bound row."""
    import random

    rng = random.Random(11)
    ref = spark.createDataFrame(
        [(rng.gauss(0, 1), "a" if i % 3 else "b") for i in range(300)],
        "x double, c string",
    )
    cur = spark.createDataFrame(
        [(rng.gauss(0.3, 1.1), "a") for i in range(250)],
        "x double, c string",
    )
    exact = {
        (r.column, r.metric): r.value
        for r in drift_suite(ref, cur, ["x"], ["c"]).collect()
    }
    got = {
        (r.column, r.metric): r.value
        for r in drift_suite(
            ref, cur, ["x"], ["c"], ks_exact_max_distinct=0, ks_bins=64
        ).collect()
    }
    assert set(got) == set(exact) | {("x", "ks_err_bound")}
    assert got[("x", "psi")] == exact[("x", "psi")]
    assert got[("c", "chi2")] == exact[("c", "chi2")]
    eb = got[("x", "ks_err_bound")]
    assert got[("x", "ks")] <= exact[("x", "ks")] + 1e-9
    assert exact[("x", "ks")] <= got[("x", "ks")] + eb + 1e-9


def test_emd_binned_brackets_exact(spark):
    """Binned EMD must be within err_bound = 2*bin_width of the exact
    Wasserstein-1 (snapping argument), converging as bins grow."""
    import random

    from metadata_etl_framework_spark.quality.drift import emd_1d

    rng = random.Random(13)
    a = _df(spark, [rng.uniform(0, 10) for _ in range(300)])
    b = _df(spark, [rng.uniform(2, 12) for _ in range(250)])
    exact = emd_1d(a, b, "x").collect()[0]
    prev_err = None
    for bins in (10, 100, 1000):
        r = emd_1d(a, b, "x", n_bins=bins).collect()[0]
        assert (r.n_ref, r.n_cur) == (exact.n_ref, exact.n_cur)
        assert abs(r.emd - exact.emd) <= r.err_bound + 1e-9, (bins, r, exact)
        if prev_err is not None:
            assert r.err_bound < prev_err  # bound tightens with bins
        prev_err = r.err_bound
    # identical snapshots -> 0 under any binning; constant column -> 0
    z = emd_1d(a, a, "x", n_bins=16).collect()[0]
    assert z.emd == 0.0
    # constant column: single support point -> no gaps to integrate;
    # empty result on BOTH paths (long-standing exact-path semantics)
    assert emd_1d(
        _df(spark, [4.0] * 9), _df(spark, [4.0] * 5), "x", n_bins=16
    ).count() == 0
    assert emd_1d(_df(spark, [4.0] * 9), _df(spark, [4.0] * 5), "x").count() == 0


def test_global_quantiles_edges(spark):
    """global_quantiles: pandas-interpolation parity on closed forms,
    null handling, empty input, p=0/1 endpoints."""
    from metadata_etl_framework_spark.functions.aggregations import (
        global_quantiles,
    )

    df = _df(spark, [1, 2, 3, 4])  # h=(n-1)p over [1..4]
    got = {r.p: r.value for r in global_quantiles(
        df, "x", (0.0, 0.25, 0.5, 0.75, 1.0)).collect()}
    assert got == {0.0: 1.0, 0.25: 1.75, 0.5: 2.5, 0.75: 3.25, 1.0: 4.0}

    withnull = spark.createDataFrame(
        [(1.0,), (None,), (3.0,)], "x double"
    )
    got2 = {r.p: r.value for r in global_quantiles(withnull, "x", (0.5,)).collect()}
    assert got2 == {0.5: 2.0}  # nulls excluded, pandas semantics

    empty = spark.createDataFrame([], "x double")
    assert global_quantiles(empty, "x", (0.5,)).count() == 0


def test_detect_iqr_gate_paths_identical(spark):
    """detect_iqr must return the same rows whether the quantiles come
    from the single-task F.percentile aggregate or the distributed
    prefix-scan path (gate forced to 0)."""
    from metadata_etl_framework_spark.quality.anomaly import detect_iqr

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(
            [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 500, -500])],
        "k long, v double",
    )
    a = sorted((r.k, r.v) for r in detect_iqr(df, "v", "k").collect())
    b = sorted(
        (r.k, r.v)
        for r in detect_iqr(df, "v", "k", single_task_max_rows=0).collect()
    )
    assert a == b == [(10, 500.0), (11, -500.0)]


def test_detect_robust_zscore_resists_masking(spark):
    """The scenario mean/std z-score fails: one extreme value inflates
    std enough to mask a second outlier; median/MAD flags both. Also
    pins the MAD=0 degenerate exclusion and both gate paths."""
    from metadata_etl_framework_spark.quality.anomaly import (
        detect_robust_zscore,
        detect_zscore,
    )

    vals = [10.0] * 20 + [11.0] * 20 + [9.0] * 20 + [1000.0, 120.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v double"
    )
    classic = {r.k for r in detect_zscore(df, "v", "k", 3.0).collect()}
    robust = {r.k for r in detect_robust_zscore(df, "v", "k", 3.5).collect()}
    assert 61 not in classic          # 120 masked by the 1000's std
    assert {60, 61} <= robust         # both flagged by median/MAD
    gate0 = {
        r.k
        for r in detect_robust_zscore(
            df, "v", "k", 3.5, single_task_max_rows=0
        ).collect()
    }
    assert gate0 == robust
    const = spark.createDataFrame(
        [(i, 5.0) for i in range(10)] + [(99, 50.0)], "k long, v double"
    )
    # MAD = 0 (>=half identical): no finite score, no rows, no crash
    assert detect_robust_zscore(const, "v", "k").count() == 0


def test_ks_vs_baseline_matches_direct_binned(spark, tmp_path):
    """ks_vs_baseline on a saved profile must equal ks_statistic's
    binned arm computed directly with the SAME bin grid (reference
    edges), and keep the exact-KS bracket."""
    import random

    from metadata_etl_framework_spark.quality.drift import (
        ks_statistic,
        ks_vs_baseline,
        save_drift_baseline,
    )

    rng = random.Random(21)
    ref = _df(spark, [rng.uniform(0, 100) for _ in range(400)])
    cur = _df(spark, [rng.uniform(10, 130) for _ in range(300)])  # overflow mass
    path = str(tmp_path / "ksbase")
    save_drift_baseline(ref, "x", path, n_bins=32)
    got = ks_vs_baseline(cur, "x", path).collect()[0]
    assert (got.n_ref, got.n_cur) == (400, 300)
    exact = ks_statistic(ref, cur, "x").collect()[0]
    assert got.ks_stat <= exact.ks_stat + 1e-9
    assert exact.ks_stat <= got.ks_stat + got.err_bound + 1e-9
    # identical snapshots against their own baseline -> 0
    save_drift_baseline(ref, "x", str(tmp_path / "self"), n_bins=16)
    z = ks_vs_baseline(ref, "x", str(tmp_path / "self")).collect()[0]
    assert z.ks_stat == 0.0
    # empty baseline raises the documented error
    import pytest as _pt

    allnull = spark.createDataFrame([(None,)], "x double")
    save_drift_baseline(allnull, "x", str(tmp_path / "empty"))
    with _pt.raises(ValueError, match="no numeric support"):
        ks_vs_baseline(cur, "x", str(tmp_path / "empty"))


def test_ks_and_emd_empty_side_clear_error(spark):
    """An empty (or all-null) side must raise the documented ValueError,
    not a cryptic ANSI DIVIDE_BY_ZERO mid-job — both arms."""
    import pytest as _pt

    from metadata_etl_framework_spark.quality.drift import emd_1d

    empty = spark.createDataFrame([], "x double")
    allnull = spark.createDataFrame([(None,)], "x double")
    full = _df(spark, [1, 2, 3])
    for bad, good, side in (
        (empty, full, "reference"),
        (allnull, full, "reference"),
    ):
        with _pt.raises(ValueError, match=side):
            ks_statistic(bad, good, "x").collect()
        with _pt.raises(ValueError, match=side):
            ks_statistic(bad, good, "x", n_bins=8).collect()
        with _pt.raises(ValueError, match=side):
            emd_1d(bad, good, "x").collect()
    with _pt.raises(ValueError, match="current"):
        ks_statistic(full, empty, "x")


def test_entropy_and_gini_closed_forms(spark):
    from metadata_etl_framework_spark.functions.aggregations import (
        gini_coefficient,
        shannon_entropy,
    )

    # uniform 4 levels -> 2 bits; degenerate 1 level -> 0; nulls excluded
    u = spark.createDataFrame([(v,) for v in "abcd"], "s string")
    r = shannon_entropy(u, "s").collect()[0]
    assert (r.entropy, r.n_levels, r.n_rows) == (2.0, 4, 4)
    one = spark.createDataFrame([("x",), ("x",), (None,)], "s string")
    r1 = shannon_entropy(one, "s").collect()[0]
    assert (r1.entropy, r1.n_levels, r1.n_rows) == (0.0, 1, 2)

    # all-equal -> 0; one-holder among n=4 -> 0.75; negative raises
    eq = spark.createDataFrame([(2.5,)] * 6, "x double")
    assert gini_coefficient(eq, "x").collect()[0].gini == 0.0
    sk = spark.createDataFrame([(0.0,)] * 3 + [(100.0,)], "x double")
    assert gini_coefficient(sk, "x").collect()[0].gini == 0.75
    import pytest as _pt
    neg = spark.createDataFrame([(-1.0,), (2.0,)], "x double")
    with _pt.raises(ValueError, match="non-negative"):
        gini_coefficient(neg, "x")
