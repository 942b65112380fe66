"""Unit tests for quality/privacy.py — k-anonymity, l-diversity, DP."""

from __future__ import annotations

import math

import pytest

from metadata_etl_framework_spark.quality.privacy import (
    dp_noisy_counts,
    k_anonymity_classes,
    k_anonymity_summary,
    l_diversity_classes,
)


def _people(spark):
    # (zip, age_band, disease): one 3-person class, one singleton
    rows = [
        ("10001", "20s", "flu"),
        ("10001", "20s", "flu"),
        ("10001", "20s", "cold"),
        ("99999", "80s", "rare"),
    ]
    return spark.createDataFrame(rows, "zip string, age string, dx string")


def test_k_anonymity_classes_flags(spark):
    out = {
        (r["zip"], r["age"]): r
        for r in k_anonymity_classes(
            _people(spark), ["zip", "age"], k=2
        ).collect()
    }
    assert out[("10001", "20s")]["class_size"] == 3
    assert not out[("10001", "20s")]["below_k"]
    assert out[("99999", "80s")]["below_k"]


def test_k_anonymity_summary_readout(spark):
    r = k_anonymity_summary(_people(spark), ["zip", "age"], k=2).collect()[0]
    assert r["n_rows"] == 4 and r["n_classes"] == 2
    assert r["n_violating_classes"] == 1 and r["rows_at_risk"] == 1
    assert r["pct_rows_at_risk"] == 25.0 and r["min_class_size"] == 1


def test_k_anonymity_empty_qi_raises(spark):
    with pytest.raises(ValueError, match="qi_cols"):
        k_anonymity_classes(_people(spark), [], k=2)


def test_l_diversity_homogeneity_attack(spark):
    # class (10001, 20s) has 2 sensitive values; add a k-anonymous but
    # HOMOGENEOUS class to show l-diversity catches what k misses
    extra = _people(spark).sparkSession.createDataFrame(
        [("22222", "30s", "hiv")] * 5, "zip string, age string, dx string"
    )
    df = _people(spark).unionByName(extra)
    out = {
        (r["zip"], r["age"]): r
        for r in l_diversity_classes(
            df, ["zip", "age"], "dx", l=2
        ).collect()
    }
    big = out[("10001", "20s")]
    assert big["n_sensitive"] == 2 and not big["below_l"]
    # entropy of {2/3, 1/3}
    exp = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert big["entropy"] == round(exp, 6)
    homog = out[("22222", "30s")]
    assert homog["class_size"] == 5          # k-anonymous at k=5 ...
    assert homog["n_sensitive"] == 1 and homog["below_l"]  # ... but leaks
    assert homog["entropy"] == 0.0


def test_dp_counts_deterministic_and_bounded_noise(spark):
    df = _people(spark)
    a = dp_noisy_counts(df, ["zip"], epsilon=1.0, seed=3).collect()
    b = dp_noisy_counts(df, ["zip"], epsilon=1.0, seed=3).collect()
    assert a == b
    for r in a:
        assert r["noisy_count"] == round(r["exact_count"] + r["noise"], 6)
    # a different seed must redraw the noise
    c = dp_noisy_counts(df, ["zip"], epsilon=1.0, seed=4).collect()
    assert [r["noise"] for r in a] != [r["noise"] for r in c]


def test_dp_counts_epsilon_scales_noise(spark):
    df = _people(spark)
    tight = dp_noisy_counts(df, ["zip"], epsilon=10.0, seed=3).collect()
    loose = dp_noisy_counts(df, ["zip"], epsilon=0.1, seed=3).collect()
    # same uniforms, b = 1/eps -> noise scales exactly 100x
    for t, lo in zip(tight, loose):
        assert abs(lo["noise"]) == pytest.approx(
            abs(t["noise"]) * 100.0, rel=1e-3
        )


def test_dp_counts_epsilon_gate(spark):
    with pytest.raises(ValueError, match="epsilon"):
        dp_noisy_counts(_people(spark), ["zip"], epsilon=0.0)


def test_t_closeness_categorical_hand_math(spark):
    """Two classes over a 2-value sensitive attribute. Global: 4xA,
    4xB (q = 1/2 each). Class z1 = {A,A,A,B}: TV = |3/4-1/2| = 1/4.
    Class z2 = {A,B,B,B}: symmetric, 1/4."""
    from metadata_etl_framework_spark.quality.privacy import (
        t_closeness_classes,
    )

    rows = [("z1", s) for s in "AAAB"] + [("z2", s) for s in "ABBB"]
    df = spark.createDataFrame(rows, "zip string, s string")
    got = {r["zip"]: r for r in
           t_closeness_classes(df, ["zip"], "s", t=0.2).collect()}
    assert got["z1"]["class_size"] == 4
    assert got["z1"]["emd"] == 0.25
    assert got["z2"]["emd"] == 0.25
    assert got["z1"]["above_t"]


def test_t_closeness_categorical_absent_value(spark):
    """A class missing a global value entirely: global 4xA 4xB,
    class z1 = {A,A,A,A} -> TV = |1-1/2|/?  = (1/2 + 1/2)/2 = 1/2;
    exercises the no-grid absent-value fold."""
    from metadata_etl_framework_spark.quality.privacy import (
        t_closeness_classes,
    )

    rows = [("z1", s) for s in "AAAA"] + [("z2", s) for s in "BBBB"]
    df = spark.createDataFrame(rows, "zip string, s string")
    got = {r["zip"]: r["emd"] for r in
           t_closeness_classes(df, ["zip"], "s").collect()}
    assert got == {"z1": 0.5, "z2": 0.5}


def test_t_closeness_ordered_vs_categorical(spark):
    """Ordered EMD distinguishes NEAR misses from FAR ones: global
    values 1,2,3 uniform; a class holding {1,2} is closer than one
    holding {1,3}? No - holding {3,3}: cum diffs larger. Hand math:
    global q = (1/3,1/3,1/3); class {1,1}: p=(1,0,0);
    cums of p-q: 2/3, 1/3, 0 -> EMD = (2/3+1/3)/2 = 1/2.
    class {2,2}: cums -1/3, +1/3... |.|: 1/3+1/3 -> /2 = 1/3 —
    the middle value is nearer the global mass."""
    from metadata_etl_framework_spark.quality.privacy import (
        t_closeness_classes,
    )

    rows = (
        [("z1", 1), ("z1", 1)]
        + [("z2", 2), ("z2", 2)]
        + [("z3", 3), ("z3", 3)]
    )
    df = spark.createDataFrame(rows, "zip string, s int")
    got = {r["zip"]: r["emd"] for r in
           t_closeness_classes(df, ["zip"], "s", ordered=True)
           .collect()}
    assert got["z1"] == 0.5
    assert got["z2"] == round(1.0 / 3.0, 6)
    assert got["z3"] == 0.5


def test_t_closeness_ordered_gates(spark):
    from metadata_etl_framework_spark.quality.privacy import (
        t_closeness_classes,
    )

    df = spark.createDataFrame(
        [("z", i) for i in range(10)], "zip string, s int"
    )
    with pytest.raises(ValueError, match="max_values"):
        t_closeness_classes(df, ["zip"], "s", ordered=True,
                            max_values=5)
    one = spark.createDataFrame([("z", 1)], "zip string, s int")
    with pytest.raises(ValueError, match="distinct"):
        t_closeness_classes(one, ["zip"], "s", ordered=True)
    with pytest.raises(ValueError, match="qi_cols"):
        t_closeness_classes(df, [], "s")
