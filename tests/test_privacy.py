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
