"""Unit tests for ops/clustering.py — deterministic spherical k-means."""

from __future__ import annotations

import pytest

from metadata_etl_framework_spark.ops.clustering import (
    kmeans_assign,
    kmeans_summary,
)


def _three_blobs(spark):
    # three orthogonal directions, 5 points each, tiny perturbations;
    # ids arranged so the first-3-smallest-id seeding picks one point
    # from each blob (ids 0,1,2 are one per blob)
    dirs = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    rows = []
    vid = 0
    for i in range(5):
        for d in dirs:
            vec = [v + 0.01 * ((vid % 3) - 1) for v in d]
            rows.append((vid, vec))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_recovers_orthogonal_blobs(spark):
    df = _three_blobs(spark)
    out = kmeans_assign(df, k=3, iterations=3).collect()
    assert len(out) == 15
    # every point lands with its own blob's seed: blob of id i is i % 3
    for r in out:
        assert r["cluster"] == r["vec_id"] % 3, r
        assert r["cosine"] > 0.99


def test_kmeans_summary_shape_and_tightness(spark):
    out = kmeans_summary(_three_blobs(spark), k=3, iterations=2).collect()
    assert [r["cluster"] for r in out] == [0, 1, 2]
    assert all(r["n_points"] == 5 for r in out)
    assert all(r["avg_cosine"] > 0.99 for r in out)
    assert all(r["min_cosine"] <= r["avg_cosine"] for r in out)


def test_kmeans_deterministic(spark):
    df = _three_blobs(spark)
    a = kmeans_assign(df, k=3, iterations=2).collect()
    b = kmeans_assign(df, k=3, iterations=2).collect()
    assert a == b


def test_kmeans_explicit_seeds(spark):
    df = _three_blobs(spark)
    # seeding all three from the SAME blob still yields k clusters
    # (clusters 1 and 2 may empty out and keep their seed centroids)
    out = kmeans_assign(df, k=3, iterations=2, seed_ids=[0, 3, 6]).collect()
    assert len(out) == 15
    assert {r["cluster"] for r in out} <= {0, 1, 2}


def test_kmeans_iteration_gate(spark):
    df = _three_blobs(spark)
    with pytest.raises(ValueError, match="iterations"):
        kmeans_assign(df, k=3, iterations=100)
    with pytest.raises(ValueError, match="k must be"):
        kmeans_assign(df, k=0)


def test_gmm2_recovers_bimodal_mixture(spark):
    """Two well-separated spikes (70% at ~1.0, 30% at ~5.0): EM must
    land one component near each mode with the right weights."""
    from metadata_etl_framework_spark.ops.clustering import gmm2_train

    rows = []
    for i in range(1000):
        if i % 10 < 7:
            rows.append((1.0 + (i % 7) * 0.01,))
        else:
            rows.append((5.0 + (i % 5) * 0.01,))
    df = spark.createDataFrame(rows, "x double")
    out = {r["component"]: r for r in
           gmm2_train(df, "x", iterations=5).collect()}
    assert abs(out[1]["mu"] - 1.03) < 0.1
    assert abs(out[2]["mu"] - 5.02) < 0.1
    assert abs(out[1]["weight"] - 0.7) < 0.05
    assert abs(out[2]["weight"] - 0.3) < 0.05
    assert out[1]["sigma"] < 0.1 and out[2]["sigma"] < 0.1
    assert out[1]["n_rows"] == 1000


def test_gmm2_loglik_improves_with_iterations(spark):
    """The EM monitor: mean log-likelihood at iteration 4's entry
    must be >= iteration 1's entry (EM is monotone)."""
    from metadata_etl_framework_spark.ops.clustering import gmm2_train

    rows = [((i % 13) * 0.5 + (3.0 if i % 3 == 0 else 0.0),)
            for i in range(500)]
    df = spark.createDataFrame(rows, "x double")
    ll1 = gmm2_train(df, "x", iterations=1).first()["mean_loglik"]
    ll4 = gmm2_train(df, "x", iterations=4).first()["mean_loglik"]
    assert ll4 >= ll1


def test_gmm2_degenerate_and_gates(spark):
    from metadata_etl_framework_spark.ops.clustering import gmm2_train
    import pytest

    const = spark.createDataFrame([(2.0,)] * 10, "x double")
    out = {r["component"]: r for r in
           gmm2_train(const, "x", iterations=2).collect()}
    assert out[1]["mu"] == 2.0 and out[2]["mu"] == 2.0
    assert out[1]["sigma"] == 0.001  # sqrt(var_floor)
    one = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match=">= 2"):
        gmm2_train(one, "x")
    with pytest.raises(ValueError, match="iterations"):
        gmm2_train(const, "x", iterations=0)
