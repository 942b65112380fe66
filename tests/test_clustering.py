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
