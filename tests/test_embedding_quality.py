"""Unit tests for lof_scores / centroid_silhouette (ops/similarity.py)."""

from __future__ import annotations

import pytest

from metadata_etl_framework_spark.ops.similarity import (
    centroid_silhouette,
    lof_scores,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def _cluster(base, n, eps):
    # n near-copies of `base`, tiny deterministic perturbations
    out = []
    for i in range(n):
        out.append([v + eps * ((i % 3) - 1) for v in base])
    return out


def test_lof_flags_planted_density_outlier(spark):
    # two tight clusters + one isolated point far from both
    rows = []
    vid = 0
    for base in ([1.0, 0.0, 0.0, 0.1], [0.0, 1.0, 0.0, 0.1]):
        for v in _cluster(base, 8, 0.01):
            rows.append((vid, v, 0))
            vid += 1
    rows.append((vid, [-1.0, -1.0, 1.0, -0.5], 9))
    out = {r["vec_id"]: r for r in
           lof_scores(_vecs(spark, rows), k=3).collect()}
    assert len(out) == 17
    outlier = out[vid]
    inliers = [out[i] for i in range(vid)]
    # the isolated point's LOF dominates every cluster member's
    assert outlier["lof"] > max(r["lof"] for r in inliers)
    assert outlier["is_outlier"]
    # cluster members sit near LOF ~ 1 (density matches their region)
    assert all(r["lof"] < 1.5 for r in inliers)


def test_lof_exact_max_rows_gate(spark):
    df = _vecs(spark, [(i, [1.0, 0.0], 0) for i in range(30)])
    with pytest.raises(ValueError, match="exact_max_rows"):
        lof_scores(df, k=2, exact_max_rows=10)


def test_silhouette_separated_vs_merged(spark):
    # labels 0/1 well separated; label 2 drawn from the SAME
    # distribution as label 0 (coincident centroids): separated
    # clusters score high, the merged pair collapses toward 0
    rows = []
    vid = 0
    for lbl, base in ((0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]),
                      (2, [1.0, 0.0, 0.0])):
        for v in _cluster(base, 6, 0.01):
            rows.append((vid, v, lbl))
            vid += 1
    out = {r["label"]: r for r in
           centroid_silhouette(_vecs(spark, rows), "label").collect()}
    assert set(out) == {0, 1, 2}
    assert all(r["n_points"] == 6 for r in out.values())
    assert out[1]["avg_silhouette"] > 0.5       # clean separation
    assert abs(out[2]["avg_silhouette"]) < 0.1  # merged with cluster 0
    assert abs(out[0]["avg_silhouette"]) < 0.1
    # a(i) (own-centroid distance) is tiny for every tight cluster
    assert all(r["avg_a"] < 0.01 for r in out.values())


def test_silhouette_max_groups_gate(spark):
    rows = [(i, [float(i), 1.0], i) for i in range(20)]
    with pytest.raises(ValueError, match="max_groups"):
        centroid_silhouette(_vecs(spark, rows), "label", max_groups=5)
