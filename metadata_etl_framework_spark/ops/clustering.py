"""Spherical k-means over embedding columns — fixed-round Lloyd loops.

The clustering counterpart of ops/similarity.py's centroid analytics:
group embeddings into k clusters by cosine similarity (spherical
k-means — the variant that matches how embedding geometry is actually
used downstream: IVF coarse quantizers, topic buckets, dedup shards).
The reference has no ML surface at all; this is beyond-reference
capability built the Spark-first way.

Deterministic by construction so a differential oracle can replay it:
- Seeding: the k rows with the SMALLEST ids (deterministic, replayable;
  k-means++ would need engine-private randomness). Callers wanting
  quality seeds pass ``seed_ids`` explicitly.
- Assignment: argmax cosine over the k broadcast centroids, rounded to
  6 dp first, ties to the smallest cluster index.
- Update: per-(cluster, dim) DECIMAL-exact means rounded to 6 dp — the
  same convention as similarity.group_centroids.
- A FIXED number of Lloyd rounds (no data-dependent convergence test),
  so every engine unrolls the identical computation.

Scale design: each round is one broadcast projection (n·k·d work, no
shuffle) plus one (cluster, dim)-cell aggregation (map-side combined —
the shuffle carries k·d cells per partition, not rows). Centroids live
in a k-row driver list (k is small by definition); the per-round
assignment frame is never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _decimal_dot, _norm

__all__ = ["kmeans_assign", "kmeans_summary"]


def _centroid_frame(df_cent: DataFrame) -> DataFrame:
    """(cluster, vec) frame -> add norms, ready to broadcast."""
    return df_cent.select(
        F.col("_c"),
        F.col("_cv"),
        _norm(F.col("_cv")).alias("_cnrm"),
    )


def kmeans_assign(
    df: DataFrame,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_ids: "list | None" = None,
    max_iterations: int = 50,
) -> DataFrame:
    """Run ``iterations`` Lloyd rounds of spherical k-means and return
    the final assignment: (id, cluster int, cosine 6 dp) — cosine is
    the similarity to the point's final centroid.

    Initial centroids are the vectors of ``seed_ids`` (or the k
    smallest ids), values rounded to 6 dp; each round assigns by
    max-cosine (ties to the smallest cluster index) and recomputes
    6-dp decimal-exact per-dim means. Clusters that lose every member
    keep their previous centroid (the standard empty-cluster rule that
    keeps k stable). ``iterations`` > ``max_iterations`` raises — the
    loop is plan-unrolled per round; long loops need the
    localCheckpoint discipline of ops/graph.py, not more rounds here.
    """
    if not 1 <= iterations <= max_iterations:
        raise ValueError(
            f"iterations={iterations} outside [1, {max_iterations}]"
        )
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pts = df.where(
        F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(
        F.col(id_col).alias("_p"),
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col)).alias("_nrm"),
    )
    if seed_ids is None:
        seeds = pts.orderBy("_p").limit(int(k))
    else:
        seeds = pts.where(F.col("_p").isin(list(seed_ids)))
    w_seed = Window.orderBy("_p")
    cents = seeds.select(
        (F.row_number().over(w_seed) - 1).cast("int").alias("_c"),
        F.transform(
            F.col("_v"), lambda x: F.round(x.cast("double"), 6)
        ).alias("_cv"),
    )
    pts = pts.persist()
    try:
        assigned = None
        for it in range(int(iterations)):
            cen = _centroid_frame(cents)
            den = F.col("_nrm") * F.col("_cnrm")
            scored = pts.crossJoin(F.broadcast(cen)).select(
                "_p",
                "_c",
                F.round(
                    F.when(
                        den != 0,
                        _decimal_dot(F.col("_v"), F.col("_cv")) / den,
                    ),
                    6,
                ).alias("_cos"),
            )
            w = Window.partitionBy("_p").orderBy(
                F.desc_nulls_last("_cos"), F.asc("_c")
            )
            assigned = (
                scored.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .select("_p", "_c", "_cos")
            )
            if it == int(iterations) - 1:
                break  # the final update would never be consumed
            new_cells = (
                assigned.join(pts.select("_p", "_v"), "_p")
                .select("_c", F.posexplode("_v").alias("_dim", "_x"))
                .groupBy("_c", "_dim")
                .agg(
                    F.round(
                        F.sum(
                            F.col("_x").cast("double").cast("decimal(30,15)")
                        ).cast("double")
                        / F.count(F.lit(1)),
                        6,
                    ).alias("_cval")
                )
            )
            new_cents = new_cells.groupBy("_c").agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_dim"), F.col("_cval")))
                    ),
                    lambda s: s["_cval"],
                ).alias("_cv")
            )
            # empty-cluster rule: keep the previous centroid
            kept = cents.join(new_cents.select("_c"), "_c", "left_anti")
            cents = new_cents.unionByName(kept).localCheckpoint(eager=True)
        return assigned.select(
            F.col("_p").alias(id_col),
            F.col("_c").alias("cluster"),
            F.col("_cos").alias("cosine"),
        ).orderBy(id_col)
    finally:
        pts.unpersist()


def kmeans_summary(
    df: DataFrame,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster readout after :func:`kmeans_assign`: size and mean
    cosine to the final centroid (spherical inertia — higher = tighter;
    DECIMAL mean of the 6-dp cosines, so engine-exact).

    Output: (cluster int, n_points long, avg_cosine 6 dp, min_cosine),
    ordered by cluster.
    """
    assigned = kmeans_assign(df, k, iterations, id_col, vec_col)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.round(
                F.sum(F.col("cosine").cast("decimal(14,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_cosine"),
            F.min("cosine").alias("min_cosine"),
        )
        .orderBy("cluster")
    )
