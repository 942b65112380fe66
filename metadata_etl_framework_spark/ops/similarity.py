"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single projection + top-k, no
shuffle of the corpus. Scale path: LSH bucketing (random hyperplanes)
so each query probes only matching buckets, analogous to IVF.

Numeric determinism: element products are accumulated as DECIMAL before
casting back to double, making dot products independent of evaluation
order and bitwise-reproducible against a DuckDB oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _decimal_dot(a: Column, b: Column) -> Column:
    """Exact-order-independent dot product of two float arrays → double."""
    prods = F.zip_with(
        a, b,
        lambda x, y: (x.cast("double") * y.cast("double")).cast("decimal(30,15)"),
    )
    # the merge re-casts to the accumulator type: Spark widens DECIMAL
    # addition to (38,14) otherwise, which breaks aggregate()'s fixed
    # accumulator-type contract
    return F.aggregate(
        prods,
        F.lit(0).cast("decimal(38,15)"),
        lambda acc, v: (acc + v).cast("decimal(38,15)"),
    ).cast("double")


def _norm(a: Column) -> Column:
    sq = F.transform(a, lambda x: (x.cast("double") * x.cast("double")).cast("decimal(30,15)"))
    ss = F.aggregate(
        sq,
        F.lit(0).cast("decimal(38,15)"),
        lambda acc, v: (acc + v).cast("decimal(38,15)"),
    )
    return F.sqrt(ss.cast("double"))


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """Cosine similarity; null when either vector has zero norm (a plain
    division would raise DIVIDE_BY_ZERO under ANSI mode)."""
    den = _norm(a) * _norm(b)
    return F.when(den != 0, _decimal_dot(a, b) / den)


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k rows by cosine similarity to a constant query vector.

    One scan; the top-k is a TakeOrderedAndProject (no full sort). Ties
    break by id for determinism.
    """
    q = F.array(*[F.lit(float(v)).cast("float") for v in query_vec])
    # compute the cosine ONCE; the rounded display value derives from it
    # in a later projection (multiply-referenced non-cheap exprs inline
    # into each use otherwise)
    scored = embeddings.select(
        F.col(id_col),
        cosine_similarity_col(F.col(vec_col), q).alias("_exact"),
    )
    return (
        scored.orderBy(F.desc("_exact"), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("_exact", 6).alias("cosine"))
    )


def knn_join_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force k-NN join: for every query row, top-k corpus neighbors.

    Corpus × queries is a broadcast nested-loop on the (small) query side;
    the per-query top-k is a ranked window. For large query sets use the
    LSH path instead.
    """
    from pyspark.sql import Window

    # precompute both norm columns BEFORE the join: a corpus norm would
    # otherwise recompute once per query row (and vice versa)
    q = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.col(query_vec_col).alias("_qvec"),
        _norm(F.col(query_vec_col)).alias("_qnrm"),
    )
    corpus = embeddings.select(
        F.col(id_col),
        F.col(vec_col).alias("_cvec"),
        _norm(F.col(vec_col)).alias("_cnrm"),
    )
    den = F.col("_cnrm") * F.col("_qnrm")
    scored = corpus.crossJoin(F.broadcast(q)).select(
        "_qid",
        F.col(id_col),
        F.when(den != 0, _decimal_dot(F.col("_cvec"), F.col("_qvec")) / den).alias(
            "_sim"
        ),
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("_sim"), F.col(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.round("_sim", 6).alias("cosine"),
            F.col("_rn").alias("rank"),
        )
    )


def hyperplane_lsh_buckets(
    embeddings: DataFrame,
    hyperplanes: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: bucket id = sign-bit string of H dot products.

    Candidate retrieval = equality join on bucket (plus neighboring
    buckets for recall). Hyperplanes are caller-provided (deterministic,
    e.g. seeded numpy) so plans are reproducible.
    """
    bits = [
        F.when(_decimal_dot(F.col(vec_col), F.array(*[F.lit(float(x)).cast("float") for x in h])) >= 0, "1").otherwise("0")
        for h in hyperplanes
    ]
    return embeddings.select(id_col, vec_col, F.concat(*bits).alias("bucket"))


def ivf_build(
    embeddings: DataFrame,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """IVF index: KMeans centroids (Spark ML) + cluster-assigned corpus.

    Returns (assigned_df, centroids) where assigned_df carries a
    ``_cluster`` column. At 100 TB the assigned corpus is written
    partitioned by cluster so a query's probe reads only its clusters'
    partitions (partition pruning on `_cluster`).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vec = embeddings.withColumn("_features", array_to_vector(F.col(vec_col)))
    model = KMeans(k=n_clusters, seed=seed, featuresCol="_features").fit(vec)
    assigned = model.transform(vec).withColumnRenamed("prediction", "_cluster").drop(
        "_features"
    )
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN search: score only vectors in the ``nprobe`` nearest clusters.

    Recall < 1 by construction (like LSH nprobe=1); raise nprobe for
    recall, keep it low for speed — the probe filter prunes the scan
    before any per-vector math runs.
    """
    import math

    def _dist(c: Sequence[float]) -> float:
        return math.sqrt(sum((a - b) ** 2 for a, b in zip(c, query_vec)))

    probe = sorted(range(len(centroids)), key=lambda i: _dist(centroids[i]))[:nprobe]
    candidates = assigned.filter(F.col("_cluster").isin(probe))
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col)


def lsh_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    hyperplanes: Sequence[Sequence[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: score only vectors in the query's hyperplane bucket.

    Recall < 1 by construction (same as IVF nprobe=1); callers widen with
    multi-probe when needed. The bucket filter prunes the scan before any
    expensive math runs.
    """
    bucketed = hyperplane_lsh_buckets(embeddings, hyperplanes, id_col, vec_col)
    qbits = "".join(
        "1" if sum(float(a) * float(b) for a, b in zip(h, query_vec)) >= 0 else "0"
        for h in hyperplanes
    )
    candidates = bucketed.filter(F.col("bucket") == qbits)
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col)
