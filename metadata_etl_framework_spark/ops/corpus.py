"""Corpus-curation operators: leakage-safe dataset splits and
deterministic weighted sampling.

These extend the reference's sampling/segmentation surface
(src/utils/data_deduplicator.py keeps one doc per duplicate group;
src/transform/transform_engine.py's sample step draws unweighted rows)
with the two operations an LLM-pretraining pipeline actually needs when
carving a corpus: train/val/test assignment that never puts two
near-duplicates on opposite sides of the split boundary, and
probability-proportional-to-size sampling that is reproducible across
runs and partitionings.

Both are pure JVM column expressions (md5 → hex → integer → uniform),
no UDFs, no shuffle beyond what the caller's joins require — so they
hold at 100-TB corpus scale and every result is replayable bit-for-bit.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["md5_uniform", "leakage_safe_split", "weighted_sample", "domain_cap"]

_HASH_SPACE = float(1 << 32)


def md5_uniform(key: Column, salt: str = "") -> Column:
    """Deterministic uniform in [0, 1): the first 8 hex chars of
    md5(salt|key) as an integer, scaled by 2^32. Same construction is
    expressible in any SQL engine (for oracles) and stable across Spark
    versions, partitionings, and cluster sizes — unlike ``F.rand``.
    """
    h = F.md5(F.concat_ws("|", F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_HASH_SPACE)


def leakage_safe_split(
    df: DataFrame,
    fractions: Mapping[str, float],
    id_col: str = "doc_id",
    clusters: DataFrame | None = None,
    cluster_id_col: str = "cluster_id",
    cluster_node_col: str = "node",
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Assign every row to a named split (e.g. train/val/test) by hashing
    its SPLIT UNIT — the near-duplicate cluster id when ``clusters``
    (the output of ``dedup.connected_components``) is given, else the
    row id. All members of a cluster hash identically, so near-dup pairs
    can never straddle the train/eval boundary (the classic contamination
    leak a doc-level random split produces).

    ``fractions`` maps split name → probability mass; must sum to 1
    (±1e-9). Boundaries are cumulative over the mapping's iteration
    order. The md5-uniform assignment means the split is reproducible
    run-to-run and INCREMENTAL: re-running over a grown corpus never
    reassigns an existing unit (property of hashing vs. sorting/ntile).

    One left join against the cluster frame (shuffle on id; broadcast if
    small) and one projection — no other data movement.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if not fractions:
        raise ValueError("fractions must be non-empty")

    if clusters is not None:
        unit = F.coalesce(F.col("__cluster"), F.col(id_col).cast("string"))
        joined = df.join(
            clusters.select(
                F.col(cluster_node_col).alias(id_col),
                F.col(cluster_id_col).cast("string").alias("__cluster"),
            ),
            id_col,
            "left",
        )
    else:
        unit = F.col(id_col).cast("string")
        joined = df

    u = md5_uniform(unit, salt=salt)
    expr: Column | None = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    out_df = joined.withColumn("split_unit", unit).withColumn(out, expr)
    if clusters is not None:
        out_df = out_df.drop("__cluster")
    return out_df


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    hash_cols: Sequence[str],
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement of ``k`` rows:
    inclusion probability proportional to ``weight_col`` (Efraimidis &
    Spirakis A-ES: each row draws priority u^(1/w) from a uniform u and
    the k largest priorities win — the textbook one-pass distributed
    PPS-without-replacement scheme).

    The uniform comes from ``md5_uniform`` over ``hash_cols`` (+salt), so
    the sample is replayable and oracle-checkable; vary the salt to draw
    an independent sample. Rows with NULL or non-positive weight are
    excluded (they have zero inclusion probability in A-ES).

    Global top-k by priority compiles to TakeOrderedAndProject — a
    per-partition heap + single k-row merge, no full sort, no shuffle of
    the loser rows — the 100-TB-safe way to take k of N. Priority is
    rounded to 9 decimals with the row hash as tiebreak so engines
    ranking at different float precision agree on the cut.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in hash_cols])
    # u in (0,1]: shift the 32-bit integer by +1 so ln/pow never see 0
    h = F.md5(F.concat_ws("|", F.lit(salt), key))
    u = (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") + 1.0) / F.lit(
        _HASH_SPACE
    )
    w = F.col(weight_col).cast("double")
    priority = F.round(F.pow(u, 1.0 / w), 9)
    return (
        df.filter(w > 0)
        .withColumn("priority", priority)
        .withColumn("__tie", h)
        .orderBy(F.desc("priority"), F.asc("__tie"))
        .limit(k)
        .drop("__tie")
    )


def domain_cap(
    df: DataFrame,
    group_col: str = "source",
    cap: int = 100,
    hash_cols: Sequence[str] = ("doc_id",),
    salt: str = "",
    skew_buckets: int = 32,
) -> DataFrame:
    """Per-source document quota (the Common-Crawl-style per-domain cap):
    keep at most ``cap`` documents per ``group_col`` value, selected by a
    deterministic md5 priority (lowest hash wins) so the retained subset
    is uniform within each source, stable across runs/partitionings, and
    replayable by an oracle.

    Skew is the whole problem at corpus scale — a handful of mega-domains
    hold most of the rows, and a plain ``row_number`` window puts each
    domain in ONE task. This runs the textbook two-level selection
    instead: rows are first ranked within ``(source, bucket)`` where
    bucket = xxhash64(key) mod ``skew_buckets`` — splitting every
    mega-domain across ``skew_buckets`` parallel window tasks — and only
    the per-bucket top-``cap`` survivors (≤ cap·buckets rows per source,
    independent of domain size) enter the final per-source ranking.
    Any row in a source's true top-``cap`` is by definition in its own
    bucket's top-``cap``, so the two-level result is EXACTLY the
    single-window result (asserted in tests). ``skew_buckets <= 1``
    selects the plain single-window path for tiny inputs.

    Returns the kept rows with their final per-source ``__rank``
    (1..cap). Reference parity: extends src/transform/transform_engine.py
    sample step to the per-group quota shape.
    """
    if cap <= 0:
        raise ValueError("cap must be positive")
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in hash_cols])
    h = F.md5(F.concat_ws("|", F.lit(salt), key))
    u = F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_HASH_SPACE)
    ranked = df.withColumn("__u", F.round(u, 9)).withColumn("__tie", h)
    order = [F.asc("__u"), F.asc("__tie")]
    if skew_buckets > 1:
        wb = Window.partitionBy(
            F.col(group_col), F.pmod(F.xxhash64(F.col("__tie")), F.lit(skew_buckets))
        ).orderBy(*order)
        ranked = (
            ranked.withColumn("__brk", F.row_number().over(wb))
            .filter(F.col("__brk") <= cap)
            .drop("__brk")
        )
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        ranked.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= cap)
        .drop("__u", "__tie")
    )


def curriculum_order(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str | None = None,
    out: str = "curriculum_pos",
    descending: bool = True,
) -> DataFrame:
    """Curriculum position for every document: 1-based global rank by
    quality (best first by default) — the ordering a quality-curriculum
    training run feeds documents in.

    Scores come from ``score_col`` if given, else from
    :func:`metadata_etl_framework_spark.ops.text.quality_score`. The
    global ordinal uses
    :func:`metadata_etl_framework_spark.ops.packing.global_row_number`
    (two-phase range scan), NOT a partitionless window — exact ranks
    with no single-task bottleneck at corpus scale. ``id_col`` is the
    unique tie-break, so the ordering is deterministic.
    """
    from .packing import global_row_number

    if score_col is None:
        from .text import quality_score

        scored = quality_score(df, id_col=id_col, text_col=text_col)
        score_col = "quality_score"
    else:
        scored = df
    return global_row_number(
        scored,
        [(score_col, "desc" if descending else "asc"), (id_col, "asc")],
        out=out,
    )


def kfold_assign(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    salt: str = "",
    out: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment for cross-validation: fold =
    ⌊u·k⌋ where u is the md5-uniform of (salt, id) — the same
    reproducible-randomness convention as :func:`md5_uniform` sampling,
    so folds are stable across reruns AND across corpus growth (a
    document's fold never changes when new documents arrive, the
    incremental property shuffled splits lack). Pure projection;
    stratification needs no explicit handling — a hash-uniform of the
    id is independent of any stratum, so per-stratum fold shares
    concentrate at 1/k automatically.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    u = md5_uniform(F.col(id_col), salt=salt)
    return df.withColumn(
        out, F.least(F.floor(u * k), F.lit(k - 1)).cast("int")
    )


def corpus_release_report(
    old_docs: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    length_col: str = "n_chars",
    n_bins: int = 10,
) -> DataFrame:
    """One-call release diff between two corpus snapshots — the "what
    did this crawl release change" dashboard a dataset curator reads
    before shipping: document churn (added / removed / text-changed via
    the snapshot-diff fingerprint), per-source net deltas, and a
    length-distribution PSI (did the SHAPE of documents move, not just
    the set).

    One tall frame — (section, key, value double):
    ``counts``/INSERT|DELETE|UPDATE, ``source_delta``/<source> (new
    minus old document count, only non-zero rows), ``drift``/psi_<col>
    (PSI over ``n_bins`` reference-derived bins). Every section is a
    key-shuffled aggregate or the two-scan PSI — nothing scales past
    the two snapshot reads.
    """
    from metadata_etl_framework_spark.incremental.merge import snapshot_diff
    from metadata_etl_framework_spark.quality.drift import psi_numeric

    diff = snapshot_diff(old_docs, new_docs, [id_col], compare_cols=[text_col])
    counts = diff.groupBy("change_type").agg(
        F.count(F.lit(1)).cast("double").alias("value")
    ).select(
        F.lit("counts").alias("section"),
        F.col("change_type").alias("key"),
        "value",
    )
    o = old_docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("_o"))
    nw = new_docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    deltas = (
        o.join(nw, source_col, "full_outer")
        .select(
            F.lit("source_delta").alias("section"),
            F.col(source_col).cast("string").alias("key"),
            (
                F.coalesce("_n", F.lit(0)) - F.coalesce("_o", F.lit(0))
            ).cast("double").alias("value"),
        )
        .where(F.col("value") != 0)
    )
    psi = (
        psi_numeric(old_docs, new_docs, length_col, n_bins=n_bins)
        .select("psi_total")
        .limit(1)
        .select(
            F.lit("drift").alias("section"),
            F.lit(f"psi_{length_col}").alias("key"),
            F.col("psi_total").cast("double").alias("value"),
        )
    )
    return counts.unionByName(deltas).unionByName(psi)
