"""Leakage-safe feature engineering over distributed training tables.

A curation pipeline that feeds model training needs the classic tabular
feature transforms, built so that (a) nothing leaks the target into its
own row's feature, and (b) the arithmetic is deterministic enough that a
different engine reproduces the encoded values bit-for-bit. The
reference's transformation library stops at type conversions and string
functions (cf. /root/reference/src/core/transformation_library.py);
these ops add the encoding layer:

- ``target_encoding_table`` / ``target_encode_oof``: K-fold
  out-of-fold target encoding. The fold is the portable mix hash of the
  row id (ops/sketch.py::hash32) mod K — deterministic, engine-portable,
  no RNG. The encoding for a row in fold f uses ONLY statistics from
  the other K−1 folds, smoothed toward the out-of-fold global mean, so
  a row's own label never reaches its own feature.
- ``woe_iv``: weight-of-evidence encoding + information value per
  category of a categorical column against a binary label, with
  additive smoothing so empty classes stay finite.
- ``hash_features``: the hashing trick. Feature tokens are hashed with
  md5 (available verbatim in Spark AND DuckDB) into ``n_buckets``
  signed buckets — collision behavior is therefore REPRODUCIBLE across
  engines, which is what makes a cross-system feature store possible.

Scale shapes: every encoder is one row-scale groupBy onto a BOUNDED
grid (categories × folds, categories, or buckets) followed by a
broadcast join back onto the rows — never a row-scale shuffle join,
never a partitionless window. Sums over the target accumulate as
DECIMAL so the grid is merge-order-independent (cross-engine
hash-stable); divisions happen once, on the bounded grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metadata_etl_framework_spark.ops.sketch import hash32

_DEC = "decimal(28,6)"


def fold_assign(
    df: DataFrame, id_col: str, n_folds: int = 5, out: str = "fold"
) -> DataFrame:
    """Deterministic fold id in [0, n_folds) from the portable mix hash
    of the row id — the same rows land in the same folds on every
    engine and every run (no RNG, no row order dependence)."""
    if n_folds < 2:
        raise ValueError("n_folds must be >= 2")
    return df.withColumn(out, hash32(F.col(id_col)) % F.lit(n_folds))


def target_encoding_table(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    n_folds: int = 5,
    smoothing: float = 20.0,
) -> DataFrame:
    """Out-of-fold target-encoding grid: one row per (category, fold)
    with the smoothed encoding a row of that category in that fold
    receives.

    For fold f and category c the encoding uses the OTHER folds only:

        te(c, f) = (sum_y(c) − sum_y(c, f) + s · prior(f))
                 / (cnt(c) − cnt(c, f) + s)

    where ``prior(f)`` is the global out-of-fold target mean
    (Σy − Σy(f)) / (n − n(f)) — so neither the category statistics nor
    the shrinkage target include fold f's labels. One row-scale
    groupBy((cat, fold)) produces the grid; everything after runs on
    the bounded grid (categories × folds) driver-free and is replayable
    in plain SQL. Target sums accumulate as DECIMAL (exact,
    merge-order-independent); NULL categories are kept as their own
    encodable class, NULL targets are excluded.

    Output: (cat, fold, n_oof, te 6dp), one row per observed
    (category, fold) pair.
    """
    if n_folds < 2:
        raise ValueError("n_folds must be >= 2")
    base = df.where(F.col(target_col).isNotNull()).select(
        F.col(cat_col).alias("cat"),
        F.col(target_col).cast(_DEC).alias("y"),
        (hash32(F.col(id_col)) % F.lit(n_folds)).alias("fold"),
    )
    grid = base.groupBy("cat", "fold").agg(
        F.sum("y").alias("f_sum"), F.count(F.lit(1)).alias("f_cnt")
    )
    # bounded-grid roll-ups: per category and per fold (both tiny)
    per_cat = grid.groupBy("cat").agg(
        F.sum("f_sum").alias("c_sum"), F.sum("f_cnt").alias("c_cnt")
    )
    per_fold = grid.groupBy("fold").agg(
        F.sum("f_sum").alias("g_sum"), F.sum("f_cnt").alias("g_cnt")
    )
    tot = grid.agg(
        F.sum("f_sum").alias("t_sum"), F.sum("f_cnt").alias("t_cnt")
    )
    s = F.lit(float(smoothing))
    prior = (
        (F.col("t_sum") - F.col("g_sum")).cast("double")
        / (F.col("t_cnt") - F.col("g_cnt")).cast("double")
    )
    pf = per_fold.join(F.broadcast(tot)).select(
        "fold", prior.alias("prior"), (F.col("t_cnt") - F.col("g_cnt")).alias("n_gof")
    )
    oof_sum = (F.col("c_sum") - F.col("f_sum")).cast("double")
    oof_cnt = (F.col("c_cnt") - F.col("f_cnt")).cast("double")
    te = (oof_sum + s * F.col("prior")) / (oof_cnt + s)
    pc = F.broadcast(per_cat.withColumnRenamed("cat", "__cat"))
    return (
        grid.join(pc, grid["cat"].eqNullSafe(pc["__cat"]))
        .join(F.broadcast(pf), "fold")
        .select(
            "cat",
            "fold",
            (F.col("c_cnt") - F.col("f_cnt")).cast("long").alias("n_oof"),
            F.round(te, 6).alias("te"),
        )
    )


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    n_folds: int = 5,
    smoothing: float = 20.0,
    out: str = "te",
) -> DataFrame:
    """Append the out-of-fold target encoding as a column: compute the
    (category × fold) grid once, broadcast-join it back on
    (cat, fold). Rows whose (category, fold) never appears with a
    non-NULL target get NULL (no statistics exist that exclude them).
    The row-scale cost is one groupBy + one broadcast hash join."""
    tbl = target_encoding_table(
        df, cat_col, target_col, id_col, n_folds=n_folds, smoothing=smoothing
    )
    keyed = df.withColumn("__fold", hash32(F.col(id_col)) % F.lit(n_folds))
    enc = F.broadcast(
        tbl.select(
            F.col("cat").alias("__cat"),
            F.col("fold").alias("__f2"),
            F.col("te").alias(out),
        )
    )
    return keyed.join(
        enc,
        on=[
            keyed["__fold"] == enc["__f2"],
            keyed[cat_col].eqNullSafe(enc["__cat"]),
        ],
        how="left",
    ).drop("__cat", "__f2", "__fold")


def woe_iv(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    smoothing: float = 0.5,
) -> DataFrame:
    """Weight of evidence per category of ``cat_col`` against a binary
    label, plus each category's information-value contribution.

    With additive smoothing s over K observed categories:

        dist_pos(c) = (pos_c + s) / (P + s·K)
        dist_neg(c) = (neg_c + s) / (N + s·K)
        woe(c)      = ln(dist_pos(c) / dist_neg(c))
        iv(c)       = (dist_pos(c) − dist_neg(c)) · woe(c)

    Total IV is ``SUM(iv)`` over the output. One row-scale groupBy to
    the category grid; totals are a 1-row broadcast. Integer counts
    keep both engines' inputs to ln() bit-identical; outputs are
    rounded to 6dp per the repo's ln-parity convention.

    Output: (cat, n_pos, n_neg, woe 6dp, iv 6dp) per category.
    """
    base = df.where(F.col(label_col).isNotNull()).select(
        F.col(cat_col).alias("cat"),
        F.col(label_col).cast("boolean").cast("int").alias("y"),
    )
    per_cat = base.groupBy("cat").agg(
        F.sum("y").alias("n_pos"),
        F.sum(1 - F.col("y")).alias("n_neg"),
    )
    tot = per_cat.agg(
        F.sum("n_pos").alias("t_pos"),
        F.sum("n_neg").alias("t_neg"),
        F.count(F.lit(1)).alias("k"),
    )
    s = F.lit(float(smoothing))
    dp = (F.col("n_pos") + s) / (F.col("t_pos") + s * F.col("k"))
    dn = (F.col("n_neg") + s) / (F.col("t_neg") + s * F.col("k"))
    woe = F.log(dp / dn)
    return per_cat.join(F.broadcast(tot)).select(
        "cat",
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.round(woe, 6).alias("woe"),
        F.round((dp - dn) * woe, 6).alias("iv"),
    )


def hash_features(
    df: DataFrame,
    id_col: str,
    categorical: "list[str] | None" = None,
    numeric: "list[str] | None" = None,
    n_buckets: int = 1024,
    decimal_out: bool = False,
) -> DataFrame:
    """The hashing trick: map an open vocabulary of feature tokens into
    ``n_buckets`` signed buckets, producing sparse (id, bucket, value)
    triples.

    Tokens are ``col=value`` for categorical columns (value 1) and
    ``col`` for numeric columns (value = the number). The bucket is the
    first 8 hex digits of ``md5(token)`` mod n_buckets and the sign is
    the parity of the 9th digit — md5 evaluates identically in Spark
    and DuckDB, so two engines hash a feature into the SAME signed
    bucket and their sparse vectors are interchangeable (the property a
    cross-system feature store needs; engine-native hashes guarantee
    nothing across versions, let alone engines).

    One generated-column projection + one groupBy((id, bucket)) — the
    explode fans each row out by ``len(features)``, not by data volume.
    Values accumulate as DECIMAL (exact for the ±1 categorical
    indicators and fixed-scale numerics).

    Output: (id_col, bucket, value) — collided tokens sum, signed, per
    the standard hashing-trick estimator. ``decimal_out=True`` keeps
    the value as exact DECIMAL so downstream roll-ups stay
    merge-order-independent (the oracle-entry path); the default casts
    to double for consumption.
    """
    cats = list(categorical or [])
    nums = list(numeric or [])
    if not cats and not nums:
        raise ValueError("at least one feature column required")
    feats = []
    for c in cats:
        tok = F.concat_ws("=", F.lit(c), F.coalesce(F.col(c).cast("string"), F.lit("")))
        feats.append(F.struct(tok.alias("tok"), F.lit(1).cast(_DEC).alias("v")))
    for c in nums:
        feats.append(
            F.struct(F.lit(c).alias("tok"), F.col(c).cast(_DEC).alias("v"))
        )
    ex = df.select(
        F.col(id_col), F.explode(F.array(*feats)).alias("f")
    ).select(
        id_col,
        F.col("f.tok").alias("tok"),
        F.col("f.v").alias("v"),
    ).where(F.col("v").isNotNull())
    h = F.md5(F.col("tok"))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(n_buckets)
    sign = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    agg = (
        ex.select(
            id_col,
            bucket.alias("bucket"),
            (sign * F.col("v")).cast(_DEC).alias("sv"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("sv").alias("__value"))
    )
    val = F.col("__value") if decimal_out else F.col("__value").cast("double")
    return agg.select(id_col, "bucket", val.alias("value"))
