"""Model-score evaluation over distributed scored corpora.

A 100-TB curation pipeline ends in scores — quality classifiers, dedup
confidences, toxicity filters — and the questions asked of those scores
are the classic supervised-eval ones: how well does the score rank the
positives (AUC), how concentrated are they in the top deciles (lift /
gains), and do predicted probabilities match observed rates
(calibration). The reference's quality surface stops at rule pass-rates
(cf. /root/reference/src/quality/data_quality_manager.py); these ops
extend it to score evaluation with the same oracle-friendly,
deterministic-arithmetic conventions as the rest of the repo.

Scale shapes:

- ``binary_auc`` is the Mann–Whitney rank-sum form computed over the
  DISTINCT-score frame: one groupBy(score), one two-phase global prefix
  sum (ops/packing.py::global_prefix_sum — range partition + broadcast
  offsets, never a partitionless window), one 1-row aggregate. Post-scan
  state is O(distinct scores) spread across partitions.
- ``lift_table`` buckets by exact SQL NTILE semantics over descending
  score (functions/aggregations.py::ntile_assign — the scale-safe global
  rank) and then works on the n_buckets-row grid; the cumulative window
  runs over that bounded grid, never rows.
- ``calibration_bins`` is one bounds aggregate (broadcast 1-row) plus
  one groupBy(bin) — the histogram shape.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _materialize_1row(df: DataFrame, persisted: "list[DataFrame]") -> DataFrame:
    """Collect a 1-row aggregate eagerly, release the prefix-scan caches
    it pinned (they are correctness-critical only until this
    materialization — see ops/packing.py), and re-emit the row as a
    fresh DataFrame with the identical schema. Keeps the AUC-family ops
    from leaking MEMORY_AND_DISK cache entries for the session lifetime
    while costing only a 1-row collect."""
    rows = df.collect()
    for h in persisted:
        h.unpersist()
    return df.sparkSession.createDataFrame(rows, df.schema)


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    release: bool = True,
) -> DataFrame:
    """Exact ROC AUC of a score against a binary label — the
    Mann–Whitney U statistic: AUC = P(score⁺ > score⁻) + ½·P(tie),
    computed by the average-rank-sum closed form, never by pairwise
    comparison.

    Per distinct score s with n_s rows (p_s positive), ascending-score
    average rank is ``cum_before(s) + (n_s + 1)/2``; then
    ``AUC = (Σ p_s·avgrank(s) − P(P+1)/2) / (P·N)``. The only
    row-scale operation is the groupBy(score); the prefix sum runs on
    the distinct-score frame via the two-phase range-partitioned scan.
    The rank-sum accumulates as DECIMAL (avg ranks are exact .5 steps),
    so the statistic is merge-order-independent and cross-engine
    hash-stable.

    Rows with a NULL score or label are excluded (they have no rank /
    no class). Degenerate inputs (single class) yield NULL auc.

    ``release=True`` (default) eagerly materializes the 1-row result
    and unpersists the prefix-scan caches — no session-lifetime leak.
    ``release=False`` keeps the plan LAZY (caches stay pinned until the
    consumer materializes): required when the result feeds Catalyst
    column lineage or further pipeline steps (the drift-step
    convention).

    Output: 1 row — (n_pos, n_neg, auc 6dp).
    """
    from metadata_etl_framework_spark.ops.packing import global_prefix_sum

    base = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).alias("s"),
        F.col(label_col).cast("boolean").cast("int").alias("y"),
    )
    per_score = base.groupBy("s").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("p"),
    )
    handles: list[DataFrame] = []
    cum = global_prefix_sum(per_score, "s", "n", out="__cum", persisted=handles)
    # inclusive prefix − own count = ranks before this score block
    avg_rank = (
        (F.col("__cum") - F.col("n")).cast("decimal(38,10)")
        + (F.col("n") + 1).cast("decimal(38,10)") / 2
    )
    tot = cum.agg(
        F.sum("p").alias("P"),
        F.sum(F.col("n") - F.col("p")).alias("N"),
        F.sum(F.col("p").cast("decimal(38,10)") * avg_rank).alias("R"),
    )
    P, N = F.col("P"), F.col("N")
    auc = (
        F.col("R").cast("double")
        - (P.cast("double") * (P + 1).cast("double")) / 2
    ) / (P.cast("double") * N.cast("double"))
    out = tot.select(
        P.cast("long").alias("n_pos"),
        N.cast("long").alias("n_neg"),
        F.round(F.when((P > 0) & (N > 0), auc), 6).alias("auc"),
    )
    return _materialize_1row(out, handles) if release else out


def binary_auc_by_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Per-segment ROC AUC — :func:`binary_auc`'s rank-sum closed form
    evaluated WITHIN each group: the fairness / segment-audit readout
    ("does the quality classifier rank as well on src9 as on src2?")
    that a global AUC averages away.

    Scale shape: one groupBy(group, score), then the rank prefix runs
    as a window PARTITIONED BY group over the per-group distinct-score
    frame (never a partitionless window — each group's window state is
    its own distinct-score count, and groups spread across the
    cluster; one giant group degrades to that group's distinct-score
    count on one task, which is the aggregation's intrinsic lower
    bound). Identical DECIMAL rank-sum arithmetic to the global op, so
    the same SQL oracle shape replays it per group.

    Output per group: (group, n_pos, n_neg, auc 6dp) — NULL auc for
    single-class groups.
    """
    base = df.where(
        F.col(score_col).isNotNull()
        & F.col(label_col).isNotNull()
        & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        F.col(score_col).alias("s"),
        F.col(label_col).cast("boolean").cast("int").alias("y"),
    )
    per_score = base.groupBy("g", "s").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("p"),
    )
    w = Window.partitionBy("g").orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_score.withColumn("__cum", F.sum("n").over(w))
    avg_rank = (
        (F.col("__cum") - F.col("n")).cast("decimal(38,10)")
        + (F.col("n") + 1).cast("decimal(38,10)") / 2
    )
    tot = cum.groupBy("g").agg(
        F.sum("p").alias("__P"),
        F.sum(F.col("n") - F.col("p")).alias("__N"),
        F.sum(F.col("p").cast("decimal(38,10)") * avg_rank).alias("__R"),
    )
    P, N = F.col("__P"), F.col("__N")
    auc = (
        F.col("__R").cast("double")
        - (P.cast("double") * (P + 1).cast("double")) / 2
    ) / (P.cast("double") * N.cast("double"))
    return tot.select(
        F.col("g").alias(group_col),
        P.cast("long").alias("n_pos"),
        N.cast("long").alias("n_neg"),
        F.round(F.when((P > 0) & (N > 0), auc), 6).alias("auc"),
    )


def brier_score(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Brier score — mean squared error of a probability-like score
    against the binary outcome, the strictly proper scoring rule that
    penalizes BOTH miscalibration and lack of resolution (ECE alone
    rewards a constant base-rate predictor). One projection + one
    1-row aggregate; squared errors quantize into DECIMAL(30,12) so
    the mean is partition-order-independent.

    Output: 1 row — (n long, brier 6dp); NULL on empty input.
    """
    base = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).cast("double").alias("s"),
        F.col(label_col).cast("boolean").cast("int").alias("y"),
    )
    sq = (
        (F.col("s") - F.col("y")) * (F.col("s") - F.col("y"))
    ).cast("decimal(30,12)")
    return base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.when(
                F.count(F.lit(1)) > 0,
                F.sum(sq).cast("double") / F.count(F.lit(1)),
            ),
            6,
        ).alias("brier"),
    )


def lift_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Decile lift / gains table: rows bucket by DESCENDING score with
    exact SQL NTILE semantics (bucket 1 = top scores), and each bucket
    reports its positive rate, lift over the base rate, and the
    cumulative share of all positives captured so far — the "how deep
    must the filter cut" readout.

    Bucketing rides :func:`~metadata_etl_framework_spark.functions.
    aggregations.ntile_assign` on (−score, id): the negation gives the
    descending order and the unique ``id_col`` makes tie assignment
    deterministic (the same ORDER BY score DESC, id an oracle replays).
    Everything after the bucket groupBy runs on the n_buckets-row grid;
    the cumulative window is over that bounded grid, never data rows.

    Output per bucket: (bucket, n, positives, pos_rate, lift,
    cum_positives, cum_capture_rate, cum_lift) — rates/lifts 6dp, NULL
    lift when the corpus has no positives.
    """
    from metadata_etl_framework_spark.functions.aggregations import (
        ntile_assign,
    )

    base = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        (-F.col(score_col).cast("double")).alias("__neg"),
        F.col(id_col).alias("__id"),
        F.col(label_col).cast("boolean").cast("int").alias("y"),
    )
    bucketed = ntile_assign(base, ["__neg", "__id"], n_buckets, out="bucket")
    grid = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("positives"),
    )
    # bounded n_buckets-row frame: the unpartitioned window is over the
    # GRID, not data (same rationale as the funnel stage frame)
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = grid.agg(
        F.sum("n").alias("__tn"), F.sum("positives").alias("__tp")
    )
    cum = (
        grid.withColumn("cum_n", F.sum("n").over(w))
        .withColumn("cum_positives", F.sum("positives").over(w))
        .crossJoin(F.broadcast(tot))
    )
    base_rate = F.col("__tp") / F.col("__tn")
    rate = F.col("positives") / F.col("n")
    cum_rate = F.col("cum_positives") / F.col("cum_n")
    return cum.select(
        "bucket",
        "n",
        "positives",
        F.round(rate, 6).alias("pos_rate"),
        F.round(
            F.when(F.col("__tp") > 0, rate / base_rate), 6
        ).alias("lift"),
        "cum_positives",
        F.round(
            F.when(F.col("__tp") > 0,
                   F.col("cum_positives") / F.col("__tp")),
            6,
        ).alias("cum_capture_rate"),
        F.round(
            F.when(F.col("__tp") > 0, cum_rate / base_rate), 6
        ).alias("cum_lift"),
    )


def expected_calibration_error(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Expected Calibration Error: the n-weighted mean of the per-bin
    |avg_score − pos_rate| gaps from :func:`calibration_bins` — the
    single-number calibration readout (Guo et al. 2017's ECE with
    fixed-width bins).

    Computed FROM the calibration_bins frame (gaps at their published
    6-dp rounding), so the roll-up is exactly the number a user would
    derive from the reported reliability table. The weighted sum
    accumulates as DECIMAL so the statistic is merge-order-independent.
    One extra 1-row aggregate over the n_bins-row grid.

    Output: 1 row — (n long, n_bins_nonempty int, ece 6dp).
    """
    bins = calibration_bins(df, score_col, label_col, n_bins, lo, hi)
    w_gap = (F.col("n") * F.col("abs_gap")).cast("decimal(38,10)")
    return bins.agg(
        F.sum("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("int").alias("n_bins_nonempty"),
        F.round(
            F.when(
                F.sum("n") > 0,
                F.sum(w_gap).cast("double") / F.sum("n"),
            ),
            6,
        ).alias("ece"),
    )


def pr_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    release: bool = True,
) -> DataFrame:
    """Area under the precision–recall curve as AVERAGE PRECISION —
    AP = Σ_s (p_s / P) · precision(s), summing over distinct scores s
    in any order, where precision(s) counts rows with score ≥ s (ties
    included as a block, the sklearn ``average_precision_score``
    convention — no trapezoidal interpolation, which is optimistic on
    PR curves per Davis & Goadrich 2006).

    Same scale shape as :func:`binary_auc`: one groupBy(score), two
    two-phase global prefix scans over the DISTINCT-score frame (row
    counts and positive counts), one 1-row aggregate. The per-score
    term p_s·precision(s) is rounded into DECIMAL(38,12) before the
    sum so the statistic is merge-order-independent and an oracle
    replays it bit-for-bit.

    Rows with NULL score or label are excluded. No positives → NULL.

    Output: 1 row — (n_pos, n_neg, pr_auc 6dp).
    """
    from metadata_etl_framework_spark.ops.packing import global_prefix_sum

    base = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).alias("s"),
        F.col(label_col).cast("boolean").cast("int").alias("y"),
    )
    per_score = base.groupBy("s").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("p"),
    )
    handles: list[DataFrame] = []
    # both prefixes share the score order: ONE fused range-partition
    # pass instead of two (halves the dominant shuffle cost)
    cum = global_prefix_sum(
        per_score, "s", ["n", "p"], out=["__cn", "__cp"], persisted=handles
    )
    # total aliases must NOT collide case-insensitively with the
    # per-score columns n/p still on `cum` (Spark's default resolution
    # is case-INsensitive: an alias "P" next to column "p" is an
    # AMBIGUOUS_REFERENCE) — same __-prefix convention as lift_table
    tot = cum.agg(
        F.sum("n").alias("__tot_n"), F.sum("p").alias("__tot_p")
    )
    cum = cum.crossJoin(F.broadcast(tot))
    # rows / positives at threshold s (score >= s): descending
    # cumulative = total − ascending-exclusive prefix
    rows_ge = F.col("__tot_n") - F.col("__cn") + F.col("n")
    pos_ge = F.col("__tot_p") - F.col("__cp") + F.col("p")
    term = (
        F.col("p").cast("double")
        * pos_ge.cast("double")
        / rows_ge.cast("double")
    ).cast("decimal(38,12)")
    agg = cum.agg(
        F.max("__tot_p").alias("__P"),
        F.max(F.col("__tot_n") - F.col("__tot_p")).alias("__N"),
        F.sum(term).alias("__ap"),
    )
    out = agg.select(
        F.col("__P").cast("long").alias("n_pos"),
        F.col("__N").cast("long").alias("n_neg"),
        F.round(
            F.when(
                (F.col("__P") > 0),
                F.col("__ap").cast("double") / F.col("__P").cast("double"),
            ),
            6,
        ).alias("pr_auc"),
    )
    return _materialize_1row(out, handles) if release else out


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    label_col: str,
    persisted: "list[DataFrame] | None" = None,
) -> DataFrame:
    """Classification metrics at EVERY decision threshold: one row per
    distinct score s with the confusion counts and precision / recall /
    F1 / accuracy of the rule ``predict positive iff score >= s`` —
    the operating-point table behind a threshold choice (the
    deployable complement of :func:`binary_auc`'s single number).

    Same scale shape as :func:`pr_auc`: one groupBy(score), two
    two-phase global prefix scans over the DISTINCT-score frame, one
    broadcast 1-row totals cross-join. Output is O(distinct scores)
    rows spread across partitions — filter or ``limit`` downstream for
    presentation. All ratio arithmetic is plain IEEE double in a fixed
    operation order so an external SQL oracle replays it bit-for-bit;
    zero-denominator cases (no positives, tp = 0) yield NULL, never an
    ANSI division error.

    Output per distinct score: (threshold double, n_pred_pos, tp, fp,
    fn, tn longs, precision, recall, f1, accuracy 6dp). The output is
    row-scale (unlike the 1-row AUC statistics), so the prefix-scan
    caches stay pinned until the CONSUMER materializes; pass
    ``persisted`` to own their release (the
    global_prefix_sum_decimal convention).
    """
    from metadata_etl_framework_spark.ops.packing import global_prefix_sum

    base = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).cast("double").alias("s"),
        F.col(label_col).cast("boolean").cast("int").alias("y"),
    )
    per_score = base.groupBy("s").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("p"),
    )
    cum = global_prefix_sum(
        per_score, "s", ["n", "p"], out=["__cn", "__cp"],
        persisted=persisted,
    )
    tot = cum.agg(
        F.sum("n").alias("__tot_n"), F.sum("p").alias("__tot_p")
    )
    cum = cum.crossJoin(F.broadcast(tot))
    pp = F.col("__tot_n") - F.col("__cn") + F.col("n")  # predicted pos
    tp = F.col("__tot_p") - F.col("__cp") + F.col("p")
    fp = pp - tp
    fn = F.col("__tot_p") - tp
    tn = (F.col("__tot_n") - pp) - fn
    precision = tp.cast("double") / pp.cast("double")  # pp >= n >= 1
    recall = tp.cast("double") / F.col("__tot_p").cast("double")
    f1 = (
        F.lit(2.0) * precision * recall / (precision + recall)
    )
    return cum.select(
        F.col("s").alias("threshold"),
        pp.cast("long").alias("n_pred_pos"),
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        tn.cast("long").alias("tn"),
        F.round(precision, 6).alias("precision"),
        F.round(
            F.when(F.col("__tot_p") > 0, recall), 6
        ).alias("recall"),
        F.round(
            F.when((F.col("__tot_p") > 0) & (tp > 0), f1), 6
        ).alias("f1"),
        F.round(
            (tp + tn).cast("double") / F.col("__tot_n").cast("double"), 6
        ).alias("accuracy"),
    )


def score_eval_suite(
    df: DataFrame,
    score_col: str,
    label_col: str,
    metrics: "tuple[str, ...]" = ("auc", "pr_auc", "ece"),
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
    release: bool = True,
) -> DataFrame:
    """Tall (metric, value) score-audit readout — the gate-friendly
    shape: a curation pipeline thresholds rows of this frame exactly
    the way it already gates on the drift suite's (column, metric,
    value) dashboard (e.g. SLA ceiling ``auc >= 0.8``, ``ece <= 0.05``).

    Composes the 1-row statistics (:func:`binary_auc`, :func:`pr_auc`,
    :func:`expected_calibration_error`) — one data pass per requested
    metric family, each individually scale-safe; class counts ride
    along as n_pos / n_neg rows. Unknown metric names raise (a config
    typo must not silently drop a gate).

    Output: (metric string, value double), values at their published
    6-dp rounding.
    """
    allowed = {"auc", "pr_auc", "ece", "brier"}
    bad = set(metrics) - allowed
    if bad:
        raise ValueError(f"unknown score_eval metrics: {sorted(bad)}")
    if not metrics:
        raise ValueError("metrics must be non-empty")
    parts: list[DataFrame] = []

    def tall(frame: DataFrame, pairs: "list[tuple[str, str]]") -> None:
        for out_name, col in pairs:
            parts.append(
                frame.select(
                    F.lit(out_name).alias("metric"),
                    F.col(col).cast("double").alias("value"),
                )
            )

    if "auc" in metrics:
        a = binary_auc(df, score_col, label_col, release=release)
        tall(a, [("n_pos", "n_pos"), ("n_neg", "n_neg"), ("auc", "auc")])
    if "pr_auc" in metrics:
        p = pr_auc(df, score_col, label_col, release=release)
        pairs = [("pr_auc", "pr_auc")]
        if "auc" not in metrics:
            pairs = [("n_pos", "n_pos"), ("n_neg", "n_neg")] + pairs
        tall(p, pairs)
    if "ece" in metrics:
        e = expected_calibration_error(
            df, score_col, label_col, n_bins, lo, hi
        )
        tall(e, [("ece", "ece")])
    if "brier" in metrics:
        b = brier_score(df, score_col, label_col)
        tall(b, [("brier", "brier")])
    out = parts[0]
    for part in parts[1:]:
        out = out.unionAll(part)
    return out


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Reliability-diagram bins: fixed-width score bins over [lo, hi]
    with mean predicted score vs observed positive rate per bin — the
    calibration readout for probability-like scores (plus the |gap|
    that an expected-calibration-error roll-up weights by n).

    One projection + one groupBy(bin): the histogram shape, O(n_bins)
    post-scan. Scores outside [lo, hi] clamp into the edge bins (a
    probability column should not have them; clamping keeps the op
    total). The top edge is inclusive (score = hi lands in the last
    bin, same convention as histogram2d).

    Output per non-empty bin: (bin, bin_lo, bin_hi, n, avg_score,
    pos_rate, abs_gap) — 6dp.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if not hi > lo:
        raise ValueError("hi must exceed lo")
    width = (hi - lo) / n_bins
    s = F.col(score_col).cast("double")
    bin_ = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0), F.floor((s - F.lit(lo)) / F.lit(width)).cast("int")
        ),
    )
    base = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        bin_.alias("bin"),
        s.alias("s"),
        F.col(label_col).cast("boolean").cast("int").alias("y"),
    )
    agg = base.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        # DECIMAL sums: mean independent of partition merge order
        F.sum(F.col("s").cast("decimal(30,10)")).alias("__ss"),
        F.sum("y").alias("__pos"),
    )
    avg_score = F.col("__ss").cast("double") / F.col("n")
    pos_rate = F.col("__pos") / F.col("n")
    return agg.select(
        "bin",
        F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("bin_lo"),
        F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias(
            "bin_hi"
        ),
        "n",
        F.round(avg_score, 6).alias("avg_score"),
        F.round(pos_rate, 6).alias("pos_rate"),
        F.round(F.abs(avg_score - pos_rate), 6).alias("abs_gap"),
    )


def confusion_matrix(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Multi-class confusion matrix: one row per observed
    (label, pred) pair with its count — the primitive every
    classification-quality readout derives from.

    One groupBy over the two class columns; output is bounded by
    C² rows for C classes, so every downstream derivation
    (per-class metrics, kappa) is post-scan work on a tiny grid.
    Rows with a NULL on either side are excluded (no cell).

    Output: (label, pred, n), one row per non-empty cell.
    """
    return (
        df.where(
            F.col(label_col).isNotNull() & F.col(pred_col).isNotNull()
        )
        .select(
            F.col(label_col).cast("string").alias("label"),
            F.col(pred_col).cast("string").alias("pred"),
        )
        .groupBy("label", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def multiclass_metrics(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Per-class precision / recall / F1 / support for a multi-class
    prediction column — the sklearn ``classification_report`` table.

    Scale shape: ONE row-scale groupBy (the confusion matrix), then
    every per-class figure is an aggregate over that bounded C²-row
    grid — two tiny groupBys full-outer-joined on the class key (a
    class can appear only among labels or only among predictions).

    Conventions (mirrored exactly by the SQL oracle):
    - ``precision`` NULL when the class is never predicted,
    - ``recall`` NULL when the class has no true rows,
    - ``f1`` NULL unless both are defined and precision+recall > 0
      (the 0/0 F1 is undefined, not zero — callers that want
      sklearn's ``zero_division=0`` coalesce downstream).

    Output per class: (class, support, predicted, tp,
    precision, recall, f1) — 6dp, one row per class seen on either
    side.
    """
    cm = confusion_matrix(df, label_col, pred_col)
    by_label = cm.groupBy(F.col("label").alias("class")).agg(
        F.sum("n").alias("support"),
        F.sum(F.when(F.col("label") == F.col("pred"), F.col("n"))
              .otherwise(F.lit(0))).alias("tp"),
    )
    by_pred = cm.groupBy(F.col("pred").alias("class")).agg(
        F.sum("n").alias("predicted")
    )
    j = by_label.join(by_pred, "class", "full_outer").select(
        "class",
        F.coalesce("support", F.lit(0)).alias("support"),
        F.coalesce("predicted", F.lit(0)).alias("predicted"),
        F.coalesce("tp", F.lit(0)).alias("tp"),
    )
    precision = F.when(
        F.col("predicted") > 0, F.col("tp") / F.col("predicted")
    )
    recall = F.when(F.col("support") > 0, F.col("tp") / F.col("support"))
    f1 = F.when(
        (F.col("predicted") > 0)
        & (F.col("support") > 0)
        & (precision + recall > 0),
        2 * precision * recall / (precision + recall),
    )
    return j.select(
        "class",
        "support",
        "predicted",
        "tp",
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def multiclass_summary(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """One-row multi-class roll-up: accuracy, macro / weighted
    averages, and Cohen's kappa — the gate-friendly headline numbers
    over :func:`multiclass_metrics`.

    - ``accuracy`` = Σ tp / n (micro-F1 equals it in single-label
      classification, so it is not repeated),
    - ``macro_*`` = unweighted mean over classes where the per-class
      metric is defined (NULL cells are skipped, both engines'
      AVG semantics),
    - ``weighted_f1`` = support-weighted mean with undefined per-class
      F1 counted as 0 (sklearn ``zero_division=0`` convention — a
      class with true rows must drag the weighted score down),
    - ``kappa`` = (p_o − p_e) / (1 − p_e) with the marginal-product
      chance agreement p_e = Σ_c support_c·predicted_c / n²; NULL at
      the degenerate p_e = 1.

    All inputs to the divisions are exact integer sums off the
    bounded per-class grid, so the doubles are cross-engine stable at
    the published 6dp.
    """
    per_class = multiclass_metrics(df, label_col, pred_col)
    n = F.sum("support")
    po = F.sum("tp") / n
    pe = F.sum(
        F.col("support").cast("double") * F.col("predicted").cast("double")
    ) / (n.cast("double") * n.cast("double"))
    return per_class.agg(
        n.cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.round(po, 6).alias("accuracy"),
        F.round(F.avg("precision"), 6).alias("macro_precision"),
        F.round(F.avg("recall"), 6).alias("macro_recall"),
        F.round(F.avg("f1"), 6).alias("macro_f1"),
        F.round(
            F.sum(F.col("support") * F.coalesce(F.col("f1"), F.lit(0.0)))
            / n,
            6,
        ).alias("weighted_f1"),
        F.round(
            F.when(pe < 1.0, (po - pe) / (1.0 - pe)), 6
        ).alias("kappa"),
    )


def regression_metrics(
    df: DataFrame, pred_col: str, target_col: str
) -> DataFrame:
    """One-row regression scorecard: MAE, RMSE, MAPE, R² and the
    residual/target second moments they derive from.

    Single full pass, all accumulations exact DECIMAL (absolute
    residuals at scale 6, squared terms at (37,12) summed into
    (38,12), so every statistic is merge-order-independent); the only doubles are the
    final divisions/sqrt, rounded 6dp. MAPE averages |Δ|/|y| over
    rows with y ≠ 0 only (``n_mape`` reports how many qualified) —
    the per-row ratio is double (a decimal quotient's scale rules
    differ across engines) but its sum is tiny relative to n, stable
    at 6dp after division.

    R² = 1 − SS_res / SS_tot with SS_tot computed as
    Σy² − (Σy)²/n off the exact decimal sums; NULL when the target
    is constant (SS_tot = 0).

    Output: 1 row — (n, mae, rmse, mape, n_mape, r2).
    """
    # DECIMAL(18,6) inputs keep the squared terms inside BOTH engines'
    # exact-decimal envelopes: (18,6)x(18,6) -> (37,12), no silent
    # precision-loss rescale (Spark) and no >38-digit overflow (DuckDB)
    y = F.col(target_col).cast("decimal(18,6)")
    p = F.col(pred_col).cast("decimal(18,6)")
    base = df.where(
        F.col(pred_col).isNotNull() & F.col(target_col).isNotNull()
    ).select(
        y.alias("y"),
        (y - p).cast("decimal(18,6)").alias("d"),
    )
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.abs(F.col("d"))).alias("__sad"),
        F.sum(
            (F.col("d") * F.col("d")).cast("decimal(38,12)")
        ).alias("__ssd"),
        F.sum(F.col("y")).alias("__sy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,12)")).alias(
            "__syy"
        ),
        F.sum(
            F.when(
                F.col("y") != 0,
                F.abs(F.col("d").cast("double") / F.col("y").cast("double")),
            )
        ).alias("__sape"),
        F.sum(F.when(F.col("y") != 0, F.lit(1)).otherwise(F.lit(0))).alias(
            "n_mape"
        ),
    )
    nn = F.col("n").cast("double")
    ss_tot = F.col("__syy").cast("double") - (
        F.col("__sy").cast("double") * F.col("__sy").cast("double") / nn
    )
    return agg.select(
        "n",
        F.round(F.col("__sad").cast("double") / nn, 6).alias("mae"),
        F.round(F.sqrt(F.col("__ssd").cast("double") / nn), 6).alias(
            "rmse"
        ),
        F.round(
            F.when(
                F.col("n_mape") > 0, F.col("__sape") / F.col("n_mape")
            ),
            6,
        ).alias("mape"),
        "n_mape",
        F.round(
            F.when(
                ss_tot > 0,
                1.0 - F.col("__ssd").cast("double") / ss_tot,
            ),
            6,
        ).alias("r2"),
    )


def pinball_loss(
    df: DataFrame,
    pred_col: str,
    target_col: str,
    quantiles: "tuple[float, ...]" = (0.1, 0.5, 0.9),
) -> DataFrame:
    """Quantile (pinball) loss per requested quantile — the metric a
    quantile-forecast column is scored by:
    L_q = mean( q·(y−ŷ)⁺ + (1−q)·(ŷ−y)⁺ ).

    One full pass TOTAL for all quantiles: the residual projects
    once, then each quantile is a conditional DECIMAL aggregate over
    the same scan (q literals with ≤ 6dp keep the products exact
    decimals). Output unpivots to the tall gate-friendly shape.

    Output: (q, n, loss) — one row per quantile, loss 6dp.
    """
    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    for q in quantiles:
        if not 0.0 < q < 1.0:
            raise ValueError(f"quantile out of (0,1): {q}")
    y = F.col(target_col).cast("decimal(18,6)")
    p = F.col(pred_col).cast("decimal(18,6)")
    base = df.where(
        F.col(pred_col).isNotNull() & F.col(target_col).isNotNull()
    ).select((y - p).cast("decimal(18,6)").alias("d"))
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, q in enumerate(quantiles):
        ql = F.lit(q).cast("decimal(8,6)")
        term = F.when(
            F.col("d") >= 0, (ql * F.col("d")).cast("decimal(38,12)")
        ).otherwise(
            ((ql - 1) * F.col("d")).cast("decimal(38,12)")
        )
        aggs.append(F.sum(term).alias(f"__s{i}"))
    one = base.agg(*aggs)
    parts = [
        one.select(
            F.lit(float(q)).alias("q"),
            F.col("n"),
            F.round(
                F.col(f"__s{i}").cast("double") / F.col("n").cast("double"),
                6,
            ).alias("loss"),
        )
        for i, q in enumerate(quantiles)
    ]
    out = parts[0]
    for part in parts[1:]:
        out = out.unionAll(part)
    return out


def retrieval_metrics(
    run: DataFrame,
    qrels: DataFrame,
    query_col: str = "query",
    doc_col: str = "doc",
    score_col: str = "score",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """Per-query ranking-quality metrics for a retrieval run (a BM25 /
    ANN candidate table) against graded relevance judgments: P@k, R@k,
    reciprocal rank, AP@k and NDCG@k — the TREC readout that closes
    the loop on the text_bm25_* / ann_* operators.

    Semantics (mirrored exactly by the SQL oracle):
    - ranking is score DESC with doc ASC as the deterministic
      tie-break; only the top-k rows per query are scored,
    - ``precision_k`` divides by k even when fewer candidates exist
      (the TREC convention), ``recall_k``/``ap_k`` are NULL for
      queries with no judged-relevant docs, ``ndcg_k`` NULL when the
      ideal DCG is 0,
    - ``ap_k`` normalizes by min(n_rel, k), ``rr`` is 0 when no
      relevant doc makes the top-k,
    - graded relevance feeds DCG as 2^rel − 1; binary hit = rel > 0.

    Scale shape: every window partitions by query (rank assignment on
    the run, ideal-DCG ranks on qrels); the per-query state after the
    top-k filter is ≤ k rows. Joins are (query, doc) equi-joins.
    Queries are evaluated from the run side (a judged query with no
    candidates contributes no row — its absence is visible in
    :func:`retrieval_summary`'s n_queries).

    Output per query: (query, n_ranked, n_rel, hits, precision_k,
    recall_k, rr, ap_k, ndcg_k) — 6dp.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    r = run.where(
        F.col(query_col).isNotNull()
        & F.col(doc_col).isNotNull()
        & F.col(score_col).isNotNull()
    ).select(
        F.col(query_col).alias("query"),
        F.col(doc_col).alias("doc"),
        F.col(score_col).cast("double").alias("score"),
    )
    j = qrels.where(
        F.col(query_col).isNotNull()
        & F.col(doc_col).isNotNull()
        & (F.coalesce(F.col(rel_col), F.lit(0)) > 0)
    ).select(
        F.col(query_col).alias("query"),
        F.col(doc_col).alias("doc"),
        F.col(rel_col).cast("int").alias("rel"),
    )
    w_rank = Window.partitionBy("query").orderBy(
        F.desc("score"), F.asc("doc")
    )
    topk = (
        r.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= k)
        .join(j, ["query", "doc"], "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
        .withColumn("hit", (F.col("rel") > 0).cast("int"))
    )
    w_cum = (
        Window.partitionBy("query")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = topk.withColumn("crel", F.sum("hit").over(w_cum))
    per_q = cum.groupBy("query").agg(
        F.count(F.lit(1)).alias("n_ranked"),
        F.sum("hit").alias("hits"),
        F.max(F.when(F.col("hit") == 1, 1.0 / F.col("rank"))).alias(
            "__rr"
        ),
        F.sum(
            F.when(F.col("hit") == 1, F.col("crel") / F.col("rank"))
        ).alias("__apnum"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("rel")) - 1)
            / F.log2(F.col("rank") + 1)
        ).alias("__dcg"),
    )
    # ideal DCG: qrels ranked by grade DESC (doc ASC tie-break), top k
    w_ideal = Window.partitionBy("query").orderBy(
        F.desc("rel"), F.asc("doc")
    )
    ideal = (
        j.withColumn("irank", F.row_number().over(w_ideal))
        .groupBy("query")
        .agg(
            F.count(F.lit(1)).alias("n_rel"),
            F.sum(
                F.when(
                    F.col("irank") <= k,
                    (F.pow(F.lit(2.0), F.col("rel")) - 1)
                    / F.log2(F.col("irank") + 1),
                )
            ).alias("__idcg"),
        )
    )
    out = per_q.join(ideal, "query", "left").select(
        "query",
        "n_ranked",
        F.coalesce(F.col("n_rel"), F.lit(0)).alias("n_rel"),
        "hits",
        F.round(F.col("hits") / F.lit(k), 6).alias("precision_k"),
        F.round(
            F.when(F.col("n_rel") > 0, F.col("hits") / F.col("n_rel")), 6
        ).alias("recall_k"),
        F.round(F.coalesce(F.col("__rr"), F.lit(0.0)), 6).alias("rr"),
        F.round(
            F.when(
                F.col("n_rel") > 0,
                F.coalesce(F.col("__apnum"), F.lit(0.0))
                / F.least(F.col("n_rel"), F.lit(k)),
            ),
            6,
        ).alias("ap_k"),
        F.round(
            F.when(
                F.col("__idcg") > 0, F.col("__dcg") / F.col("__idcg")
            ),
            6,
        ).alias("ndcg_k"),
    )
    return out


def retrieval_summary(per_query: DataFrame) -> DataFrame:
    """1-row roll-up of :func:`retrieval_metrics`: means over queries
    (MAP, MRR, mean P@k / R@k / NDCG@k). NULL per-query cells (no
    judged-relevant docs) are skipped by AVG in both engines — the
    trec_eval convention of averaging over judged queries only.

    Output: (n_queries, mean_precision_k, mean_recall_k, mrr, map_k,
    mean_ndcg_k) — 6dp, aggregating the per-query table's published
    6dp values.
    """
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("precision_k"), 6).alias("mean_precision_k"),
        F.round(F.avg("recall_k"), 6).alias("mean_recall_k"),
        F.round(F.avg("rr"), 6).alias("mrr"),
        F.round(F.avg("ap_k"), 6).alias("map_k"),
        F.round(F.avg("ndcg_k"), 6).alias("mean_ndcg_k"),
    )


def isotonic_calibration_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    max_distinct: int = 100_000,
) -> DataFrame:
    """Isotonic (PAV) calibration of a score against a binary label:
    the monotone-nondecreasing step function closest (L2) to the
    empirical positive rates — the standard non-parametric calibrator
    that :func:`calibration_bins`/ECE diagnose the need for.

    Scale shape: the row-scale work is ONE groupBy(score) to the
    distinct-score grid; pool-adjacent-violators then runs DRIVER-SIDE
    over that grid under an explicit ``max_distinct`` gate (the
    BPE-finish / union-find convention for sequential finishes: raise
    past the gate and tell the caller to pre-quantize, e.g. round the
    score or bucket by calibration_bins edges). Pool comparisons use
    integer cross-multiplication (pos_a·n_b > pos_b·n_a) — EXACT, no
    float ordering anywhere; only the final published probability
    divides.

    Output: (score double, n long, pos long, p_cal 6dp double), one
    row per distinct score, p_cal non-decreasing in score. NULL
    scores/labels excluded. NOT SQL-replayable (data-dependent
    pooling loop) — verified by the PAV reimplementation pin in
    tests/test_units.py.
    """
    base = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).cast("double").alias("s"),
        F.col(label_col).cast("boolean").cast("int").alias("y"),
    )
    grid_df = base.groupBy("s").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    n_distinct = grid_df.count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"{n_distinct} distinct scores exceed the driver gate "
            f"({max_distinct}); pre-quantize the score (round, or bucket "
            "by calibration_bins edges) before isotonic calibration"
        )
    grid = sorted(
        ((r["s"], int(r["n"]), int(r["pos"])) for r in grid_df.collect()),
        key=lambda t: t[0],
    )
    # weighted PAV: each block is [row_count, pos_count, member_count]
    blocks: "list[list[int]]" = []
    members: "list[list[tuple[float, int, int]]]" = []
    for s, n, pos in grid:
        blocks.append([n, pos])
        members.append([(s, n, pos)])
        while len(blocks) >= 2 and (
            blocks[-2][1] * blocks[-1][0] > blocks[-1][1] * blocks[-2][0]
        ):
            n2, p2 = blocks.pop()
            blocks[-1][0] += n2
            blocks[-1][1] += p2
            members[-2].extend(members.pop())
    rows = []
    for (bn, bp), mem in zip(blocks, members):
        p_cal = round(bp / bn, 6)
        for s, n, pos in mem:
            rows.append((float(s), n, pos, p_cal))
    spark = df.sparkSession
    return spark.createDataFrame(
        sorted(rows), "score double, n long, pos long, p_cal double"
    )


def isotonic_apply(
    df: DataFrame,
    table: DataFrame,
    score_col: str,
    out_col: str = "p_cal",
) -> DataFrame:
    """Apply an :func:`isotonic_calibration_table` step function to a
    (possibly new) scored frame: each row gets the calibrated
    probability of the GREATEST table score <= its score (piecewise-
    constant-left, the standard isotonic extension); scores below the
    table minimum clamp to the first step.

    The table is O(distinct training scores) — broadcast; the mapping
    is a broadcast range join Catalyst plans as BroadcastNestedLoop
    ONLY on the tiny side, with the big side streaming (same shape as
    the binned range join family).
    """
    from pyspark.sql import Window

    w = Window.orderBy("score")
    steps = table.select(
        F.col("score").alias("__lo"),
        F.lead("score").over(w).alias("__hi"),
        F.col("p_cal").alias(out_col),
        F.row_number().over(w).alias("__rn"),
    )
    s = F.col(score_col).cast("double")
    cond = (
        (s >= F.col("__lo")) | (F.col("__rn") == 1)
    ) & (F.col("__hi").isNull() | (s < F.col("__hi")))
    joined = df.join(F.broadcast(steps), cond, "left")
    return joined.drop("__lo", "__hi", "__rn")


# --------------------------------------------------------------------------
# Text-generation eval: BLEU / ROUGE-N over (candidate, reference) pairs.
# Pure n-gram counting — one nested higher-order-function projection
# extracts every order's n-grams in a single scan per side, then the
# clipped overlap is one (pair, n, gram) equi-join. All counts are
# integers, so every statistic is merge-order-independent and the DuckDB
# oracle replays the tokenizer (regex split) and the gram slicing
# bit-for-bit. No Python UDFs anywhere.
# --------------------------------------------------------------------------

_GRAM_SEP = "\x01"


def _tokens(col: "F.Column"):
    """Whitespace tokens of the casefolded, trimmed text; NULL text
    yields an empty token list (contributes zero counts, like an empty
    hypothesis, rather than nulling out the pair)."""
    raw = F.split(F.lower(F.trim(F.coalesce(col, F.lit("")))), r"\s+")
    return F.filter(raw, lambda x: x != F.lit(""))


def _all_ngrams(tok_col: "F.Column", max_n: int):
    """array<struct<n int, gram string>> of EVERY order 1..max_n in one
    expression: the outer transform ranges over n, the inner one over
    start positions; flatten merges the per-order lists. Runs entirely
    inside codegen — one projection, no repeated scans per order."""
    sz = F.size(tok_col)

    def per_n(n):
        return F.when(
            sz >= n,
            F.transform(
                F.sequence(F.lit(1), sz - n + 1),
                lambda i: F.struct(
                    n.alias("n"),
                    F.concat_ws(
                        _GRAM_SEP, F.slice(tok_col, i, n)
                    ).alias("gram"),
                ),
            ),
        ).otherwise(
            F.array().cast("array<struct<n:int,gram:string>>")
        )

    return F.flatten(F.transform(F.sequence(F.lit(1), F.lit(max_n)), per_n))


def _pair_gram_counts(
    df: DataFrame, id_col: str, text_col: str, max_n: int
) -> DataFrame:
    # r17: the nested-HOF `_all_ngrams` formulation (transform over
    # orders × transform over positions, slice + concat_ws per gram)
    # is a CodegenFallback expression — it evaluated INTERPRETED and
    # one side's gram extraction alone measured 3.6 s at sf0.1. This
    # is the `_pair_chargram_counts` formulation on TOKENS instead:
    # posexplode the token stream once, take max_n−1 window LEADs per
    # token (per-pair partitions, never data-scale), and form every
    # order's gram as a codegen F.concat; a gram running off the end
    # concats a NULL lead and is filtered. Gram strings are
    # byte-identical (concat_ws(sep, slice(toks, i, n)) ==
    # t_i ⊕ sep ⊕ … ⊕ t_{i+n−1}; tokens are non-null non-empty by
    # _tokens), so counts — and the SQL oracle — are unchanged.
    toks = df.select(
        F.col(id_col).alias("pid"),
        _tokens(F.col(text_col)).alias("__toks"),
    )
    pos = toks.select(
        "pid", F.posexplode("__toks").alias("pos", "t")
    )
    w = Window.partitionBy("pid").orderBy("pos")
    led = pos.select(
        "pid",
        "t",
        *[
            F.lead("t", k).over(w).alias(f"__l{k}")
            for k in range(1, max_n)
        ],
    )
    gram_structs = []
    for n in range(1, max_n + 1):
        parts = [F.col("t")]
        for k in range(1, n):
            parts += [F.lit(_GRAM_SEP), F.col(f"__l{k}")]
        gram_structs.append(
            F.struct(
                F.lit(n).alias("n"), F.concat(*parts).alias("gram")
            )
        )
    ex = led.select(
        "pid", F.explode(F.array(*gram_structs)).alias("g")
    ).where(F.col("g.gram").isNotNull())
    return ex.groupBy(
        "pid", F.col("g.n").alias("n"), F.col("g.gram").alias("gram")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def bleu_ngram_precisions(
    df: DataFrame,
    id_col: str,
    cand_col: str,
    ref_col: str,
    max_n: int = 4,
) -> DataFrame:
    """Corpus-level modified n-gram precisions (Papineni et al. 2002):
    per order n, Σ_pairs clipped(n) / Σ_pairs cand_total(n), where
    clipped counts each candidate n-gram at most min(cand, ref) times.

    One gram-extraction projection + groupBy per side, one
    (pair, n, gram) inner equi-join for the clip, then everything
    collapses onto the max_n-row grid. Integer counts end-to-end.

    Output: (n, clipped, total, p 6dp) — one row per order 1..max_n
    (orders with zero candidate grams report total 0 and NULL p).
    """
    if max_n < 1 or max_n > 8:
        raise ValueError("max_n must be in 1..8")
    cand = _pair_gram_counts(df, id_col, cand_col, max_n)
    ref = _pair_gram_counts(df, id_col, ref_col, max_n).select(
        F.col("pid"), "n", "gram", F.col("cnt").alias("rcnt")
    )
    clip = (
        cand.join(ref, ["pid", "n", "gram"], "left")
        .groupBy("n")
        .agg(
            F.sum(F.least("cnt", F.coalesce("rcnt", F.lit(0)))).alias(
                "clipped"
            ),
            F.sum("cnt").alias("total"),
        )
    )
    grid = df.sparkSession.range(1, max_n + 1).select(
        F.col("id").cast("int").alias("n")
    )
    return (
        grid.join(F.broadcast(clip), "n", "left")
        .select(
            "n",
            F.coalesce("clipped", F.lit(0)).cast("long").alias("clipped"),
            F.coalesce("total", F.lit(0)).cast("long").alias("total"),
            F.round(
                F.when(
                    F.coalesce("total", F.lit(0)) > 0,
                    F.coalesce("clipped", F.lit(0)).cast("double")
                    / F.col("total").cast("double"),
                ),
                6,
            ).alias("p"),
        )
    )


def bleu_corpus(
    df: DataFrame,
    id_col: str,
    cand_col: str,
    ref_col: str,
    max_n: int = 4,
) -> DataFrame:
    """Corpus BLEU: BP · exp(mean_n ln p_n) over the UNROUNDED modified
    precisions, BP = min(1, exp(1 − ref_len/cand_len)) from the summed
    corpus lengths. Any zero precision (or an empty candidate corpus)
    gives BLEU 0, per the standard definition — no smoothing.

    Scale shape: the precision grid is max_n rows and the lengths are
    one 1-row aggregate; the only row-scale work is the two gram
    groupBys + one equi-join inherited from
    :func:`bleu_ngram_precisions`.

    Output: 1 row — (n_pairs, cand_len, ref_len, bp 6dp, bleu 6dp).
    """
    cand = _pair_gram_counts(df, id_col, cand_col, max_n)
    ref = _pair_gram_counts(df, id_col, ref_col, max_n).select(
        F.col("pid"), "n", "gram", F.col("cnt").alias("rcnt")
    )
    per_n = (
        cand.join(ref, ["pid", "n", "gram"], "left")
        .groupBy("n")
        .agg(
            F.sum(F.least("cnt", F.coalesce("rcnt", F.lit(0)))).alias(
                "clipped"
            ),
            F.sum("cnt").alias("total"),
        )
    )
    # ln-precision sum over the bounded grid; NULL if any order has
    # zero clipped overlap or zero candidate grams (BLEU := 0 then)
    lp = per_n.agg(
        F.count(F.lit(1)).alias("orders_present"),
        F.sum(
            F.when(
                (F.col("clipped") > 0) & (F.col("total") > 0),
                F.log(
                    F.col("clipped").cast("double")
                    / F.col("total").cast("double")
                ),
            )
        ).alias("lp_sum"),
        F.sum(
            F.when(
                (F.col("clipped") > 0) & (F.col("total") > 0), 1
            ).otherwise(0)
        ).alias("orders_pos"),
    )
    lens = df.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(
            F.sum(F.size(_tokens(F.col(cand_col)))), F.lit(0)
        ).alias("cand_len"),
        F.coalesce(
            F.sum(F.size(_tokens(F.col(ref_col)))), F.lit(0)
        ).alias("ref_len"),
    )
    j = lens.join(F.broadcast(lp))
    bp = F.when(F.col("cand_len") >= F.col("ref_len"), F.lit(1.0)).otherwise(
        F.exp(
            F.lit(1.0)
            - F.col("ref_len").cast("double")
            / F.col("cand_len").cast("double")
        )
    )
    bleu = F.when(
        (F.col("orders_pos") == max_n) & (F.col("cand_len") > 0),
        bp * F.exp(F.col("lp_sum") / F.lit(float(max_n))),
    ).otherwise(F.lit(0.0))
    return j.select(
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("cand_len").cast("long").alias("cand_len"),
        F.col("ref_len").cast("long").alias("ref_len"),
        F.round(
            F.when(F.col("cand_len") > 0, bp).otherwise(F.lit(0.0)), 6
        ).alias("bp"),
        F.round(bleu, 6).alias("bleu"),
    )


def rouge_n(
    df: DataFrame,
    id_col: str,
    cand_col: str,
    ref_col: str,
    n: int = 2,
) -> DataFrame:
    """Per-pair ROUGE-N: clipped n-gram overlap scored as recall
    against the reference (the ROUGE headline number), plus precision
    and F1. Same single-join shape as BLEU but keyed per pair.

    Output: one row per input pair —
    (id_col, overlap, cand_total, ref_total, precision 6dp,
    recall 6dp, f1 6dp); pairs where a side has no n-grams report NULL
    for the affected ratios.
    """
    if n < 1 or n > 8:
        raise ValueError("n must be in 1..8")
    cand = _pair_gram_counts(df, id_col, cand_col, n).where(F.col("n") == n)
    ref = (
        _pair_gram_counts(df, id_col, ref_col, n)
        .where(F.col("n") == n)
        .select(F.col("pid"), "gram", F.col("cnt").alias("rcnt"))
    )
    per_pair = (
        cand.join(ref, ["pid", "gram"], "full_outer")
        .groupBy("pid")
        .agg(
            F.sum(
                F.least(
                    F.coalesce("cnt", F.lit(0)),
                    F.coalesce("rcnt", F.lit(0)),
                )
            ).alias("overlap"),
            F.sum(F.coalesce("cnt", F.lit(0))).alias("cand_total"),
            F.sum(F.coalesce("rcnt", F.lit(0))).alias("ref_total"),
        )
    )
    # keep pairs that produced no grams on either side (short texts)
    ids = df.select(F.col(id_col).alias("pid")).distinct()
    base = ids.join(per_pair, "pid", "left").select(
        "pid",
        F.coalesce("overlap", F.lit(0)).cast("long").alias("overlap"),
        F.coalesce("cand_total", F.lit(0)).cast("long").alias("cand_total"),
        F.coalesce("ref_total", F.lit(0)).cast("long").alias("ref_total"),
    )
    prec = F.when(
        F.col("cand_total") > 0,
        F.col("overlap").cast("double") / F.col("cand_total").cast("double"),
    )
    rec = F.when(
        F.col("ref_total") > 0,
        F.col("overlap").cast("double") / F.col("ref_total").cast("double"),
    )
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & ((prec + rec) > 0),
        2.0 * prec * rec / (prec + rec),
    ).otherwise(
        F.when(prec.isNotNull() & rec.isNotNull(), F.lit(0.0))
    )
    return base.select(
        F.col("pid").alias(id_col),
        "overlap",
        "cand_total",
        "ref_total",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def rouge_summary(per_pair: DataFrame) -> DataFrame:
    """1-row corpus roll-up of :func:`rouge_n`: means of the published
    6dp per-pair ratios (pairs with NULL ratios excluded per metric,
    matching how ROUGE reports over scoreable pairs).

    Output: (n_pairs, mean_precision 6dp, mean_recall 6dp,
    mean_f1 6dp). The 6dp inputs are summed as exact DECIMAL before
    the one division, so the means are merge-order-independent at any
    pair count (avg over raw doubles is not).
    """

    def _mean(c: str):
        cnt = F.count(c)
        return F.round(
            F.when(
                cnt > 0,
                F.sum(F.col(c).cast("decimal(18,6)")).cast("double") / cnt,
            ),
            6,
        ).alias(f"mean_{c}")

    return per_pair.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        _mean("precision"),
        _mean("recall"),
        _mean("f1"),
    )


def rouge_l(
    df: DataFrame,
    id_col: str,
    cand_col: str,
    ref_col: str,
) -> DataFrame:
    """Per-pair ROUGE-L: longest-common-subsequence overlap between
    candidate and reference token sequences, scored as
    precision (LCS/|cand|), recall (LCS/|ref|) and F1.

    LCS is an inherently SEQUENTIAL O(m·n) dynamic program per pair —
    not expressible as joins/aggregations — so this is one of the
    repo's few justified Python paths: an Arrow-batched pandas UDF
    (never row-at-a-time F.udf) computing the two-row DP per pair.
    Each pair's work is independent, so the op scales embarrassingly
    with partitions; cost is O(m·n) per pair, fine for document-length
    texts (cap or truncate upstream for book-length inputs). The same
    whitespace/casefold tokenizer as the n-gram family.

    No SQL oracle can replay the DP; correctness is pinned against a
    pure-Python textbook LCS in the unit suite (the isotonic-PAV
    verification pattern).

    Output: (id_col, lcs, cand_len, ref_len, precision 6dp,
    recall 6dp, f1 6dp).
    """

    @F.pandas_udf("long")
    def _lcs(cand: pd.Series, ref: pd.Series) -> pd.Series:
        def one(c, r):
            a = (c or "").lower().split()
            b = (r or "").lower().split()
            if not a or not b:
                return 0
            # two-row DP, short side inner for cache friendliness
            if len(b) > len(a):
                a, b = b, a
            prev = [0] * (len(b) + 1)
            for x in a:
                cur = [0]
                for j, y in enumerate(b, 1):
                    cur.append(
                        prev[j - 1] + 1 if x == y
                        else max(prev[j], cur[j - 1])
                    )
                prev = cur
            return prev[-1]

        return pd.Series(
            [one(c, r) for c, r in zip(cand, ref)], dtype="int64"
        )

    base = df.select(
        F.col(id_col),
        _lcs(F.col(cand_col), F.col(ref_col)).alias("lcs"),
        F.size(_tokens(F.col(cand_col))).cast("long").alias("cand_len"),
        F.size(_tokens(F.col(ref_col))).cast("long").alias("ref_len"),
    )
    prec = F.when(
        F.col("cand_len") > 0,
        F.col("lcs").cast("double") / F.col("cand_len").cast("double"),
    )
    rec = F.when(
        F.col("ref_len") > 0,
        F.col("lcs").cast("double") / F.col("ref_len").cast("double"),
    )
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & ((prec + rec) > 0),
        2.0 * prec * rec / (prec + rec),
    ).otherwise(
        F.when(prec.isNotNull() & rec.isNotNull(), F.lit(0.0))
    )
    return base.select(
        id_col,
        "lcs",
        "cand_len",
        "ref_len",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def _pair_chargram_counts(
    df: DataFrame, id_col: str, text_col: str, max_n: int
) -> DataFrame:
    """(pid, n, gram, cnt) over CHARACTER n-grams 1..max_n of the
    casefolded text with ALL whitespace removed (the chrF convention).

    Formulation matters here: the nested-HOF slice (the BLEU token
    path) builds millions of interpreted struct rows and measured
    ~13 s/side at sf0.1. Instead: explode the char stream ONCE with
    positions, take max_n−1 window LEADs per char (one per-pair
    window pass — partitions are pair-sized, never data-scale), and
    form every order's gram as a plain codegen concat; a gram running
    off the end concats a NULL lead and is filtered. Gram strings are
    byte-identical to the substring formulation, so the SQL oracle is
    unchanged. ~6x faster at sf0.1."""
    cleaned = F.regexp_replace(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
        r"\s+",
        "",
    )
    chars = df.select(
        F.col(id_col).alias("pid"), cleaned.alias("__c")
    ).select(
        "pid", F.posexplode(F.split("__c", "")).alias("pos", "ch")
    ).where(F.col("ch") != "")
    w = Window.partitionBy("pid").orderBy("pos")
    led = chars.select(
        "pid",
        "ch",
        *[F.lead("ch", k).over(w).alias(f"__l{k}") for k in range(1, max_n)],
    )
    gram_structs = []
    for n in range(1, max_n + 1):
        parts = [F.col("ch")] + [F.col(f"__l{k}") for k in range(1, n)]
        gram_structs.append(
            F.struct(
                F.lit(n).alias("n"), F.concat(*parts).alias("gram")
            )
        )
    ex = led.select(
        "pid", F.explode(F.array(*gram_structs)).alias("g")
    ).where(F.col("g.gram").isNotNull())
    return ex.groupBy(
        "pid", F.col("g.n").alias("n"), F.col("g.gram").alias("gram")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def chrf_score(
    df: DataFrame,
    id_col: str,
    cand_col: str,
    ref_col: str,
    max_n: int = 6,
    beta: float = 2.0,
) -> DataFrame:
    """Corpus chrF (Popović 2015): the character-n-gram F_β companion
    to BLEU — robust to tokenization and morphology because it never
    tokenizes. Character 1..max_n-grams of the whitespace-stripped
    casefolded texts, clipped overlap per (pair, order, gram), then
    CORPUS-level precision/recall per order (Σ clipped / Σ totals),
    macro-averaged over the orders whose denominator is non-zero, and
    combined as F_β with β = 2 (recall-weighted, the chrF2 standard).
    This is the corpus-aggregated variant (sentence-level chrF
    averages per-pair scores; document the difference when comparing
    to sacrebleu numbers).

    Same scale shape as BLEU: one gram projection + groupBy per side,
    one (pid, n, gram) equi-join, then the max_n-row grid. Integer
    counts end-to-end; the DuckDB oracle replays the cleaning regex
    and the substring slicing verbatim.

    Output: 1 row — (n_pairs, avg_precision 6dp, avg_recall 6dp,
    chrf 6dp); NULL chrf when no order has grams on either side.
    """
    if max_n < 1 or max_n > 10:
        raise ValueError("max_n must be in 1..10")
    cand = _pair_chargram_counts(df, id_col, cand_col, max_n)
    ref = _pair_chargram_counts(df, id_col, ref_col, max_n).select(
        F.col("pid"), "n", "gram", F.col("cnt").alias("rcnt")
    )
    # totals never need the gram join (side-local sums onto the order
    # grid); only the clip does, and there an INNER join suffices —
    # min(c, r) is 0 wherever a side is absent. A full-outer join here
    # was the sf0.1 bench's single heaviest shuffle.
    c_tot = cand.groupBy("n").agg(F.sum("cnt").alias("c_tot"))
    r_tot = ref.groupBy("n").agg(F.sum("rcnt").alias("r_tot"))
    clip = (
        cand.join(ref, ["pid", "n", "gram"])
        .groupBy("n")
        .agg(F.sum(F.least("cnt", "rcnt")).alias("clipped"))
    )
    per_n = (
        c_tot.join(r_tot, "n", "full_outer")
        .join(clip, "n", "full_outer")
        .select(
            "n",
            F.coalesce("clipped", F.lit(0)).alias("clipped"),
            F.coalesce("c_tot", F.lit(0)).alias("c_tot"),
            F.coalesce("r_tot", F.lit(0)).alias("r_tot"),
        )
    )
    p_n = F.when(
        F.col("c_tot") > 0,
        F.col("clipped").cast("double") / F.col("c_tot").cast("double"),
    )
    r_n = F.when(
        F.col("r_tot") > 0,
        F.col("clipped").cast("double") / F.col("r_tot").cast("double"),
    )
    # macro-average via 12dp-DECIMAL sums over the bounded order grid
    # (plain AVG of doubles is merge-order-dependent in the last ulp)
    def _avg(term, alias):
        cnt = F.count(term)
        return F.when(
            cnt > 0,
            F.sum(F.round(term, 12).cast("decimal(28,12)")).cast("double")
            / cnt,
        ).alias(alias)

    agg = per_n.agg(_avg(p_n, "ap"), _avg(r_n, "ar"))
    lens = df.agg(F.count(F.lit(1)).alias("n_pairs"))
    b2 = float(beta) * float(beta)
    chrf = F.when(
        F.col("ap").isNotNull()
        & F.col("ar").isNotNull()
        & ((b2 * F.col("ap") + F.col("ar")) > 0),
        (1.0 + b2)
        * F.col("ap")
        * F.col("ar")
        / (b2 * F.col("ap") + F.col("ar")),
    ).otherwise(
        F.when(F.col("ap").isNotNull() & F.col("ar").isNotNull(), F.lit(0.0))
    )
    return lens.join(F.broadcast(agg)).select(
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.round("ap", 6).alias("avg_precision"),
        F.round("ar", 6).alias("avg_recall"),
        F.round(chrf, 6).alias("chrf"),
    )


def qini_table(
    df: DataFrame,
    score_col: str,
    treatment_col: str,
    outcome_col: str,
    id_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Uplift (Qini) table for a treatment-effect score: bucket by
    DESCENDING uplift score with exact NTILE semantics, then per
    bucket the treatment/control conversion rates, their difference
    (the observed uplift), and the cumulative Qini curve point
    ``qini(k) = Yt(k) − Yc(k)·Nt(k)/Nc(k)`` (incremental conversions
    the model's top-k targeting buys vs scaling control outcomes to
    the treated volume). The readout a data-curation A/B (new filter,
    new dedup policy) needs when a single average treatment effect
    hides WHO is helped.

    Bucketing rides the scale-safe exact NTILE on (−score, id) — the
    lift_table discipline; everything after the bucket groupBy runs on
    the n_buckets-row grid, the cumulative window included. Integer
    counts end-to-end make the oracle replay exact (rates/qini are
    divisions of integer cumulatives).

    Output per bucket: (bucket, n_treat, n_ctrl, conv_treat,
    conv_ctrl, rate_treat 6dp, rate_ctrl 6dp, uplift 6dp, qini 6dp) —
    rate/uplift NULL where a side is empty, qini NULL until control
    appears in the cumulative prefix.
    """
    from metadata_etl_framework_spark.functions.aggregations import (
        ntile_assign,
    )

    base = df.where(
        F.col(score_col).isNotNull()
        & F.col(treatment_col).isNotNull()
        & F.col(outcome_col).isNotNull()
    ).select(
        (-F.col(score_col).cast("double")).alias("__neg"),
        F.col(id_col).alias("__id"),
        F.col(treatment_col).cast("boolean").cast("int").alias("t"),
        F.col(outcome_col).cast("boolean").cast("int").alias("y"),
    )
    bucketed = ntile_assign(
        base, ["__neg", "__id"], n_buckets, out="bucket"
    )
    grid = bucketed.groupBy("bucket").agg(
        F.sum("t").alias("n_treat"),
        F.sum(1 - F.col("t")).alias("n_ctrl"),
        F.sum(F.col("t") * F.col("y")).alias("conv_treat"),
        F.sum((1 - F.col("t")) * F.col("y")).alias("conv_ctrl"),
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grid.select(
        "*",
        F.sum("n_treat").over(w).alias("cnt"),
        F.sum("n_ctrl").over(w).alias("cnc"),
        F.sum("conv_treat").over(w).alias("cyt"),
        F.sum("conv_ctrl").over(w).alias("cyc"),
    )
    rt = F.when(
        F.col("n_treat") > 0,
        F.col("conv_treat").cast("double") / F.col("n_treat"),
    )
    rc = F.when(
        F.col("n_ctrl") > 0,
        F.col("conv_ctrl").cast("double") / F.col("n_ctrl"),
    )
    qini = F.when(
        F.col("cnc") > 0,
        F.col("cyt").cast("double")
        - F.col("cyc").cast("double")
        * F.col("cnt").cast("double")
        / F.col("cnc").cast("double"),
    )
    return cum.select(
        "bucket",
        F.col("n_treat").cast("long").alias("n_treat"),
        F.col("n_ctrl").cast("long").alias("n_ctrl"),
        F.col("conv_treat").cast("long").alias("conv_treat"),
        F.col("conv_ctrl").cast("long").alias("conv_ctrl"),
        F.round(rt, 6).alias("rate_treat"),
        F.round(rc, 6).alias("rate_ctrl"),
        F.round(
            F.when(rt.isNotNull() & rc.isNotNull(), rt - rc), 6
        ).alias("uplift"),
        F.round(qini, 6).alias("qini"),
    )


def qini_coefficient(table: DataFrame) -> DataFrame:
    """1-row Qini summary from :func:`qini_table`'s bounded grid:
    ``qini_auc`` — mean of the per-bucket qini points (unit-width
    discrete area), ``qini_random`` — half the final point (the
    diagonal's area under the same discretization), and their
    difference ``qini_coefficient`` (> 0 = the score targets uplift
    better than random). Conventions differ across libraries; this is
    the discrete unit-width form, documented so numbers are
    comparable run-over-run. Published 6dp values aggregate over the
    <= n_buckets grid.
    """
    k = F.count("qini")
    # max-struct, not max_by: NULL-value semantics are explicit (the
    # final bucket's qini is taken even if NULL)
    last = F.max(F.struct(F.col("bucket"), F.col("qini")))["qini"]
    auc = F.when(
        k > 0,
        F.sum(F.col("qini").cast("decimal(28,12)")).cast("double") / k,
    )
    return table.agg(
        k.cast("long").alias("n_buckets"),
        F.round(auc, 6).alias("qini_auc"),
        F.round(last / 2.0, 6).alias("qini_random"),
        F.round(auc - last / 2.0, 6).alias("qini_coefficient"),
    )


def covariate_balance(
    df: DataFrame,
    treatment_col: str,
    numeric_cols: "list[str]",
) -> DataFrame:
    """Standardized mean differences between treatment and control for
    a list of numeric covariates — the pre-test every uplift/AB
    readout (qini_table, ab_test) should be gated on: |SMD| > 0.1 is
    the conventional imbalance flag, and an imbalanced assignment
    makes the downstream effect estimates confounded, not just noisy.

    SMD(col) = (mean_t − mean_c) / sqrt((var_t + var_c)/2). Values
    round to 6 dp and carry as exact DECIMAL micro-units (the
    welch_t_test discipline, round-12 ulp sweep): the centered
    variance numerator n·Σx² − (Σx)² stays in exact decimal-integer
    arithmetic — a covariate with a large offset (mean² ≫ var) is
    exactly the regime where a DECIMAL→double cast ulp amplified
    ~n-fold corrupts a cancelled variance — and only integer→double
    casts feed the ratios. ONE stacked-columns scan (the
    cramers_v_matrix shape) builds every covariate's per-arm sums at
    once; everything after is the bounded (cols × 2) grid. Rows with a
    NULL treatment are excluded; NULL covariate values are excluded
    per column.

    Output: (col, n_treat, n_ctrl, mean_treat 6dp, mean_ctrl 6dp,
    smd 6dp, imbalanced bool — |SMD| > 0.1); smd NULL when an arm is
    empty/constant-pooled.
    """
    if not numeric_cols:
        raise ValueError("numeric_cols must be non-empty")
    t = F.col(treatment_col).cast("boolean").cast("int")
    stacked = (
        df.where(F.col(treatment_col).isNotNull())
        .select(
            t.alias("t"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("col"),
                            F.col(c).cast("double").alias("x"),
                        )
                        for c in numeric_cols
                    ]
                )
            ).alias("s"),
        )
        .select("t", "s.col", "s.x")
        .where(F.col("x").isNotNull())
    )
    # multiply-first micro-units (the welch_t_test convention — both
    # engines round the SAME double product, never two different
    # decimal positions); (19,0)² is exactly the 38-digit cap
    xi = F.round(F.col("x") * F.lit(1_000_000.0)).cast("decimal(19,0)")
    arms = stacked.groupBy("col", "t").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi).alias("sx_i"),
        F.sum(xi * xi).alias("sxx_i"),
    )
    sx_i = F.col("sx_i").cast("decimal(38,0)")
    sxx_i = F.col("sxx_i").cast("decimal(38,0)")
    varnum = F.col("n").cast("decimal(38,0)") * sxx_i - sx_i * sx_i
    nd = F.col("n").cast("double")
    mean = sx_i.cast("double") / F.col("n") / F.lit(1e6)
    var = F.when(
        F.col("n") > 1,
        varnum.cast("double") / (nd * (nd - F.lit(1.0))) / F.lit(1e12),
    )
    per_arm = arms.select(
        "col", "t", "n", mean.alias("m"), var.alias("v")
    )
    tr = per_arm.where(F.col("t") == 1).select(
        "col",
        F.col("n").alias("n_treat"),
        F.col("m").alias("mt"),
        F.col("v").alias("vt"),
    )
    ct = per_arm.where(F.col("t") == 0).select(
        "col",
        F.col("n").alias("n_ctrl"),
        F.col("m").alias("mc"),
        F.col("v").alias("vc"),
    )
    pooled = F.sqrt((F.col("vt") + F.col("vc")) / 2.0)
    smd = F.when(
        F.col("vt").isNotNull() & F.col("vc").isNotNull() & (pooled > 0),
        (F.col("mt") - F.col("mc")) / pooled,
    )
    return tr.join(ct, "col", "full_outer").select(
        "col",
        F.coalesce("n_treat", F.lit(0)).cast("long").alias("n_treat"),
        F.coalesce("n_ctrl", F.lit(0)).cast("long").alias("n_ctrl"),
        F.round("mt", 6).alias("mean_treat"),
        F.round("mc", 6).alias("mean_ctrl"),
        F.round(smd, 6).alias("smd"),
        F.when(smd.isNotNull(), F.abs(F.round(smd, 6)) > 0.1).alias(
            "imbalanced"
        ),
    )


def ipw_ate(
    df: DataFrame,
    treatment_col: str,
    outcome_col: str,
    propensity_col: str,
    clip: float = 0.01,
) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect — the
    estimator that corrects a non-randomized comparison using a
    propensity score: ATE = E[t·y/p] − E[(1−t)·y/(1−p)], with the
    Hájek (self-normalizing) form — weighted means, not raw moment
    sums — so the estimate stays inside the outcome range even when
    weights are skewed. Propensities clip to [clip, 1−clip] (the
    standard positivity guard; extreme scores otherwise let single
    rows dominate).

    One projection + one 1-row aggregate; weight sums accumulate as
    DECIMAL(30,12) over 12dp-rounded terms, so the estimate is
    merge-order-independent and the SQL oracle replays it exactly.
    Rows with a NULL treatment/outcome/propensity are excluded.

    Output: 1 row — (n_treat, n_ctrl, mean_treat_w 6dp,
    mean_ctrl_w 6dp, ate 6dp); NULL ate when either arm is empty.
    """
    if not (0 <= clip < 0.5):
        raise ValueError("clip must be in [0, 0.5)")
    t = F.col(treatment_col).cast("boolean").cast("int")
    y = F.col(outcome_col).cast("double")
    p = F.least(
        F.greatest(F.col(propensity_col).cast("double"), F.lit(float(clip))),
        F.lit(1.0 - float(clip)),
    )
    base = df.where(
        F.col(treatment_col).isNotNull()
        & F.col(outcome_col).isNotNull()
        & F.col(propensity_col).isNotNull()
    ).select(t.alias("t"), y.alias("y"), p.alias("p"))
    wt = F.col("t") / F.col("p")
    wc = (1 - F.col("t")) / (1.0 - F.col("p"))

    def dec(c):
        return F.round(c, 12).cast("decimal(30,12)")

    agg = base.agg(
        F.sum("t").cast("long").alias("n_treat"),
        F.sum(1 - F.col("t")).cast("long").alias("n_ctrl"),
        F.sum(dec(wt)).cast("double").alias("swt"),
        F.sum(dec(wt * F.col("y"))).cast("double").alias("swty"),
        F.sum(dec(wc)).cast("double").alias("swc"),
        F.sum(dec(wc * F.col("y"))).cast("double").alias("swcy"),
    )
    mt = F.when(F.col("swt") > 0, F.col("swty") / F.col("swt"))
    mc = F.when(F.col("swc") > 0, F.col("swcy") / F.col("swc"))
    return agg.select(
        "n_treat",
        "n_ctrl",
        F.round(mt, 6).alias("mean_treat_w"),
        F.round(mc, 6).alias("mean_ctrl_w"),
        F.round(
            F.when(mt.isNotNull() & mc.isNotNull(), mt - mc), 6
        ).alias("ate"),
    )


def conformal_coverage(
    df: DataFrame,
    y_col: str,
    pred_col: str,
    key_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Split-conformal prediction-interval audit (Vovk; Angelopoulos &
    Bates' tutorial formulation): calibrate the absolute-residual
    quantile on one half, check empirical coverage of
    pred ± q̂ on the other — the distribution-free "are my model's
    error bars honest" gate a scoring pipeline runs before shipping
    intervals.

    The calibration/test split is hash-deterministic
    (ops/sketch.py::hash32(key) % 2 — engine-replayable, no
    randomness); q̂ is the ⌈(n+1)(1−α)⌉-th smallest calibration score
    (the finite-sample-valid rank, clamped to n), selected as an exact
    order statistic with (score, key) tie-break and rounded to 6 dp;
    coverage on the test half is an exact integer ratio. Guarantee:
    E[coverage] ≥ 1−α when calibration and test are exchangeable.

    Plan: one scan each half — a rank selection on the calibration
    frame (range-sortable; the window is keyless but operates on the
    score frame, selected at a single rank) and one aggregate on the
    test frame.

    Output: 1 row — (alpha, n_calib long, n_test long, q_hat 6 dp,
    coverage 6 dp, avg_width 6 dp = 2·q̂).
    """
    from pyspark.sql.types import NumericType

    from .sketch import hash32

    kt = df.schema[key_col].dataType
    if not isinstance(kt, NumericType):
        # fail-loud precondition (round-12 advice, the bootstrap-key
        # class): hash32 casts the key to long — a non-numeric key
        # nulls the cast, _half goes null, and EVERY row would land in
        # neither split, returning a passed-but-empty audit
        raise TypeError(
            f"key_col {key_col!r} must be a numeric column for the "
            f"deterministic split hash (got {kt.simpleString()}); "
            f"hash a surrogate first, e.g. F.xxhash64(key)"
        )
    base = df.where(
        F.col(y_col).isNotNull()
        & F.col(pred_col).isNotNull()
        & F.col(key_col).isNotNull()
    ).select(
        F.col(key_col).cast("long").alias("_k"),
        F.abs(
            F.col(y_col).cast("double") - F.col(pred_col).cast("double")
        ).alias("_s"),
        (hash32(F.col(key_col)) % 2).alias("_half"),
    )
    calib = base.where(F.col("_half") == 0)
    test = base.where(F.col("_half") == 1)
    w = Window.orderBy("_s", "_k")
    ranked = calib.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy())
    )
    r = F.least(
        F.col("_n"),
        F.ceil(
            F.lit(float(1.0 - alpha))
            * (F.col("_n") + F.lit(1)).cast("double")
        ),
    )
    qhat = ranked.agg(
        F.count(F.lit(1)).alias("n_calib"),
        F.round(
            F.min(F.when(F.col("_rn") == r, F.col("_s"))), 6
        ).alias("q_hat"),
    )
    cov = test.crossJoin(F.broadcast(qhat)).agg(
        F.first("n_calib").alias("n_calib"),
        F.first("q_hat").alias("q_hat"),
        F.count(F.lit(1)).alias("n_test"),
        F.round(
            F.sum((F.col("_s") <= F.col("q_hat")).cast("int"))
            .cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("coverage"),
    )
    return cov.select(
        F.lit(float(alpha)).alias("alpha"),
        F.col("n_calib").cast("long").alias("n_calib"),
        F.col("n_test").cast("long").alias("n_test"),
        "q_hat",
        "coverage",
        F.round(F.lit(2.0) * F.col("q_hat"), 6).alias("avg_width"),
    )


def stratified_ate(
    df: DataFrame,
    treatment_col: str,
    outcome_col: str,
    propensity_col: str,
    id_col: str,
    n_strata: int = 5,
) -> DataFrame:
    """Propensity-stratified treatment effects (subclassification,
    Rosenbaum & Rubin 1984) — the transparent companion to
    :func:`ipw_ate`: cut the propensity into equal-frequency strata,
    compare arms WITHIN each stratum (where propensities are
    comparable), and read the per-stratum effects directly. Where IPW
    reweights, stratification shows you the dose-response table — and
    flags the strata where one arm is empty (no overlap) instead of
    silently extrapolating.

    Strata come from the scale-safe exact-NTILE
    (functions/aggregations.py::ntile_assign — never a partitionless
    window), tie-broken on ``id_col`` for determinism. Outcome sums
    accumulate as DECIMAL(30,10); means and effects are closed-form
    doubles over exact inputs.

    Output: one row per stratum — (stratum int, n long, n_treat,
    n_ctrl, mean_treat 6 dp, mean_ctrl 6 dp, effect 6 dp; null
    means/effect where an arm is empty), ordered by stratum.
    """
    from metadata_etl_framework_spark.functions.aggregations import (
        ntile_assign,
    )

    base = df.where(
        F.col(treatment_col).isNotNull()
        & F.col(outcome_col).isNotNull()
        & F.col(propensity_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).alias("_id"),
        F.col(treatment_col).cast("boolean").cast("int").alias("_t"),
        F.col(outcome_col).cast("double").alias("_y"),
        F.col(propensity_col).cast("double").alias("_p"),
    )
    bucketed = ntile_assign(
        base, ["_p", "_id"], int(n_strata), out="_stratum"
    )
    ydec = F.col("_y").cast("decimal(30,10)")
    per = bucketed.groupBy("_stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_t").cast("long").alias("n_treat"),
        F.sum(1 - F.col("_t")).cast("long").alias("n_ctrl"),
        F.sum(F.when(F.col("_t") == 1, ydec)).alias("_syt"),
        F.sum(F.when(F.col("_t") == 0, ydec)).alias("_syc"),
    )
    mt = F.when(
        F.col("n_treat") > 0,
        F.col("_syt").cast("double") / F.col("n_treat"),
    )
    mc = F.when(
        F.col("n_ctrl") > 0,
        F.col("_syc").cast("double") / F.col("n_ctrl"),
    )
    return per.select(
        F.col("_stratum").cast("int").alias("stratum"),
        "n",
        "n_treat",
        "n_ctrl",
        F.round(mt, 6).alias("mean_treat"),
        F.round(mc, 6).alias("mean_ctrl"),
        F.round(
            F.when(mt.isNotNull() & mc.isNotNull(), mt - mc), 6
        ).alias("effect"),
    ).orderBy("stratum")


def auc_delong(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """ROC AUC with DeLong (1988) standard error and 95% CI — the
    inference companion of :func:`binary_auc`: a point AUC without an
    interval cannot gate a model promotion, and bootstrap CIs cost
    hundreds of passes where DeLong costs ONE.

    Everything reduces to EXACT integer moments on the distinct-score
    grid (the welch/Mann-Whitney discipline): with per-score positive/
    negative counts (p_s, n_s) and inclusive prefix sums from ONE
    :func:`_dual_prefix_scan`-style pass,

        I_s = 2·neg_below(s) + n_s          (doubled placement of a
        J_s = 2·pos_above(s) + p_s           positive / negative at s)

    are integers; Σ p_s·I_s, Σ p_s·I_s², Σ n_s·J_s² accumulate as
    DECIMAL(38,0), and

        AUC      = Σ p·I / (2·m·n)
        S10      = (Σ p·I²/(4n²) − m·AUC²) / (m−1)
        S01      = (Σ n·J²/(4m²) − n·AUC²) / (n−1)
        SE       = √(S10/m + S01/n)

    — the structural-component variance in closed form, no per-row
    placements materialized, merge-order free, bit-replayable by a
    SQL oracle. CI clamps to [0, 1].

    Output: 1 row — (n_pos, n_neg, auc 6 dp, se 6 dp, ci_lo 6 dp,
    ci_hi 6 dp); null se/CI when either class has < 2 members.
    """
    from metadata_etl_framework_spark.quality.drift import (
        _dual_prefix_scan,
    )

    base = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).cast("double").alias("_s"),
        F.col(label_col).cast("boolean").cast("int").alias("_y"),
    )
    grid = base.groupBy("_s").agg(
        F.sum("_y").alias("_p"),
        F.sum(F.lit(1) - F.col("_y")).alias("_n"),
    )
    _cached: "list[DataFrame]" = []
    try:
        scan = _dual_prefix_scan(
            grid, "_s", "_n", "_p", persisted=_cached
        ).select(
            "_s", "_p", "_n",
            (F.col("__ca") - F.col("_n")).alias("_negb"),
            F.col("__cb").alias("_cumpos"),
        )
        tot = scan.agg(
            F.sum("_p").cast("long").alias("m"),
            F.sum("_n").cast("long").alias("n"),
            F.sum(
                F.col("_p").cast("decimal(38,0)")
                * (F.lit(2) * F.col("_negb") + F.col("_n"))
            ).alias("A"),
            F.sum(
                F.col("_p").cast("decimal(38,0)")
                * (F.lit(2) * F.col("_negb") + F.col("_n"))
                * (F.lit(2) * F.col("_negb") + F.col("_n"))
            ).alias("Q10"),
        ).collect()[0]
        m, n = int(tot["m"] or 0), int(tot["n"] or 0)
        spark = df.sparkSession
        if m == 0 or n == 0:
            return spark.createDataFrame(
                [(m, n, None, None, None, None)],
                "n_pos long, n_neg long, auc double, se double, "
                "ci_lo double, ci_hi double",
            )
        # J_s needs pos_above = m − cumpos (m known only after the
        # first aggregate) — second grid-sized aggregate, no row scan
        q01 = scan.agg(
            F.sum(
                F.col("_n").cast("decimal(38,0)")
                * (
                    F.lit(2) * (F.lit(m) - F.col("_cumpos"))
                    + F.col("_p")
                )
                * (
                    F.lit(2) * (F.lit(m) - F.col("_cumpos"))
                    + F.col("_p")
                )
            ).alias("Q01")
        ).collect()[0]
    finally:
        for f in _cached:
            f.unpersist()
    a_i = int(tot["A"] or 0)
    q10_i = int(tot["Q10"] or 0)
    q01_i = int(q01["Q01"] or 0)
    one = spark.createDataFrame(
        [(m, n, float(a_i), float(q10_i), float(q01_i))],
        "n_pos long, n_neg long, a double, q10 double, q01 double",
    )
    md = F.col("n_pos").cast("double")
    nd = F.col("n_neg").cast("double")
    auc = F.col("a") / (F.lit(2.0) * md * nd)
    if m < 2 or n < 2:
        return one.select(
            "n_pos", "n_neg",
            F.round(auc, 6).alias("auc"),
            F.lit(None).cast("double").alias("se"),
            F.lit(None).cast("double").alias("ci_lo"),
            F.lit(None).cast("double").alias("ci_hi"),
        )
    s10 = (
        F.col("q10") / (F.lit(4.0) * nd * nd) - md * auc * auc
    ) / (md - F.lit(1.0))
    s01 = (
        F.col("q01") / (F.lit(4.0) * md * md) - nd * auc * auc
    ) / (nd - F.lit(1.0))
    se = F.sqrt(
        F.greatest(F.lit(0.0), s10 / md + s01 / nd)
    )
    return one.select(
        "n_pos", "n_neg",
        F.round(auc, 6).alias("auc"),
        F.round(se, 6).alias("se"),
        F.round(
            F.greatest(F.lit(0.0), auc - F.lit(1.959964) * se), 6
        ).alias("ci_lo"),
        F.round(
            F.least(F.lit(1.0), auc + F.lit(1.959964) * se), 6
        ).alias("ci_hi"),
    )


def aipw_ate(
    df: DataFrame,
    treatment_col: str,
    outcome_col: str,
    propensity_col: str,
    id_col: str,
    n_strata: int = 5,
    clip: float = 0.01,
) -> DataFrame:
    """Doubly-robust (AIPW) average treatment effect — the estimator
    that stays consistent if EITHER the propensity model OR the
    outcome model is right (Robins, Rotnitzky & Zhao 1994): per row
    ψ = [m₁(x) − m₀(x)] + t·(y − m₁(x))/p − (1−t)·(y − m₀(x))/(1−p),
    ATE = mean ψ. Completes the causal panel (naive diff, IPW,
    stratified, CUPED, uplift) with the one production teams actually
    ship.

    The outcome models m̂ₐ are the within-propensity-stratum arm means
    (subclassification-based AIPW — transparent, no extra trained
    model): strata from the scale-safe exact-NTILE on (propensity,
    id), per-stratum DECIMAL outcome sums, the bounded stratum-means
    frame broadcast back onto the rows. Strata where an arm is empty
    (no overlap) are EXCLUDED from the estimate and counted in
    ``strata_dropped`` rather than silently extrapolated. Propensities
    clip to [clip, 1−clip] in the correction term only (strata are cut
    on the raw score).

    Per-row ψ terms round to 12 dp and sum as DECIMAL(30,12) (the
    ipw_ate convention) — merge-order free, oracle-replayable.

    Output: 1 row — (n long, n_used long, strata_used int,
    strata_dropped int, ate_outcome 6 dp, ate_aipw 6 dp); NULL
    estimates when every stratum lacks overlap.
    """
    if not (0 <= clip < 0.5):
        raise ValueError("clip must be in [0, 0.5)")
    if n_strata < 1:
        raise ValueError("n_strata must be >= 1")
    from metadata_etl_framework_spark.functions.aggregations import (
        ntile_assign,
    )

    base = df.where(
        F.col(treatment_col).isNotNull()
        & F.col(outcome_col).isNotNull()
        & F.col(propensity_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).alias("_id"),
        F.col(treatment_col).cast("boolean").cast("int").alias("_t"),
        F.col(outcome_col).cast("double").alias("_y"),
        F.col(propensity_col).cast("double").alias("_p"),
    )
    bucketed = ntile_assign(
        base, ["_p", "_id"], int(n_strata), out="_stratum"
    )
    ydec = F.col("_y").cast("decimal(30,10)")
    per = bucketed.groupBy("_stratum").agg(
        F.count(F.lit(1)).cast("long").alias("_ns"),
        F.sum("_t").cast("long").alias("_nt"),
        F.sum(1 - F.col("_t")).cast("long").alias("_nc"),
        F.sum(F.when(F.col("_t") == 1, ydec)).alias("_syt"),
        F.sum(F.when(F.col("_t") == 0, ydec)).alias("_syc"),
    )
    used = per.where((F.col("_nt") > 0) & (F.col("_nc") > 0)).select(
        "_stratum",
        "_ns",
        (F.col("_syt").cast("double") / F.col("_nt")).alias("_mt"),
        (F.col("_syc").cast("double") / F.col("_nc")).alias("_mc"),
    )
    counts = per.agg(
        F.count(F.lit(1)).cast("int").alias("strata_total"),
        F.sum(F.col("_ns")).cast("long").alias("n"),
    )

    def dec(c):
        return F.round(c, 12).cast("decimal(30,12)")

    pc = F.least(
        F.greatest(F.col("_p"), F.lit(float(clip))),
        F.lit(1.0 - float(clip)),
    )
    psi = (
        (F.col("_mt") - F.col("_mc"))
        + F.col("_t") * (F.col("_y") - F.col("_mt")) / pc
        - (1 - F.col("_t")) * (F.col("_y") - F.col("_mc"))
        / (F.lit(1.0) - pc)
    )
    rowagg = (
        bucketed.join(F.broadcast(used), "_stratum")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_used"),
            F.count_distinct(F.col("_stratum"))
            .cast("int")
            .alias("strata_used"),
            F.sum(dec(psi)).cast("double").alias("_spsi"),
            F.sum(
                dec(F.col("_mt") - F.col("_mc"))
            ).cast("double").alias("_sout"),
        )
    )
    return rowagg.crossJoin(F.broadcast(counts)).select(
        "n",
        F.coalesce(F.col("n_used"), F.lit(0)).alias("n_used"),
        F.coalesce(F.col("strata_used"), F.lit(0)).alias(
            "strata_used"
        ),
        (
            F.col("strata_total")
            - F.coalesce(F.col("strata_used"), F.lit(0))
        ).cast("int").alias("strata_dropped"),
        F.round(
            F.when(
                F.col("n_used") > 0,
                F.col("_sout") / F.col("n_used"),
            ),
            6,
        ).alias("ate_outcome"),
        F.round(
            F.when(
                F.col("n_used") > 0,
                F.col("_spsi") / F.col("n_used"),
            ),
            6,
        ).alias("ate_aipw"),
    )
