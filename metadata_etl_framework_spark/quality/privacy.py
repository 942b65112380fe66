"""Privacy / governance audits: k-anonymity, l-diversity, DP noisy counts.

The release-gate questions a data platform must answer before a dataset
leaves the boundary: can any row be singled out by its quasi-identifiers
(k-anonymity, Sweeney 2002), do small identity classes leak the
sensitive attribute anyway (l-diversity, Machanavajjhala et al. 2007),
and can aggregate counts be published with a differential-privacy noise
floor (Laplace mechanism, Dwork et al. 2006). The reference's quality
plane has profiling and validation rules but no privacy surface
(cf. /root/reference/src/quality/data_profiler.py) — this extends it.

Scale design: every audit is ONE groupBy on the quasi-identifier tuple
(output bounded by the number of identity classes, the thing being
audited) plus closed-form arithmetic; l-diversity adds the inner
(class, sensitive) aggregate. DP noise is seeded from the portable mix
hash (ops/sketch.py::hash32) over a scale-safe global group index
(ops/packing.py::global_row_number — range-partitioned two-phase
numbering, never a partitionless window), so a release is bit-for-bit
reproducible and oracle-replayable. NOTE: hash-seeded noise makes the
RELEASE deterministic — a production deployment would derive the seed
from a keyed secret per release so adversaries cannot replay the PRNG;
the mechanism and sensitivity accounting are what this module pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..ops.packing import global_row_number
from ..ops.sketch import hash32

__all__ = [
    "k_anonymity_classes",
    "k_anonymity_summary",
    "l_diversity_classes",
    "t_closeness_classes",
    "dp_noisy_counts",
]

_M32F = 4294967296.0


def k_anonymity_classes(
    df: DataFrame, qi_cols: "list[str]", k: int = 5
) -> DataFrame:
    """Per-identity-class k-anonymity audit: group rows by the
    quasi-identifier tuple and flag every class smaller than ``k``
    (each of its members can be narrowed to < k candidates by an
    attacker who knows the QI values).

    Output: (*qi_cols, class_size long, below_k boolean), ordered by
    the QI tuple. One shuffle; output is class-bounded.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    return (
        df.groupBy(*[F.col(c) for c in qi_cols])
        .agg(F.count(F.lit(1)).alias("class_size"))
        .select(
            *qi_cols,
            F.col("class_size").cast("long").alias("class_size"),
            (F.col("class_size") < int(k)).alias("below_k"),
        )
        .orderBy(*qi_cols)
    )


def k_anonymity_summary(
    df: DataFrame, qi_cols: "list[str]", k: int = 5
) -> DataFrame:
    """The release-gate readout over :func:`k_anonymity_classes`:
    how many identity classes exist, how many violate k, how many ROWS
    sit in violating classes (the re-identifiable population), and the
    smallest class size. ``pct_rows_at_risk`` is the suppression cost
    of enforcing k by dropping violators.

    Output: 1 row — (k int, n_rows, n_classes, n_violating_classes,
    rows_at_risk, pct_rows_at_risk 6 dp, min_class_size).
    """
    classes = k_anonymity_classes(df, qi_cols, k=k)
    return classes.agg(
        F.lit(int(k)).cast("int").alias("k"),
        F.sum("class_size").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(F.col("below_k").cast("int")).cast("long").alias(
            "n_violating_classes"
        ),
        F.coalesce(
            F.sum(F.when(F.col("below_k"), F.col("class_size"))),
            F.lit(0),
        )
        .cast("long")
        .alias("rows_at_risk"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("below_k"), F.col("class_size"))),
                F.lit(0),
            ).cast("double")
            * 100.0
            / F.sum("class_size"),
            6,
        ).alias("pct_rows_at_risk"),
        F.min("class_size").cast("long").alias("min_class_size"),
    )


def l_diversity_classes(
    df: DataFrame,
    qi_cols: "list[str]",
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """Per-identity-class l-diversity audit: a class that is k-anonymous
    but carries only one sensitive value still leaks it (the homogeneity
    attack); distinct l-diversity demands ≥ l distinct sensitive values
    per class, and the entropy readout (−Σ p·ln p over the class's
    sensitive-value shares, 6 dp) grades how evenly they spread.

    Two nested aggregations — (QI, sensitive) counts, then per-class
    roll-up; the entropy sum is over in-class value counts (exact
    integer ratios under ln).

    Output: (*qi_cols, class_size long, n_sensitive long,
    entropy 6 dp, below_l boolean), ordered by the QI tuple.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    inner = df.groupBy(
        *[F.col(c) for c in qi_cols],
        F.col(sensitive_col).alias("__s"),
    ).agg(F.count(F.lit(1)).alias("__c"))
    w_cls = Window.partitionBy(*qi_cols)
    with_tot = inner.withColumn("__tot", F.sum("__c").over(w_cls))
    p = F.col("__c").cast("double") / F.col("__tot")
    return (
        with_tot.withColumn("__term", -p * F.log(p))
        .groupBy(*qi_cols)
        .agg(
            F.sum("__c").cast("long").alias("class_size"),
            F.count(F.lit(1)).cast("long").alias("n_sensitive"),
            F.round(F.sum("__term"), 6).alias("entropy"),
            (F.count(F.lit(1)) < int(l)).alias("below_l"),
        )
        .orderBy(*qi_cols)
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: "list[str]",
    epsilon: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """ε-differentially-private group counts via the Laplace mechanism:
    count per group + Laplace(Δ/ε) noise with sensitivity Δ = 1 (one
    individual shifts one count by one — assumes one row per individual
    per group; pre-aggregate otherwise).

    Noise is inverse-CDF sampled from a uniform u ∈ (0, 1) derived
    from the portable mix hash of the group's global index (+ seed):
    noise = −b·sign(u−½)·ln(1−2|u−½|), b = 1/ε — closed-form, exact,
    and replayable by any engine. The group index comes from the
    range-partitioned two-phase numbering (never a partitionless
    window), so the op scales to arbitrarily many groups.

    Output: (*group_cols, exact_count long, noise 6 dp,
    noisy_count 6 dp), ordered by the group tuple. ``exact_count`` is
    returned for AUDIT; a real release publishes only noisy_count.
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    counts = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    idx = global_row_number(counts, order_by=list(group_cols), out="__idx")
    u = (
        hash32(F.col("__idx") + F.lit(int(seed) * 1000003))
        + F.lit(0.5)
    ) / F.lit(_M32F)
    b = 1.0 / float(epsilon)
    noise = (
        -F.lit(b)
        * F.signum(u - F.lit(0.5))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    )
    return (
        idx.withColumn("noise", F.round(noise, 6))
        .select(
            *group_cols,
            F.col("exact_count").cast("long").alias("exact_count"),
            "noise",
            F.round(F.col("exact_count") + F.col("noise"), 6).alias(
                "noisy_count"
            ),
        )
        .orderBy(*group_cols)
    )


def t_closeness_classes(
    df: DataFrame,
    qi_cols: "list[str]",
    sensitive_col: str,
    t: float = 0.2,
    ordered: bool = False,
    max_values: int = 64,
) -> DataFrame:
    """Per-identity-class t-closeness audit (Li, Li & Venkatasubramanian
    2007) — the release gate after k-anonymity and l-diversity: a class
    can hold l distinct sensitive values yet still skew far from the
    GLOBAL distribution (the skewness attack); t-closeness demands the
    earth-mover's distance between the class's sensitive-value
    distribution and the table-wide one stay ≤ t.

    Two ground metrics:
    - ``ordered=False`` (categorical): equal ground distance, so
      EMD = ½ Σ_v |p_v − q_v| (total variation). Computed WITHOUT the
      class×value grid via the identity
      Σ_v |c_v·N − g_v·n_c| = Σ_{v∈class} (|c_v·N − g_v·n_c|
      − g_v·n_c) + n_c·N — one join of class-value counts onto global
      value counts, absent values folded in closed form.
    - ``ordered=True`` (numeric/banded): the ordered EMD
      (1/(m−1)) Σ_i |Σ_{j≤i} (p_j − q_j)| over the m global values in
      sort order. This NEEDS per-class cumulative sums over the FULL
      value domain, so classes are crossed with the (bounded) distinct
      value list — gated at ``max_values`` (the audit's sensitive
      attribute should be banded anyway; band first if wider).

    All distances are EXACT integer arithmetic until the final divide:
    numerators accumulate |c_v·N − g_v·n_c| as DECIMAL(38,0) and the
    single division by (2·n_c·N) (resp. n_c·N·(m−1)) happens at the
    end, rounded 6 dp — merge-order free and engine-replayable.

    Output: (*qi_cols, class_size long, emd 6 dp, above_t boolean),
    ordered by the QI tuple.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    base = df.where(F.col(sensitive_col).isNotNull())
    glob = base.groupBy(F.col(sensitive_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__g")
    )
    tot = base.agg(F.count(F.lit(1)).alias("__N"))
    cls = base.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("__nc"))
    cv = base.groupBy(
        *[F.col(c) for c in qi_cols],
        F.col(sensitive_col).alias("__v"),
    ).agg(F.count(F.lit(1)).alias("__c"))
    if not ordered:
        # Σ_{v∈class} (|c·N − g·nc| − g·nc), then + nc·N in closed form
        j = (
            cv.join(glob, "__v")
            .join(cls, qi_cols)
            .crossJoin(tot)
            .select(
                *qi_cols,
                F.col("__nc"),
                F.col("__N"),
                (
                    F.abs(
                        F.col("__c").cast("decimal(38,0)")
                        * F.col("__N")
                        - F.col("__g").cast("decimal(38,0)")
                        * F.col("__nc")
                    )
                    - F.col("__g").cast("decimal(38,0)")
                    * F.col("__nc")
                ).alias("__term"),
            )
        )
        out = j.groupBy(*qi_cols).agg(
            F.max("__nc").cast("long").alias("class_size"),
            F.round(
                (
                    F.sum(F.col("__term").cast("decimal(38,0)"))
                    + F.max("__nc").cast("decimal(38,0)")
                    * F.max("__N")
                ).cast("double")
                / (
                    F.lit(2.0)
                    * F.max("__nc").cast("double")
                    * F.max("__N").cast("double")
                ),
                6,
            ).alias("emd"),
        )
    else:
        n_vals = glob.count()
        if n_vals > max_values:
            raise ValueError(
                f"t_closeness_classes(ordered=True): {n_vals} distinct "
                f"sensitive values > max_values={max_values} — band the "
                f"attribute first (the class×value grid is m×classes)"
            )
        if n_vals < 2:
            raise ValueError(
                "t_closeness_classes(ordered=True): need >= 2 distinct "
                "sensitive values"
            )
        grid = cls.crossJoin(glob).join(
            cv, [*qi_cols, "__v"], "left"
        ).na.fill({"__c": 0})
        w = Window.partitionBy(*qi_cols).orderBy("__v")
        cum = grid.crossJoin(tot).withColumn(
            "__cum",
            F.sum(
                F.col("__c").cast("decimal(38,0)") * F.col("__N")
                - F.col("__g").cast("decimal(38,0)") * F.col("__nc")
            ).over(w),
        )
        out = cum.groupBy(*qi_cols).agg(
            F.max("__nc").cast("long").alias("class_size"),
            F.round(
                F.sum(F.abs(F.col("__cum"))).cast("double")
                / (
                    F.max("__nc").cast("double")
                    * F.max("__N").cast("double")
                    * F.lit(float(n_vals - 1))
                ),
                6,
            ).alias("emd"),
        )
    return out.select(
        *qi_cols,
        "class_size",
        "emd",
        (F.col("emd") > float(t)).alias("above_t"),
    ).orderBy(*qi_cols)
