"""Anomaly-detection operators.

Parity target: ``AnomalyManager`` (reference:
src/quality/anomaly_manager.py:65-361). The reference returns positional
pandas indices; Spark has no stable row order, so every detector here
takes an explicit ``key_col`` and returns ``(key, score/confidence)``
rows (SURVEY §7.1). Statistical detectors (zscore/iqr/moving-average)
are pure DataFrame ops; the sklearn family (isolation forest, LOF,
OCSVM, DBSCAN) runs through ``applyInPandas`` per group — import-gated
because sklearn is absent in this container.

Numeric determinism: global mean is computed as an exact DECIMAL sum cast
back to double, and variance as an exact DECIMAL sum of squared
deviations, so results are identical across partitionings (and match a
DuckDB oracle bitwise).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _exact_mean_std(df: DataFrame, value_col: str) -> DataFrame:
    """1-row frame (_mean, _std): partition-order-independent mean/std."""
    stats = df.agg(
        F.sum(F.col(value_col).cast("decimal(27,6)")).cast("double").alias("_sum"),
        F.count(value_col).alias("_n"),
    ).select(
        F.when(F.col("_n") > 0, F.col("_sum") / F.col("_n")).alias("_mean"),
        F.col("_n"),
    )
    with_mean = df.crossJoin(F.broadcast(stats))
    var = with_mean.agg(
        F.sum(
            ((F.col(value_col) - F.col("_mean")) * (F.col(value_col) - F.col("_mean")))
            .cast("decimal(30,12)")
        ).cast("double").alias("_ss"),
        F.first("_mean").alias("_mean"),
        F.first("_n").alias("_n"),
    )
    return var.select(
        "_mean",
        F.when(
            F.col("_n") > 1, F.sqrt(F.col("_ss") / (F.col("_n") - 1))
        ).alias("_std"),
    )


def winsorize(
    df: DataFrame,
    columns: "Sequence[str]",
    lower_q: float = 0.01,
    upper_q: float = 0.99,
    suffix: str = "_capped",
) -> DataFrame:
    """Outlier capping: clip each column to its exact [lower_q, upper_q]
    quantiles (pandas ``clip(lower=quantile, upper=quantile)`` parity —
    exact percentile, not approx, per SURVEY §7 hard-part 5).

    All bounds come from ONE aggregation whose 1-row result is broadcast
    (shared-stats pattern) — one extra linear scan regardless of how many
    columns are capped; the clip itself is a per-row JVM projection.
    """
    if not (0.0 <= lower_q < upper_q <= 1.0):
        raise ValueError("need 0 <= lower_q < upper_q <= 1")
    bounds = df.agg(
        *[
            F.percentile(c, F.lit(q)).alias(f"__{c}_{tag}")
            for c in columns
            for tag, q in (("lo", lower_q), ("hi", upper_q))
        ]
    )
    out = df.crossJoin(F.broadcast(bounds))
    for c in columns:
        out = out.withColumn(
            c + suffix,
            F.least(
                F.greatest(F.col(c), F.col(f"__{c}_lo")), F.col(f"__{c}_hi")
            ),
        )
    return out.drop(*[f"__{c}_{t}" for c in columns for t in ("lo", "hi")])


def detect_zscore(
    df: DataFrame, value_col: str, key_col: str, threshold: float = 3.0
) -> DataFrame:
    """Rows with |z| > threshold; returns (key, value, zscore).

    Reference: anomaly_manager.py:110-123 (two-pass agg → derived column).
    """
    stats = _exact_mean_std(df, value_col)
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "zscore",
            F.when(
                F.col("_std") > 0, (F.col(value_col) - F.col("_mean")) / F.col("_std")
            ),
        )
        .filter(F.abs(F.col("zscore")) > threshold)
        .select(key_col, value_col, F.round("zscore", 6).alias("zscore"))
    )


def _exact_global_percentiles(
    df: DataFrame,
    value_col: str,
    probs: "tuple[float, ...]",
    aliases: "tuple[str, ...]",
    single_task_max_rows: int,
    known_count: "int | None" = None,
) -> DataFrame:
    """Exact interpolated percentiles as a 1-row frame, two regimes:
    one `F.percentile` aggregate below ``single_task_max_rows`` (fastest
    at tested scale, but it buffers every value in ONE aggregation
    state), else the distributed prefix-scan formulation
    (`functions/aggregations.py::global_quantiles`) whose per-task state
    is bounded at any cardinality. Both are value-identical (both match
    DuckDB ``quantile_cont`` bit-for-bit).

    ``known_count`` skips the regime-gate ``df.count()`` when the caller
    already knows the row count — detectors that take quantiles of both
    the input and a same-length derived frame (robust z's deviation
    frame) count ONCE instead of re-scanning per call."""
    n = df.count() if known_count is None else known_count
    if n <= single_task_max_rows:
        return df.agg(
            *[
                F.percentile(value_col, F.lit(p)).alias(a)
                for p, a in zip(probs, aliases)
            ]
        )
    from metadata_etl_framework_spark.functions.aggregations import (
        global_quantiles,
    )

    rows = {
        r["p"]: r["value"]
        for r in global_quantiles(
            df, value_col, probs, round_to=None
        ).collect()
    }
    return df.sparkSession.createDataFrame(
        [tuple(rows[float(p)] for p in probs)],
        ", ".join(f"{a} double" for a in aliases),
    )


def detect_iqr(
    df: DataFrame,
    value_col: str,
    key_col: str,
    multiplier: float = 1.5,
    single_task_max_rows: int = 50_000_000,
) -> DataFrame:
    """Rows outside [Q1 - m·IQR, Q3 + m·IQR] with exact percentiles.

    Reference: anomaly_manager.py:125-144. Exact (not approx) percentiles
    to match the pandas/DuckDB oracle (SURVEY §7.5). Above
    ``single_task_max_rows`` the quantiles come from the distributed
    prefix-scan path instead of a single-task ``F.percentile`` buffer
    (identical values — see :func:`_exact_global_percentiles`).
    """
    q = _exact_global_percentiles(
        df, value_col, (0.25, 0.75), ("_q1", "_q3"), single_task_max_rows
    ).select(
        "_q1",
        "_q3",
        (F.col("_q1") - multiplier * (F.col("_q3") - F.col("_q1"))).alias("_lo"),
        (F.col("_q3") + multiplier * (F.col("_q3") - F.col("_q1"))).alias("_hi"),
    )
    return (
        df.crossJoin(F.broadcast(q))
        .filter((F.col(value_col) < F.col("_lo")) | (F.col(value_col) > F.col("_hi")))
        .select(key_col, value_col)
    )


def detect_robust_zscore(
    df: DataFrame,
    value_col: str,
    key_col: str,
    threshold: float = 3.5,
    single_task_max_rows: int = 50_000_000,
) -> DataFrame:
    """Rows with |modified z| > threshold, where modified z =
    0.6745·(x − median)/MAD (Iglewicz–Hoaglin). Unlike
    :func:`detect_zscore`, median and MAD don't move when the outliers
    themselves get more extreme — the estimator the mean/std pair can't
    be: one wild value inflates std enough to mask its neighbors.

    Two exact quantile passes (median, then median of |x − median|),
    each through the same gated single-task/prefix-scan machinery as
    :func:`detect_iqr`, then one broadcast-stats projection. Degenerate
    MAD = 0 (over half the values identical) yields no finite score —
    those rows are excluded rather than divided by zero, the standard
    treatment. Output: (key, value, robust_z) rounded to 6 dp.
    """
    # one regime-gate count serves both quantile calls: the deviation
    # frame is row-for-row the input (crossJoin with a 1-row stats
    # frame), so its count is the input's — without this, the detector
    # would run three whole-table scans before any quantile work
    n_rows = df.count()
    med = _exact_global_percentiles(
        df, value_col, (0.5,), ("_med",), single_task_max_rows,
        known_count=n_rows,
    )
    dev = df.crossJoin(F.broadcast(med)).select(
        F.abs(F.col(value_col) - F.col("_med")).alias("_adev")
    )
    mad = _exact_global_percentiles(
        dev, "_adev", (0.5,), ("_mad",), single_task_max_rows,
        known_count=n_rows,
    )
    return (
        df.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .withColumn(
            "robust_z",
            F.when(
                F.col("_mad") > 0,
                F.lit(0.6745)
                * (F.col(value_col) - F.col("_med"))
                / F.col("_mad"),
            ),
        )
        .filter(F.abs(F.col("robust_z")) > threshold)
        .select(key_col, value_col, F.round("robust_z", 6).alias("robust_z"))
    )


def detect_moving_average(
    df: DataFrame,
    value_col: str,
    key_col: str,
    order_col: str,
    partition_by: Sequence[str] = (),
    window_size: int = 20,
    threshold: float = 2.5,
) -> DataFrame:
    """Rolling mean/std z-score detector (anomaly_manager.py:146-160).

    Requires an explicit order column (SURVEY §7.2). partition_by keeps the
    window computation distributed — at scale, never run a global ordered
    window without partitioning.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(order_col)
        .rowsBetween(-(window_size - 1), 0)
    )
    # Rolling mean/std from EXACT decimal rolling sums (sum, sum-of-squares):
    # order-independent, bitwise-reproducible across partitionings/engines.
    v = F.col(value_col)
    s = F.sum(v.cast("decimal(18,6)")).over(w).cast("double")
    ss = F.sum((v * v).cast("decimal(28,10)")).over(w).cast("double")
    n = F.count(value_col).over(w)
    mean = s / n
    # guard n==1: ANSI mode raises DIVIDE_BY_ZERO eagerly, before the
    # _n > 1 filter below would exclude the row
    var = F.when(
        n > 1, F.greatest((ss - s * s / n) / (n - 1), F.lit(0.0))
    )
    sd = F.sqrt(var)
    z = F.when(sd > 0, (v - mean) / sd)
    return (
        df.withColumn("_z", z)
        .withColumn("_n", n)
        .withColumn("_sd", sd)
        .filter(
            (F.col("_n") > 1) & (F.col("_sd") > 0) & (F.abs(F.col("_z")) > threshold)
        )
        .select(*partition_by, key_col, value_col, F.round("_z", 6).alias("ma_zscore"))
    )


def ensemble_vote(
    detections: Sequence[DataFrame], key_col: str, min_votes: int | None = None
) -> DataFrame:
    """Majority vote across detector outputs (anomaly_manager.py:345-361)."""
    if not detections:
        raise ValueError("no detections")
    need = min_votes or (len(detections) // 2 + 1)
    keyed = [d.select(F.col(key_col)).dropDuplicates() for d in detections]
    from functools import reduce

    all_keys = reduce(lambda a, b: a.unionByName(b), keyed)
    return (
        all_keys.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("votes"))
        .filter(F.col("votes") >= need)
    )


def with_severity(
    df: DataFrame,
    score_col: str,
    scale: float = 5.0,
    high: float = 0.8,
    medium: float = 0.5,
) -> DataFrame:
    """Adds ``confidence`` (|score|/scale clamped to [0,1]) and
    ``severity`` (low/medium/high) columns.

    Reference parity: classify_severity (anomaly_manager.py:335-343) —
    confidence > high ⇒ 'high', > medium ⇒ 'medium', else 'low'. The
    reference classified driver-side dicts one at a time; here it is a
    plain column expression, so classification stays distributed."""
    conf = F.least(F.abs(F.col(score_col)) / F.lit(float(scale)), F.lit(1.0))
    return df.withColumn("confidence", conf).withColumn(
        "severity",
        F.when(F.col("confidence") > high, "high")
        .when(F.col("confidence") > medium, "medium")
        .otherwise("low"),
    )


def store_anomaly_results(
    store,
    dq_run_id: str,
    method: str,
    flagged: DataFrame,
    key_col: str,
    score_col: str | None = None,
    max_rows: int = 10_000,
) -> int:
    """Persist flagged keys (+scores) to the metadata store's
    ANOMALY_DETECTION table (reference: anomaly_manager.py:375-400,
    database/data_quality_schema.sql).

    Driver-side by design — anomaly result sets are small relative to the
    input; ``max_rows`` bounds the pull regardless. Returns rows stored."""
    import json as _json
    import time as _time
    import uuid as _uuid

    store.execute(
        """
        CREATE TABLE IF NOT EXISTS ANOMALY_DETECTION (
            detection_id TEXT PRIMARY KEY,
            dq_run_id TEXT,
            method TEXT,
            detected_keys TEXT,
            confidence_scores TEXT,
            count INTEGER,
            created_at REAL
        )
        """
    )
    cols = [key_col] + ([score_col] if score_col else [])
    rows = flagged.select(*cols).limit(max_rows).collect()
    keys = [r[key_col] for r in rows]
    scores = [float(r[score_col]) for r in rows] if score_col else []
    store.insert(
        "ANOMALY_DETECTION",
        {
            "detection_id": str(_uuid.uuid4()),
            "dq_run_id": dq_run_id,
            "method": method,
            "detected_keys": _json.dumps(keys),
            "confidence_scores": _json.dumps(scores),
            "count": len(keys),
            "created_at": _time.time(),
        },
    )
    return len(keys)


def detect_timeseries(
    df: DataFrame,
    value_col: str,
    key_col: str,
    order_col: str,
    method: str = "arima_residual",
    max_points: int = 100_000,
    **params,
) -> DataFrame:
    """Time-series detectors: arima_residual / stl_decomposition /
    changepoint / prophet (reference: anomaly_manager.py:241-324).

    Time series are driver-sized by nature (the reference collects them
    outright); the ordered series is bounded by ``max_points`` and pulled
    to the driver, the statistical model runs there, and flagged keys
    return as a DataFrame. Import-gated: statsmodels / ruptures are not
    in this container.
    """
    spark = df.sparkSession
    pdf = (
        df.select(key_col, value_col)
        .orderBy(order_col)
        .limit(max_points)
        .toPandas()
    )
    series = pdf[value_col].to_numpy()
    if method == "arima_residual":
        try:
            from statsmodels.tsa.arima.model import ARIMA
        except ImportError as e:
            raise NotImplementedError(
                "statsmodels not installed; arima_residual needs it"
            ) from e
        order = params.get("order", (1, 0, 0))
        resid = ARIMA(series, order=order).fit().resid
        thr = params.get("threshold", 3.0)
        mask = abs((resid - resid.mean()) / (resid.std() or 1.0)) > thr
    elif method == "stl_decomposition":
        try:
            from statsmodels.tsa.seasonal import STL
        except ImportError as e:
            raise NotImplementedError(
                "statsmodels not installed; stl_decomposition needs it"
            ) from e
        resid = STL(series, period=params.get("period", 12)).fit().resid
        thr = params.get("threshold", 3.0)
        mask = abs((resid - resid.mean()) / (resid.std() or 1.0)) > thr
    elif method == "changepoint":
        try:
            import ruptures
        except ImportError as e:
            raise NotImplementedError(
                "ruptures not installed; changepoint needs it"
            ) from e
        algo = ruptures.Pelt(model=params.get("model", "rbf")).fit(series)
        points = set(algo.predict(pen=params.get("penalty", 10)))
        mask = [i in points for i in range(len(series))]
    elif method == "prophet":
        # forecast-residual detector (reference: anomaly_manager.py:282-302)
        try:
            from prophet import Prophet
        except ImportError as e:
            raise NotImplementedError(
                "prophet not installed; the prophet method needs it"
            ) from e
        import pandas as _pd

        ds = params.get("timestamps")
        fit_df = _pd.DataFrame(
            {"ds": _pd.to_datetime(ds) if ds is not None
             else _pd.date_range("2000-01-01", periods=len(series), freq="D"),
             "y": series}
        )
        model = Prophet(**params.get("prophet_kwargs", {}))
        model.fit(fit_df)
        forecast = model.predict(fit_df[["ds"]])
        resid = series - forecast["yhat"].to_numpy()
        thr = params.get("threshold", 3.0)
        mask = abs((resid - resid.mean()) / (resid.std() or 1.0)) > thr
    else:
        raise ValueError(f"unknown time-series method {method!r}")
    flagged = pdf.loc[list(mask), [key_col]]
    return spark.createDataFrame(flagged) if len(flagged) else spark.createDataFrame(
        [], schema=f"{key_col} long"
    )


def detect_dbscan_native(
    df: DataFrame,
    value_cols: Sequence[str],
    key_col: str,
    eps: float = 0.5,
    min_samples: int = 5,
) -> DataFrame:
    """Native distributed arm of the reference's DBSCAN anomaly method
    (anomaly_manager.py:162-180 — label == -1, i.e. NOISE points, are
    the anomalies): routes to ops/clustering.py::dbscan_grid (ε-grid
    cell equi-join + core-core connected components — never all-pairs)
    and returns the noise keys in the same one-column shape
    :func:`detect_sklearn` emits, so :func:`ensemble_vote` composes
    both arms interchangeably. Unlike the bucketed sklearn bridge this
    arm computes the GLOBAL ε-graph — no per-bucket approximation —
    and is deterministic/oracle-replayable. Features are taken raw
    (the detect_sklearn convention here); standardize upstream when
    scales differ. Limited to ≤3 feature dims (the 3^d cell-offset
    fan-out); higher-d density work belongs to the LSH-bucketed LOF
    path."""
    from metadata_etl_framework_spark.ops.clustering import dbscan_grid

    out = dbscan_grid(
        df, key_col, list(value_cols), eps=eps, min_samples=min_samples
    )
    return out.where(F.col("role") == "noise").select(key_col)


_SKLEARN_METHODS = ("isolation_forest", "lof", "dbscan", "ocsvm")


def detect_sklearn(
    df: DataFrame,
    value_cols: Sequence[str],
    key_col: str,
    method: str = "isolation_forest",
    group_col: str | None = None,
    n_buckets: int = 64,
    model_factory=None,
    **params,
) -> DataFrame:
    """sklearn-family detectors via applyInPandas (import-gated).

    Reference: anomaly_manager.py:162-238 (dbscan :162-180, iforest, lof,
    ocsvm :221-238). Every model exposes ``fit_predict`` with -1 = outlier.

    Batch bounding: groups by ``group_col`` when given; otherwise by a
    SALT bucket ``pmod(xxhash64(key), n_buckets)`` — never a single
    all-rows group, which would funnel the dataset into one pandas batch
    on one executor (OOM at scale). Per-bucket model fits are an
    approximation of the global fit, in the same way the reference's
    sampling is; size n_buckets so a bucket fits executor memory.

    ``model_factory(method, params) -> estimator`` is injectable so the
    dispatch/bucketing logic stays unit-testable where sklearn is absent.
    """
    if method not in _SKLEARN_METHODS:
        raise ValueError(
            f"unknown sklearn method {method!r}; expected one of {_SKLEARN_METHODS}"
        )
    if model_factory is None:
        try:
            import sklearn  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "sklearn not installed in this environment; detect_sklearn is "
                "the pandas-bridge path for isolation_forest/lof/dbscan/ocsvm"
            ) from e

    import pandas as pd  # noqa: PLC0415

    def _make_model():
        if model_factory is not None:
            return model_factory(method, params)
        from sklearn.cluster import DBSCAN
        from sklearn.ensemble import IsolationForest
        from sklearn.neighbors import LocalOutlierFactor
        from sklearn.svm import OneClassSVM

        if method == "isolation_forest":
            return IsolationForest(
                contamination=params.get("contamination", 0.05), random_state=42
            )
        if method == "lof":
            return LocalOutlierFactor(n_neighbors=params.get("n_neighbors", 20))
        if method == "dbscan":
            return DBSCAN(
                eps=params.get("eps", 0.5),
                min_samples=params.get("min_samples", 5),
            )
        return OneClassSVM(nu=params.get("nu", 0.05))

    def _run(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if not len(pdf):
            return pdf[[key_col]]
        X = pdf[list(value_cols)].to_numpy()
        flags = _make_model().fit_predict(X) == -1
        return pdf.loc[flags, [key_col]]

    if group_col:
        grouped = df.groupBy(group_col)
    else:
        grouped = df.groupBy(
            F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).alias("_salt")
        )
    return grouped.applyInPandas(_run, schema=f"{key_col} long")


def changepoint_mean_shift(
    df: DataFrame,
    order_cols: "list[str | tuple[str, str]]",
    value_col: str,
) -> DataFrame:
    """At-most-one mean-shift change-point over an ordered metric
    series — "WHEN did this metric move?", the question the z/IQR
    detectors (WHICH rows are extreme) and the drift suite (DID the
    distribution move) don't answer.

    The scaled-CUSUM scan: with S_t the running value total and t the
    global position, the candidate statistic is D_t = |S_t − (t/n)·S_n|
    and the change-point is the argmax over splits 1 ≤ t < n (count
    desc, position tie-break after 6 dp rounding, so the pick can't
    flip on a ulp). Both t and S_t come from the two-phase distributed
    primitives (ops/packing.py::global_row_number /
    global_prefix_sum_decimal) — no partitionless window, no
    single-task buffer, sums exact at any scale.

    ``order_cols`` must end in a unique tie-break column (same contract
    as SQL ROW_NUMBER). Output: 1 row — (split_after long = last
    position of the left segment, stat 6dp, mean_before, mean_after,
    n long).
    """
    from metadata_etl_framework_spark.ops.packing import (
        global_prefix_sum_decimal,
        global_row_number,
    )

    specs = [(c, "asc") if isinstance(c, str) else c for c in order_cols]
    sel = df.where(F.col(value_col).isNotNull()).select(
        *[F.col(c) for c, _ in specs], F.col(value_col).alias("_v")
    )
    ranked = global_row_number(sel, list(order_cols), out="_t")
    scanned = global_prefix_sum_decimal(ranked, "_t", "_v", out="_s")
    tot = scanned.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_v").cast("decimal(30,10)"))
        .cast("decimal(38,10)")
        .alias("_sn"),
    )
    sd = F.col("_s").cast("double")
    snd = F.col("_sn").cast("double")
    d_stat = F.abs(sd - (F.col("_t") / F.col("_n")) * snd)
    return (
        scanned.crossJoin(F.broadcast(tot))
        .where(F.col("_t") < F.col("_n"))
        .select(
            F.col("_t").alias("split_after"),
            F.round(d_stat, 6).alias("stat"),
            F.round(sd / F.col("_t"), 6).alias("mean_before"),
            F.round(
                (snd - sd) / (F.col("_n") - F.col("_t")), 6
            ).alias("mean_after"),
            F.col("_n").cast("long").alias("n"),
        )
        .orderBy(F.desc("stat"), F.col("split_after"))
        .limit(1)
    )


def detect_robust_zscore_grouped(
    df: DataFrame,
    value_col: str,
    key_col: str,
    group_cols: "Sequence[str]",
    threshold: float = 3.5,
) -> DataFrame:
    """Per-GROUP robust modified z (Iglewicz–Hoaglin): each group gets
    its own median and MAD, so a value extreme for ITS segment is
    caught even when it is ordinary globally (and vice versa) — the
    per-tenant/per-source form of :func:`detect_robust_zscore`.

    Exact per-group percentiles via ``F.percentile`` — the aggregation
    state buffers one GROUP's values, which is the intended bound here
    (a group is a tenant/source slice, not the whole table; for a
    global scan use :func:`detect_robust_zscore`, which rides the
    distributed prefix scan). Two grouped passes (median, then MAD) and
    two shuffle joins on the group key; MAD = 0 groups yield no finite
    score and are excluded, as in the global detector.

    Output: group cols + (key, value, robust_z 6dp).
    """
    groups = list(group_cols)
    med = df.groupBy(*groups).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med")
    )
    with_med = df.join(med, groups)
    mad = (
        with_med.select(
            *groups,
            F.abs(F.col(value_col) - F.col("_med")).alias("_adev"),
        )
        .groupBy(*groups)
        .agg(F.percentile("_adev", F.lit(0.5)).alias("_mad"))
    )
    return (
        with_med.join(mad, groups)
        .withColumn(
            "robust_z",
            F.when(
                F.col("_mad") > 0,
                F.lit(0.6745)
                * (F.col(value_col) - F.col("_med"))
                / F.col("_mad"),
            ),
        )
        .filter(F.abs(F.col("robust_z")) > threshold)
        .select(
            *groups, key_col, value_col,
            F.round("robust_z", 6).alias("robust_z"),
        )
    )


def detect_seasonal_residual(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    bucket_seconds: int = 3600,
    season: int = 24,
    threshold: float = 3.0,
) -> DataFrame:
    """Seasonality-aware anomaly detection on a bucketed metric series:
    z-score the RESIDUAL against the seasonal expectation instead of
    the raw value — a 2 a.m. spike that is normal FOR 2 A.M. stops
    alerting, and a "normal-looking" noon value that is low-for-noon
    starts to. The anomaly-side complement of seasonal_profile's
    interpretation table and forecast_baseline_eval's backtest.

    The series is the per-bucket DECIMAL-exact mean indexed by
    epoch//bucket_seconds (the acf_table shape — one row-scale
    groupBy); season index = bucket % season (modular seasonality,
    matching the backtest's integer-season convention). The seasonal
    expectation is each index's mean over the bounded (<= season)-row
    grid, residual = y − expected, and the flag is the classic
    z > threshold on residuals with the partition-order-independent
    mean/std (the detect_zscore arithmetic, applied to residuals).
    Season indexes observed fewer than 2 times keep NULL expectation
    and are never flagged (no seasonal evidence to judge against).

    Output: (i, season_idx, y 6dp, expected 6dp, residual 6dp, z 6dp)
    for buckets with |z| > threshold.
    """
    if season < 1 or bucket_seconds < 1:
        raise ValueError("season and bucket_seconds must be >= 1")
    x = F.col(value_col).cast("double")
    series = (
        df.where(F.col(ts_col).isNotNull() & x.isNotNull())
        .groupBy(
            F.floor(
                F.unix_timestamp(F.col(ts_col)) / bucket_seconds
            ).alias("i")
        )
        .agg(
            (
                F.sum(x.cast("decimal(30,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("y")
        )
        .withColumn("season_idx", F.col("i") % season)
    )
    expect = series.groupBy("season_idx").agg(
        F.when(
            F.count(F.lit(1)) > 1,
            F.sum(F.col("y").cast("decimal(30,10)")).cast("double")
            / F.count(F.lit(1)),
        ).alias("expected"),
    )
    resid = series.join(F.broadcast(expect), "season_idx").withColumn(
        "residual", F.col("y") - F.col("expected")
    )
    stats = resid.where(F.col("residual").isNotNull()).agg(
        F.sum(F.col("residual").cast("decimal(30,10)"))
        .cast("double")
        .alias("_sum"),
        F.count("residual").alias("_n"),
    )
    mean = F.when(F.col("_n") > 0, F.col("_sum") / F.col("_n"))
    with_mean = resid.crossJoin(
        F.broadcast(stats.select(mean.alias("_mean"), "_n"))
    )
    var = with_mean.where(F.col("residual").isNotNull()).agg(
        F.sum(
            (
                (F.col("residual") - F.col("_mean"))
                * (F.col("residual") - F.col("_mean"))
            ).cast("decimal(30,12)")
        )
        .cast("double")
        .alias("_ss"),
        F.first("_mean").alias("_mean"),
        F.first("_n").alias("_n"),
    )
    sd = var.select(
        "_mean",
        F.when(
            F.col("_n") > 1, F.sqrt(F.col("_ss") / (F.col("_n") - 1))
        ).alias("_std"),
    )
    z = F.when(
        F.col("_std") > 0,
        (F.col("residual") - F.col("_mean")) / F.col("_std"),
    )
    return (
        with_mean.drop("_mean", "_n")
        .crossJoin(F.broadcast(sd))
        .where(z.isNotNull() & (F.abs(z) > threshold))
        .select(
            "i",
            "season_idx",
            F.round("y", 6).alias("y"),
            F.round("expected", 6).alias("expected"),
            F.round("residual", 6).alias("residual"),
            F.round(z, 6).alias("z"),
        )
    )


def hbos_scores(
    df,
    cols: "list[str]",
    id_col: str,
    n_bins: int = 16,
    top_k: int = 20,
):
    """HBOS — histogram-based outlier score (Goldstein & Dengel
    2012): the NATIVE multivariate anomaly detector that needs no ML
    runtime, completing the family between the univariate rules
    (z-score/IQR/MAD) and the sklearn-gated iForest/LOF arms. Each
    feature gets a fixed-width histogram between its global min/max;
    a row's score is Σ_features −log₁₀(density of its bin) —
    independence-assumption density estimation, which is exactly why
    it scales: ONE stats pass + ONE row pass + a bins×features
    broadcast grid, no pairwise work at any size.

    Determinism: bin edges derive from collected exact min/max
    re-entering as literals; densities are exact integer ratios;
    the per-row score is a FIXED left-associated sum over ``cols``
    order; the top-k cut orders by (score 6 dp DESC, id) — a total
    order. Zero-width features (constant columns) collapse to one
    bin and contribute 0. Rows with any NULL feature are excluded.

    Output: top-``top_k`` rows — (id, score 6 dp, one bin index per
    feature as ``bin_<col>`` int).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    cond = F.col(id_col).isNotNull()
    for c in cols:
        cond = cond & F.col(c).isNotNull()
    base = df.where(cond).select(
        F.col(id_col).alias("_id"),
        *[F.col(c).cast("double").alias(f"_x{i}")
          for i, c in enumerate(cols)],
    ).persist()
    try:
        stats = base.agg(
            F.count(F.lit(1)).alias("_n"),
            *[x for i in range(len(cols)) for x in (
                F.min(f"_x{i}").alias(f"_mn{i}"),
                F.max(f"_x{i}").alias(f"_mx{i}"),
            )],
        ).collect()[0]
        n = int(stats["_n"])
        if n == 0:
            raise ValueError("hbos_scores: no usable rows")
        binned = base
        for i in range(len(cols)):
            mn = float(stats[f"_mn{i}"])
            mx = float(stats[f"_mx{i}"])
            w = (mx - mn) / n_bins
            if w > 0:
                b = F.least(
                    F.lit(n_bins - 1),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (F.col(f"_x{i}") - F.lit(mn)) / F.lit(w)
                        ).cast("int"),
                    ),
                )
            else:
                b = F.lit(0)
            binned = binned.withColumn(f"_b{i}", b)
        binned0 = binned.drop(
            *[f"_x{i}" for i in range(len(cols))]
        ).persist()
        binned = binned0
        score = None
        for i in range(len(cols)):
            cnts = binned0.groupBy(f"_b{i}").agg(
                F.count(F.lit(1)).alias(f"_c{i}")
            )
            binned = binned.join(F.broadcast(cnts), f"_b{i}")
            term = -F.log10(F.col(f"_c{i}") / F.lit(float(n)))
            score = term if score is None else score + term
        out = (
            binned.select(
                F.col("_id").alias(id_col),
                F.round(score, 6).alias("score"),
                *[F.col(f"_b{i}").alias(f"bin_{c}")
                  for i, c in enumerate(cols)],
            )
            .orderBy(F.col("score").desc(), F.col(id_col).asc())
            .limit(int(top_k))
        )
        # materialize before releasing the upstream caches
        rows = out.collect()
        spark = df.sparkSession
        return spark.createDataFrame(rows, out.schema)
    finally:
        base.unpersist()
        try:
            binned0.unpersist()
        except Exception:
            pass
