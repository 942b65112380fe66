"""Windowed aggregation operators — batch AND streaming forms.

The reference is batch-incremental only (SURVEY §2.12); these extend its
vocabulary to true event-time windows. Each function works on a static
DataFrame (batch backfill / oracle-checkable) and on a streaming
DataFrame (same code path — Structured Streaming accepts identical
expressions; add ``withWatermark`` upstream for state cleanup).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_by: Sequence[str] = (),
    aggs: dict[str, str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Fixed windows: groupBy(window(ts, duration), *group_by).agg(...).

    Emits window_start/window_end as plain columns. Window boundaries are
    epoch-aligned (Spark semantics), so '1 hour' == date_trunc('hour').
    """
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    from metadata_etl_framework_spark.functions.aggregations import agg_expr

    exprs = [agg_expr(c, fn) for c, fn in (aggs or {"*": "count"}).items() if c != "*"]
    if not exprs:
        exprs = [F.count(F.lit(1)).alias("count")]
    out = df.groupBy(F.window(ts_col, duration), *group_by).agg(*exprs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *group_by,
        *[c for c in out.columns if c != "window" and c not in group_by],
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_by: Sequence[str] = (),
    aggs: dict[str, str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: window(ts, duration, slide). Each event lands
    in duration/slide windows — state grows accordingly in streaming."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    from metadata_etl_framework_spark.functions.aggregations import agg_expr

    exprs = [agg_expr(c, fn) for c, fn in (aggs or {}).items()] or [
        F.count(F.lit(1)).alias("count")
    ]
    out = df.groupBy(F.window(ts_col, duration, slide), *group_by).agg(*exprs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *group_by,
        *[c for c in out.columns if c != "window" and c not in group_by],
    )


def sessionize_batch(
    df: DataFrame,
    ts_col: str,
    partition_by: Sequence[str],
    gap: str = "30 minutes",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts when
    the gap since the previous event exceeds ``gap``.

    Adds ``session_id`` (1-based per partition key). The streaming
    equivalent is ``groupBy(session_window(ts, gap))`` — this batch form
    exists so sessions are oracle-checkable and backfillable with
    identical semantics.
    """
    order_cols = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(*partition_by).orderBy(*order_cols)
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull() | (F.col(ts_col).cast("timestamp") > prev_ts + gap_expr)
    ).cast("long")
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def streaming_file_source(
    spark, path: str, schema, fmt: str = "parquet", max_files_per_trigger: int = 10
):
    """readStream file source with bounded per-trigger intake."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .format(fmt)
        .load(path)
    )


def idempotent_foreach_batch(apply_fn, processed_log: str):
    """Exactly-once wrapper for ``foreachBatch`` sinks to non-transactional
    targets: micro-batch ids already recorded in ``processed_log`` are
    SKIPPED, so a post-failure replay (Structured Streaming re-delivers
    the last uncommitted batch) cannot double-apply side effects.

    The checkpoint guarantees at-least-once delivery to foreachBatch; the
    (batch_id → done) log upgrades that to effectively-once for sinks
    without their own transactional dedup (JDBC upserts are naturally
    idempotent; appends and per-record POSTs are not — wrap those).
    """
    import os

    def _wrapped(batch_df, batch_id: int) -> None:
        os.makedirs(processed_log, exist_ok=True)
        marker = os.path.join(processed_log, f"batch-{batch_id}.done")
        if os.path.exists(marker):
            return  # replayed batch: side effect already committed
        apply_fn(batch_df, batch_id)
        with open(marker, "w", encoding="utf-8") as f:
            f.write("done")

    return _wrapped


def foreach_batch_upsert(stream_df, target_path: str, keys: Sequence[str], checkpoint: str):
    """writeStream.foreachBatch → merge each micro-batch into a parquet
    target (Delta MERGE on clusters with Delta; join+union rewrite here).
    Reference CDC-apply parity: incremental_load_manager.py:397-466."""
    from pyspark.errors import AnalysisException

    from metadata_etl_framework_spark.incremental.merge import merge_upsert

    def _apply(batch_df, batch_id: int):
        spark = batch_df.sparkSession
        try:
            target = spark.read.parquet(target_path)
            merged = merge_upsert(target, batch_df, keys)
        except AnalysisException:
            # first batch: target doesn't exist yet. Any OTHER failure
            # (schema mismatch, merge error) must surface, not silently
            # replace the target with the bare batch.
            merged = batch_df
        # Can't overwrite a path that the merged plan is still reading
        # from, so stage to _next, then re-read and advance the target.
        # (On object stores/Delta this staging step becomes an atomic
        # commit; two sequential writes is the plain-parquet equivalent.)
        next_path = target_path + "_next"
        merged.write.mode("overwrite").parquet(next_path)
        spark.read.parquet(next_path).write.mode("overwrite").parquet(target_path)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    watermark: str = "10 minutes",
    within: str = "15 minutes",
    how: str = "inner",
    suffix: str = "_r",
) -> DataFrame:
    """Event-time-bounded stream-stream equi-join (click-through /
    enrichment pattern): both sides carry a watermark and the join is
    constrained to ``|left_ts - right_ts| <= within`` so the engine can
    expire buffered state — without the time bound a stream-stream join
    buffers both sides forever.

    Same expressions run in batch (no watermark applied) so the batch
    plan over identical input is the oracle for the streaming result.
    Right-side non-key columns are suffixed to keep the output schema
    collision-free. Outer joins emit the null-padded rows only once the
    watermark closes the window (streaming semantics; identical row set
    to the batch plan, later arrival).

    Scale: state per executor is bounded by (watermark + within) of
    event-time per key — independent of stream length.
    """
    keys = list(keys)
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    renames = {
        c: c + suffix for c in right.columns if c not in keys and c in left.columns
    }
    right = right.withColumnsRenamed(renames)
    r_ts = renames.get(right_ts, right_ts)
    l, r = left.alias("__l"), right.alias("__r")
    cond = None
    for k in keys:
        eq = F.col(f"__l.{k}") == F.col(f"__r.{k}")
        cond = eq if cond is None else (cond & eq)
    bound = (
        F.col(f"__r.{r_ts}")
        >= F.col(f"__l.{left_ts}") - F.expr(f"INTERVAL {within}")
    ) & (
        F.col(f"__r.{r_ts}")
        <= F.col(f"__l.{left_ts}") + F.expr(f"INTERVAL {within}")
    )
    joined = l.join(r, cond & bound, how)
    # single copy of the key columns
    return joined.select(
        *[F.col(f"__l.{k}").alias(k) for k in keys],
        *[F.col(f"__l.{c}") for c in left.columns if c not in keys],
        *[F.col(f"__r.{c}") for c in right.columns if c not in keys],
    )


def watermark_stream_dedup(
    df: DataFrame, key_cols: Sequence[str], ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Native streaming dedup with event-time-bounded state:
    ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only
    until the watermark passes it, so state is bounded by stream skew
    rather than key cardinality — the complement to
    ``stateful.stateful_stream_dedup`` (explicit processing-time
    timeout). Use this one when duplicates arrive close together in
    event time (retries, at-least-once sources); use the stateful one
    when duplicate keys can reappear arbitrarily late.

    Batch fallback: plain ``dropDuplicates`` over the keys — the oracle
    shape for the streaming result on identical input.
    """
    keys = list(key_cols)
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def foreach_batch_drift_monitor(
    stream_df,
    col: str,
    baseline_path: str,
    metrics_path: str,
    checkpoint: str,
    psi_alert: float = 0.2,
):
    """Per-micro-batch drift monitoring against a persisted
    :func:`~metadata_etl_framework_spark.quality.drift.save_drift_baseline`
    profile — the streaming form of the batch monitoring family: every
    batch is compared (PSI + binned KS, never rescanning reference
    history) and one metrics row per batch is appended to
    ``metrics_path``:

    ``(batch_id, n_rows, psi_total, ks_stat, ks_err_bound,
    psi_alerting)``

    ``psi_alerting`` applies the classic 0.2 "significant shift"
    threshold (override with ``psi_alert``). Batches with no non-null
    ``col`` values are skipped entirely (no distribution to test) — an
    all-null batch must not kill the query, and the comparators raise
    ``ValueError`` on a zero-value sample rather than emit NaN rows.
    The metrics sink is append-only parquet —
    idempotent replays can duplicate a batch row; wrap with
    :func:`idempotent_foreach_batch` when effectively-once matters.
    """
    from pyspark.sql import functions as F

    from metadata_etl_framework_spark.quality.drift import (
        ks_vs_baseline,
        psi_vs_baseline,
    )

    def _apply(batch_df, batch_id: int) -> None:
        # guard on VALUES, not rows: a batch with rows but zero
        # non-null `col` values has no distribution to test, and the
        # 0/0 PSI terms would come back null → float(None) would
        # terminate the whole streaming query on a plausible data
        # condition. limit(1) probe = early-exit scan, near-free.
        x = F.col(col).cast("double")
        if batch_df.where(x.isNotNull()).limit(1).count() == 0:
            return
        n = batch_df.count()
        psi = (
            psi_vs_baseline(batch_df, col, baseline_path)
            .select("psi_total")
            .first()["psi_total"]
        )
        ks = ks_vs_baseline(batch_df, col, baseline_path).first()
        spark = batch_df.sparkSession
        spark.createDataFrame(
            [(
                int(batch_id),
                int(n),
                float(psi),
                float(ks["ks_stat"]),
                float(ks["err_bound"]),
                bool(psi > psi_alert),
            )],
            "batch_id long, n_rows long, psi_total double, ks_stat double, "
            "ks_err_bound double, psi_alerting boolean",
        ).coalesce(1).write.mode("append").parquet(metrics_path)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def foreach_batch_score_monitor(
    stream_df,
    score_col: str,
    label_col: str,
    metrics_path: str,
    checkpoint: str,
    auc_floor: float = 0.7,
    ece_ceiling: float = 0.1,
    n_bins: int = 10,
):
    """Per-micro-batch model-score monitoring — the streaming form of
    the score_eval surface, the way :func:`foreach_batch_drift_monitor`
    streams the drift suite: every batch of (score, outcome) pairs is
    scored with the batch operators (``binary_auc``,
    ``expected_calibration_error``, ``brier_score``) and one metrics
    row per batch appends to ``metrics_path``:

    ``(batch_id, n_rows, n_pos, n_neg, auc, ece, brier, auc_alerting,
    ece_alerting)``

    ``auc_alerting`` fires when the batch AUC drops below ``auc_floor``
    (a degrading ranker); ``ece_alerting`` when calibration error
    exceeds ``ece_ceiling``. Single-class batches have NULL auc and do
    NOT alert on it (no ranking to judge). Batches with no usable
    (score, label) pairs are skipped entirely — a plausible data
    condition must not kill the query. Append-only parquet sink; wrap
    with :func:`idempotent_foreach_batch` when effectively-once
    matters.
    """
    from pyspark.sql import functions as F

    from metadata_etl_framework_spark.ops.evaluation import (
        binary_auc,
        brier_score,
        expected_calibration_error,
    )

    def _apply(batch_df, batch_id: int) -> None:
        usable = F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        if batch_df.where(usable).limit(1).count() == 0:
            return
        n = batch_df.count()
        a = binary_auc(batch_df, score_col, label_col).first()
        e = expected_calibration_error(
            batch_df, score_col, label_col, n_bins
        ).first()
        b = brier_score(batch_df, score_col, label_col).first()
        auc = a["auc"]
        ece = e["ece"]
        spark = batch_df.sparkSession
        spark.createDataFrame(
            [(
                int(batch_id),
                int(n),
                int(a["n_pos"]),
                int(a["n_neg"]),
                None if auc is None else float(auc),
                None if ece is None else float(ece),
                None if b["brier"] is None else float(b["brier"]),
                bool(auc is not None and auc < auc_floor),
                bool(ece is not None and ece > ece_ceiling),
            )],
            "batch_id long, n_rows long, n_pos long, n_neg long, "
            "auc double, ece double, brier double, "
            "auc_alerting boolean, ece_alerting boolean",
        ).coalesce(1).write.mode("append").parquet(metrics_path)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def foreach_batch_versioned_write(
    stream_df,
    table_path: str,
    checkpoint: str,
    processed_log: str | None = None,
):
    """Streaming sink into a VERSIONED parquet table
    (ops/layout.py::versioned_write): every micro-batch lands as a new
    immutable ``v=N`` snapshot with the manifest advanced atomically —
    so readers always see a complete version, time travel covers every
    batch boundary, and a bad batch rolls back in O(1)
    (rollback_version) instead of a restore job.

    Versioned writes are appends of new directories — NOT naturally
    idempotent — so the sink wraps :func:`idempotent_foreach_batch`
    (``processed_log`` defaults to a sibling of the checkpoint): a
    replayed batch after a crash is skipped instead of allocating a
    duplicate version. Single-writer discipline per table path, as
    documented on the manifest.
    """
    import os

    from metadata_etl_framework_spark.ops.layout import versioned_write

    log = processed_log or os.path.join(checkpoint, "_versioned_done")

    def _apply(batch_df, batch_id: int) -> None:
        versioned_write(batch_df, table_path)

    return (
        stream_df.writeStream.foreachBatch(
            idempotent_foreach_batch(_apply, log)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def foreach_batch_hll_rollup(
    stream_df,
    ts_col: str,
    key_col: str,
    sketch_path: str,
    checkpoint: str,
    bucket: str = "1 hour",
    m: int = 64,
):
    """Streaming incremental distinct-count rollup: every micro-batch
    reduces to its windowed HLL register fragments
    (ops/sketch.py::windowed_hll_rollup — ≤ m rows per touched
    bucket) and APPENDS them to ``sketch_path``; readers merge
    fragments at query time (:func:`read_hll_rollup`) and estimate
    ranges with ops/sketch.py::hll_rollup_estimate.

    The crash-replay story needs NO processed-batch log: the merge is
    groupBy.MAX, which is idempotent, so a replayed batch re-appends
    fragments that change nothing — the sink is effectively-once BY
    ALGEBRA, unlike count/sum rollups which double-add on replay.
    Per-batch work is one groupBy over the batch (tiny); the sketch
    table grows by ≤ m rows per (batch, touched bucket) and compacts
    to ≤ m rows per bucket on any rewrite of the merged view.
    """
    from metadata_etl_framework_spark.ops.sketch import (
        windowed_hll_rollup,
    )

    def _apply(batch_df, batch_id: int) -> None:
        frag = windowed_hll_rollup(batch_df, ts_col, key_col, bucket, m)
        frag.write.mode("append").parquet(sketch_path)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def read_hll_rollup(spark, sketch_path: str):
    """Merged view of a :func:`foreach_batch_hll_rollup` sketch table:
    fragments collapse with groupBy((bucket, register)).max into the
    canonical ≤ m-rows-per-bucket rollup — the same shape
    ops/sketch.py::windowed_hll_rollup produces in batch, so the two
    pipelines share every downstream estimator."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(sketch_path)
        .groupBy("bucket_start", "register")
        .agg(F.max("max_rank").alias("max_rank"))
    )


def foreach_batch_kll_rollup(
    stream_df,
    ts_col: str,
    value_col: str,
    sketch_path: str,
    checkpoint: str,
    bucket: str = "1 hour",
    k: int = 64,
):
    """Streaming incremental QUANTILE rollup — the KLL-family
    companion of :func:`foreach_batch_hll_rollup`: every micro-batch
    reduces to its per-bucket ≤ k-item weighted summaries
    (ops/sketch.py::windowed_kll_rollup) and lands under
    ``sketch_path``; readers bag-union fragments at query time
    (:func:`read_kll_rollup`) and probe ranges with
    ops/sketch.py::kll_rollup_quantiles.

    Crash-replay: HLL fragments merge with MAX (idempotent by
    algebra), but KLL weights SUM — a replayed batch would
    double-count. The sink therefore partitions fragments by
    ``batch_id`` and writes with DYNAMIC partition overwrite, so a
    replay rewrites its own partition in place — effectively-once by
    LAYOUT (the idempotent-sink discipline, inlined)."""
    from metadata_etl_framework_spark.ops.sketch import (
        windowed_kll_rollup,
    )

    def _apply(batch_df, batch_id: int) -> None:
        frag = windowed_kll_rollup(
            batch_df, ts_col, value_col, bucket, k
        ).withColumn("batch_id", F.lit(int(batch_id)))
        (
            frag.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(sketch_path)
        )

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def read_kll_rollup(spark, sketch_path: str):
    """Merged view of a :func:`foreach_batch_kll_rollup` sketch table:
    fragments bag-union with groupBy((bucket, value)).sum(weight) into
    the canonical per-bucket rollup — the same shape
    ops/sketch.py::windowed_kll_rollup produces in batch, so the two
    pipelines share kll_rollup_quantiles and every other reader."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(sketch_path)
        .groupBy("bucket_start", "value")
        .agg(F.sum("weight").alias("weight"))
    )


def foreach_batch_forecast_monitor(
    stream_df,
    ts_col: str,
    value_col: str,
    metrics_path: str,
    checkpoint: str,
    bucket_seconds: int = 3600,
    season: int = 24,
    smape_ceiling: float = 0.5,
    mase_ceiling: float = 1.0,
):
    """Per-micro-batch forecast-baseline monitoring — the streaming
    form of ``forecast_baseline_eval``, the way
    :func:`foreach_batch_score_monitor` streams the score-eval suite:
    every batch's metric series is backtested against its own
    seasonal-naive forecast and one metrics row per batch appends to
    ``metrics_path``:

    ``(batch_id, n_rows, season, n_forecasts, mae, rmse, smape, mase,
    smape_alerting, mase_alerting)``

    ``smape_alerting`` fires when the seasonal structure stops
    predicting the series (sMAPE above the ceiling); ``mase_alerting``
    when persistence beats seasonality (MASE above 1, or the
    configured ceiling) — the "your daily cycle just broke" readout a
    drift monitor can't give because the VALUES may still be in range.
    Batches whose series is shorter than the season produce
    n_forecasts = 0 with NULL metrics and do not alert; batches with
    no usable rows are skipped. Append-only parquet sink; wrap with
    :func:`idempotent_foreach_batch` when effectively-once matters.
    """
    from pyspark.sql import functions as F

    from metadata_etl_framework_spark.functions.aggregations import (
        forecast_baseline_eval,
    )

    def _apply(batch_df, batch_id: int) -> None:
        usable = F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
        if batch_df.where(usable).limit(1).count() == 0:
            return
        n = batch_df.count()
        r = forecast_baseline_eval(
            batch_df, ts_col, value_col,
            bucket_seconds=bucket_seconds, season=season,
        ).first()
        smape, mase = r["smape"], r["mase"]
        spark = batch_df.sparkSession
        spark.createDataFrame(
            [(
                int(batch_id),
                int(n),
                int(r["season"]),
                int(r["n_forecasts"]),
                None if r["mae"] is None else float(r["mae"]),
                None if r["rmse"] is None else float(r["rmse"]),
                None if smape is None else float(smape),
                None if mase is None else float(mase),
                bool(smape is not None and smape > smape_ceiling),
                bool(mase is not None and mase > mase_ceiling),
            )],
            "batch_id long, n_rows long, season int, n_forecasts long, "
            "mae double, rmse double, smape double, mase double, "
            "smape_alerting boolean, mase_alerting boolean",
        ).coalesce(1).write.mode("append").parquet(metrics_path)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def _msprt_always_valid_p(
    per_arm: "dict[str, tuple[int, int]]", tau: float
) -> float:
    """Closed-form mSPRT always-valid p from cumulative per-arm counts
    ``{variant: (n, conversions)}`` — the arithmetic half of
    ops/retention.py::ab_always_valid_p (same pooled-variance mixture
    LR, identical double op order, same HALF_UP 6-dp rounding), lifted
    out so the streaming monitor can apply it to RUNNING totals
    instead of a single frame. Degenerate inputs (missing arm, empty
    arm, zero pooled variance) report 1.0 — no extractable evidence.
    """
    import math
    from decimal import ROUND_HALF_UP, Decimal

    if len(per_arm) != 2:
        return 1.0
    (na, ca), (nb, cb) = [per_arm[k] for k in sorted(per_arm)]
    if na == 0 or nb == 0:
        return 1.0
    pooled = (ca + cb) / (na + nb)
    v = pooled * (1.0 - pooled) * (1.0 / na + 1.0 / nb)
    if v <= 0:
        return 1.0
    theta = ca / na - cb / nb
    lr = math.sqrt(v / (v + tau)) * math.exp(
        theta * theta * tau / (2.0 * v * (v + tau))
    )
    p = min(1.0, 1.0 / lr)
    return float(
        Decimal(repr(p)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )


def foreach_batch_experiment_monitor(
    stream_df,
    variant_col: str,
    converted_col: str,
    unit_col: str,
    metrics_path: str,
    checkpoint: str,
    min_units_per_arm: int = 10,
    anytime_tau: "float | None" = None,
):
    """Per-micro-batch A/B experiment monitoring — the streaming form of
    the experiment_eval surface, the way
    :func:`foreach_batch_score_monitor` streams score_eval: every
    batch's events are reduced with the batch operator
    (ops/retention.py::ab_test_proportions) and one metrics row per
    batch appends to ``metrics_path``:

    ``(batch_id, variant_a, n_a, rate_a, variant_b, n_b, rate_b,
    z_score, significant_95, underpowered[, always_valid_p])``

    ``underpowered`` flags batches where either arm has fewer than
    ``min_units_per_arm`` units — a significant z on a tiny batch is
    noise, and the flag keeps dashboards honest about it. Batches
    without exactly two variants present are skipped entirely (a
    ramp-up or holdout-only batch is a plausible condition, not a
    query-killer). Append-only parquet sink; wrap with
    :func:`idempotent_foreach_batch` when effectively-once matters.

    ``anytime_tau`` appends the mSPRT always-valid p (Johari et al.,
    mixing variance τ) computed over the CUMULATIVE per-arm counts
    since stream start, not this batch alone: per-batch per-arm
    (n, conversions) rows accumulate in a compact parquet state dir
    next to ``metrics_path`` (``<metrics_path>_avstate``), and every
    batch recomputes the closed-form mixture LR from the running
    totals. Anytime validity holds for the mixture LR over the
    accumulated data — a sequence of independent per-batch p-values
    each read at 0.05 would re-inflate the type-I error the column
    exists to control. Assumes each unit's exposure arrives in a
    single micro-batch (dedupe upstream with
    :func:`streaming_dedup_watermark` otherwise — a unit split across
    batches is counted once per batch).

    NOTE: per-batch z readouts answer "is the experiment healthy in
    this window"; the END-OF-EXPERIMENT decision must come from the
    batch operators over the full exposure table — peeking at
    streaming z-scores inflates false positives (use
    ops/stats.py::ab_power and a fixed-horizon analysis), which is
    exactly what the ``always_valid_p`` column exists to avoid.
    """
    from pyspark.sql import functions as F

    from metadata_etl_framework_spark.ops.retention import (
        ab_test_proportions,
    )

    def _apply(batch_df, batch_id: int) -> None:
        usable = (
            F.col(variant_col).isNotNull() & F.col(unit_col).isNotNull()
        )
        present = [
            r[0]
            for r in batch_df.where(usable)
            .select(F.col(variant_col).cast("string"))
            .distinct()
            .limit(3)
            .collect()
        ]
        if len(present) != 2:
            return
        try:
            r = ab_test_proportions(
                batch_df.where(usable), variant_col, converted_col,
                unit_col,
            ).first()
        except ValueError:
            # the two-variant precheck above runs BEFORE the operator's
            # cross-variant-contamination filter: a batch where
            # dropping contaminated units empties one arm raises inside
            # the operator — a plausible ramp-up shape, so skip the
            # batch (the docstring contract), never kill the stream
            return
        if r is None or r["rate_a"] is None or r["rate_b"] is None:
            # an arm whose converted values are all null reports a null
            # rate — no readout to publish for this batch
            return
        spark = batch_df.sparkSession
        row = [
            int(batch_id),
            r["variant_a"], int(r["n_a"]), float(r["rate_a"]),
            r["variant_b"], int(r["n_b"]), float(r["rate_b"]),
            float(r["z_score"]) if r["z_score"] is not None
            else 0.0,
            bool(r["significant_95"]),
            bool(
                min(int(r["n_a"]), int(r["n_b"]))
                < int(min_units_per_arm)
            ),
        ]
        schema = (
            "batch_id long, variant_a string, n_a long, rate_a double, "
            "variant_b string, n_b long, rate_b double, z_score double, "
            "significant_95 boolean, underpowered boolean"
        )
        if anytime_tau is not None:
            # accumulate this batch's per-arm (n, conversions) into the
            # state dir, then recompute the mixture LR over the RUNNING
            # totals — the quantity whose sup-over-time type-I bound
            # makes the column continuously pollable (see docstring)
            state_path = metrics_path.rstrip("/") + "_avstate"
            (
                batch_df.where(usable)
                .groupBy(F.col(unit_col).alias("unit"))
                .agg(
                    F.max(F.col(variant_col).cast("string")).alias(
                        "variant"
                    ),
                    F.countDistinct(
                        F.col(variant_col).cast("string")
                    ).alias("_nv"),
                    F.max(F.col(converted_col).cast("int")).alias(
                        "conv"
                    ),
                )
                .where(F.col("_nv") == 1)
                .groupBy("variant")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("conv").alias("c"),
                )
                .withColumn("batch_id", F.lit(int(batch_id)))
                .coalesce(1)
                .write.mode("append")
                .parquet(state_path)
            )
            cum = {
                s["variant"]: (int(s["n"]), int(s["c"] or 0))
                for s in spark.read.parquet(state_path)
                .where(
                    F.col("variant").isin(
                        [r["variant_a"], r["variant_b"]]
                    )
                )
                .groupBy("variant")
                .agg(F.sum("n").alias("n"), F.sum("c").alias("c"))
                .collect()
            }
            row.append(
                _msprt_always_valid_p(cum, float(anytime_tau))
            )
            schema += ", always_valid_p double"
        spark.createDataFrame([tuple(row)], schema).coalesce(
            1
        ).write.mode("append").parquet(metrics_path)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
