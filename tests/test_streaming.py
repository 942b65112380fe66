"""True Structured Streaming tests: file source → watermark → event-time
windows → sink, with availableNow (bounded) triggers so they terminate.

The streaming functions are the SAME expressions used in the batch
entries (streaming/windows.py) — these tests prove they run under the
streaming engine and agree with the batch results (the streaming
correctness oracle is the batch plan over identical input)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_etl_framework_spark.sources.tables import load_table
from metadata_etl_framework_spark.streaming.windows import (
    sessionize_batch,
    streaming_file_source,
    tumbling_window_agg,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_src(spark_mod, tmp_path_factory):
    """events table split into several parquet files (micro-batch feed)."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    ev = load_table(spark_mod, SF, "events")
    ev.repartition(4).write.mode("overwrite").parquet(path)
    return path


@pytest.fixture(scope="module")
def spark_mod():
    from metadata_etl_framework_spark.session import get_spark

    return get_spark(app_name="streaming-tests", shuffle_partitions=8)


def test_streaming_tumbling_agg_matches_batch(spark_mod, stream_src, tmp_path):
    spark = spark_mod
    batch = spark.read.parquet(stream_src)
    schema = batch.schema

    stream = streaming_file_source(spark, stream_src, schema, max_files_per_trigger=2)
    assert stream.isStreaming
    agg = tumbling_window_agg(
        stream, "ts", "1 hour", group_by=("event_type",),
        aggs={"value": "sum"}, watermark="2 hours",
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("tumbling_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql(
        "SELECT window_start, event_type, value_sum FROM tumbling_test"
    )
    expected = tumbling_window_agg(
        batch, "ts", "1 hour", group_by=("event_type",), aggs={"value": "sum"}
    ).select("window_start", "event_type", "value_sum")

    # watermark in append mode holds back only windows newer than
    # max_event_time - delay; with availableNow all input is consumed and
    # the final watermark passes every closed window, so counts match the
    # batch result exactly except possibly the last open window(s)
    g = {tuple(r) for r in got.collect()}
    e = {tuple(r) for r in expected.collect()}
    assert g <= e
    # append mode emits a window only once the watermark passes its end:
    # windows starting after max_event_time - delay(2h) - window(1h) are
    # legitimately withheld at end-of-input; everything older must match.
    import datetime as dt

    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - dt.timedelta(hours=3)
    missing = e - g
    assert all(r[0] >= cutoff for r in missing), missing
    assert len(g) > 0


def test_streaming_foreach_batch_counts(spark_mod, stream_src, tmp_path):
    spark = spark_mod
    batch_counts: list[int] = []
    schema = spark.read.parquet(stream_src).schema

    stream = streaming_file_source(spark, stream_src, schema, max_files_per_trigger=1)

    def _collect(bdf, bid):
        batch_counts.append(bdf.count())

    q = (
        stream.writeStream.foreachBatch(_collect)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sum(batch_counts) == spark.read.parquet(stream_src).count()
    assert len(batch_counts) >= 2  # maxFilesPerTrigger bounded the batches


def test_sessionize_batch_equals_sql_islands(spark_mod):
    """sessionize_batch (gaps-and-islands) sanity: session ids increase and
    respect the gap; total sessions equals the distinct-boundary count."""
    spark = spark_mod
    ev = load_table(spark, SF, "events")
    sess = sessionize_batch(ev, "ts", ["user_id"], gap="30 minutes",
                            order_tiebreak="event_id")
    per_user = sess.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bad = per_user.filter(
        (F.col("n_sessions") < 1) | (F.col("n_sessions") > F.col("n_events"))
    )
    assert bad.count() == 0


def test_watermark_stream_dedup_matches_batch(spark_mod, stream_src, tmp_path):
    """Duplicate event_ids injected across micro-batch files must collapse
    to one row each under dropDuplicatesWithinWatermark, agreeing with the
    batch dropDuplicates key set."""
    from metadata_etl_framework_spark.streaming.windows import (
        watermark_stream_dedup,
    )

    spark = spark_mod
    dup_path = str(tmp_path / "dup_events")
    base = spark.read.parquet(stream_src).select("event_id", "ts", "value")
    # every row twice, spread over 4 files → duplicates land in
    # different micro-batches (max_files_per_trigger=1)
    base.unionByName(base).repartition(4).write.mode("overwrite").parquet(dup_path)
    schema = spark.read.parquet(dup_path).schema

    stream = streaming_file_source(spark, dup_path, schema, max_files_per_trigger=1)
    # the corpus spans days and files replay out of event-time order, so
    # the watermark must exceed the span — otherwise "late" rows are
    # dropped outright (watermark semantics), not deduplicated
    dedup = watermark_stream_dedup(stream, ["event_id"], "ts", "90 days")
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_dedup_test")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM wm_dedup_test")
    batch_ids = spark.read.parquet(dup_path).dropDuplicates(["event_id"])
    assert got.count() == batch_ids.count()
    assert got.dropDuplicates(["event_id"]).count() == got.count()

    # batch fallback routes to plain dropDuplicates
    batch_out = watermark_stream_dedup(
        spark.read.parquet(dup_path), ["event_id"], "ts"
    )
    assert batch_out.count() == batch_ids.count()


def test_stream_stream_join_matches_batch(spark_mod, tmp_path):
    """Click-through join: 'view' events joined to 'purchase' events of
    the same user within 30 minutes — streamed result (two file streams,
    availableNow) must equal the batch join over identical input."""
    from metadata_etl_framework_spark.streaming.windows import stream_stream_join

    spark = spark_mod
    ev = load_table(spark, SF, "events").select("event_id", "ts", "user_id", "event_type")
    views = ev.filter(F.col("event_type") == "view")
    purchases = ev.filter(F.col("event_type") == "purchase")
    vp, pp = str(tmp_path / "views"), str(tmp_path / "purch")
    views.repartition(3).write.parquet(vp)
    purchases.repartition(3).write.parquet(pp)

    b_l, b_r = spark.read.parquet(vp), spark.read.parquet(pp)
    expected = stream_stream_join(
        b_l, b_r, ["user_id"], "ts", "ts", within="30 minutes"
    )
    exp_rows = {tuple(r) for r in expected.collect()}
    assert exp_rows, "fixture should produce at least one joined pair"

    s_l = streaming_file_source(spark, vp, b_l.schema, max_files_per_trigger=1)
    s_r = streaming_file_source(spark, pp, b_r.schema, max_files_per_trigger=1)
    # watermark must exceed the feed's event-time disorder (unordered
    # parquet splits) for exact batch parity — nothing may be "late"
    joined = stream_stream_join(
        s_l, s_r, ["user_id"], "ts", "ts", watermark="90 days", within="30 minutes"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_test")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got_rows = {tuple(r) for r in spark.sql("SELECT * FROM ssj_test").collect()}
    assert got_rows == exp_rows
    assert sorted(expected.columns) == sorted(
        spark.table("ssj_test").columns
    )


def test_quality_score_runs_on_streams(spark_mod, tmp_path):
    """The curation projections are stream-safe as-is: quality_score over
    a file stream equals the batch computation on identical input (a
    pure projection needs no watermark or output-mode ceremony)."""
    from metadata_etl_framework_spark.ops.text import quality_score

    spark = spark_mod
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "the cat sat on the mat and it is a fine day for all"),
         (2, "{}[]()!!;;::##"),
         (3, None)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = streaming_file_source(spark, src, schema, max_files_per_trigger=1)
    q = (
        quality_score(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_quality")
        .option("checkpointLocation", str(tmp_path / "ckq"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: r.quality_score
           for r in spark.sql("SELECT * FROM stream_quality").collect()}
    expect = {r.doc_id: r.quality_score
              for r in quality_score(spark.read.parquet(src)).collect()}
    assert got == expect and len(got) == 3


def test_drift_suite_in_foreach_batch(spark_mod, tmp_path):
    """Drift monitoring on a stream: drift_suite is multi-aggregation
    (not directly stream-expressible), so the streaming arm runs it per
    micro-batch under foreachBatch against a static reference — the
    canonical pattern for monitoring statistics. Each batch's numbers
    must equal the batch-mode computation on the same rows."""
    from metadata_etl_framework_spark.quality.drift import drift_suite

    spark = spark_mod
    src = str(tmp_path / "ev")
    ref = spark.createDataFrame(
        [(float(i % 50), "a" if i % 2 else "b") for i in range(200)],
        "value double, kind string",
    )
    cur_rows = [(float(i % 50 + 10), "a") for i in range(100)]
    spark.createDataFrame(cur_rows, "value double, kind string") \
        .coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    results = []

    def per_batch(batch_df, batch_id):
        rows = drift_suite(ref, batch_df, ["value"], ["kind"]).collect()
        results.extend((r.column, r.metric, r.value) for r in rows)

    stream = streaming_file_source(spark, src, schema, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", str(tmp_path / "ckd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    expect = {
        (r.column, r.metric): r.value
        for r in drift_suite(
            ref, spark.read.parquet(src), ["value"], ["kind"]
        ).collect()
    }
    assert {(c, m): v for c, m, v in results} == expect
    assert expect[("value", "ks")] > 0.0


def test_streaming_curation_pipeline_e2e(spark_mod, tmp_path):
    """End-to-end streaming curation: file stream → normalize →
    funnel filter → exact fingerprint dedup (watermark-bounded state) →
    foreachBatch upsert into a curated parquet table. The final table
    must equal the batch-mode pipeline on the same input — curation is
    engine-mode-agnostic end to end."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from metadata_etl_framework_spark.incremental.merge import merge_upsert
    from metadata_etl_framework_spark.ops.curation import apply_funnel
    from metadata_etl_framework_spark.ops.text import fingerprint, normalize_text
    from metadata_etl_framework_spark.streaming.windows import (
        foreach_batch_upsert,
        streaming_file_source,
        watermark_stream_dedup,
    )

    spark = spark_mod
    src = str(tmp_path / "incoming")
    rows = [
        (1, "Hello   WORLD this is fine", "en", datetime(2024, 1, 1, 0, 0)),
        (2, "hello world this is fine", "en", datetime(2024, 1, 1, 0, 1)),  # dup of 1 post-normalize
        (3, "too short", "en", datetime(2024, 1, 1, 0, 2)),
        (4, "ceci n'est pas anglais mais assez long quand même", "fr",
         datetime(2024, 1, 1, 0, 3)),
        (5, "a genuinely novel document with enough words to pass", "en",
         datetime(2024, 1, 1, 0, 4)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, ts timestamp"
    ).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stages = [
        ("min_words", "size(split(trim(text_normalized), ' ')) >= 4"),
        ("lang", "lang = 'en'"),
    ]

    def curate(df):
        normalized = normalize_text(df)
        kept = apply_funnel(normalized, stages)
        return fingerprint(kept, "text_normalized").select(
            "doc_id", "fingerprint", "text_normalized", "ts"
        )

    target = str(tmp_path / "curated")
    stream = curate(
        streaming_file_source(spark, src, schema, max_files_per_trigger=1)
    )
    deduped = watermark_stream_dedup(
        stream, ["fingerprint"], "ts", watermark="1 hour"
    )
    writer = foreach_batch_upsert(
        deduped, target, keys=["fingerprint"],
        checkpoint=str(tmp_path / "ck"),
    )
    writer.start().awaitTermination(180)

    got = spark.read.parquet(target)
    # batch equivalent: curate, then keep first doc per fingerprint
    batch = curate(spark.read.parquet(src))
    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint").orderBy("ts", "doc_id")
    want = (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    got_set = {(r.doc_id, r.fingerprint) for r in got.collect()}
    want_set = {(r.doc_id, r.fingerprint) for r in want.collect()}
    assert got_set == want_set
    assert {d for d, _ in got_set} == {1, 5}  # dup, short, non-en dropped


def test_foreach_batch_drift_monitor_against_baseline(spark_mod, tmp_path):
    """Round-7: streaming drift monitor — every micro-batch compared to
    a persisted baseline (PSI + binned KS, reference never rescanned),
    one metrics row per batch; values equal the batch-mode comparators
    on the same rows."""
    from metadata_etl_framework_spark.quality.drift import (
        ks_vs_baseline,
        psi_vs_baseline,
        save_drift_baseline,
    )
    from metadata_etl_framework_spark.streaming.windows import (
        foreach_batch_drift_monitor,
    )

    spark = spark_mod
    ref = spark.createDataFrame(
        [(float(i % 40),) for i in range(400)], "value double"
    )
    base = str(tmp_path / "baseline")
    save_drift_baseline(ref, "value", base, n_bins=16)

    src = str(tmp_path / "stream")
    # two micro-batches: in-distribution, then shifted
    spark.createDataFrame([(float(i % 40),) for i in range(100)],
                          "value double").coalesce(1).write.parquet(src)
    spark.createDataFrame([(float(i % 40 + 100),) for i in range(100)],
                          "value double").coalesce(1).write.mode(
        "append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = streaming_file_source(spark, src, schema, max_files_per_trigger=1)
    metrics = str(tmp_path / "metrics")
    q = foreach_batch_drift_monitor(
        stream, "value", base, metrics, str(tmp_path / "ck")
    ).start()
    q.awaitTermination(120)

    rows = sorted(
        spark.read.parquet(metrics).collect(), key=lambda r: r.psi_total
    )
    assert len(rows) == 2 and all(r.n_rows == 100 for r in rows)
    low, high = rows
    assert not low.psi_alerting and high.psi_alerting  # shift flagged
    # streaming numbers == batch comparators on one batch's rows
    shifted = spark.createDataFrame(
        [(float(i % 40 + 100),) for i in range(100)], "value double"
    )
    want_psi = psi_vs_baseline(shifted, "value", base).first()["psi_total"]
    want_ks = ks_vs_baseline(shifted, "value", base).first()
    assert high.psi_total == want_psi
    assert (high.ks_stat, high.ks_err_bound) == (
        want_ks["ks_stat"], want_ks["err_bound"]
    )


def test_foreach_batch_versioned_write_time_travel(spark_mod, tmp_path):
    """Round-8: streaming micro-batches land as immutable versions —
    each batch a new v=N, manifest-resolved current, pinned time travel
    across batch boundaries, and a crash-replayed batch does NOT
    allocate a duplicate version (idempotent wrapper)."""
    from metadata_etl_framework_spark.ops.layout import (
        current_version,
        read_version,
    )
    from metadata_etl_framework_spark.streaming.windows import (
        foreach_batch_versioned_write,
    )

    spark = spark_mod
    src = str(tmp_path / "stream")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string") \
        .coalesce(1).write.parquet(src)
    spark.createDataFrame([(3, "c")], "id long, v string") \
        .coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    table = str(tmp_path / "table")
    ck = str(tmp_path / "ck")
    stream = streaming_file_source(spark, src, schema, max_files_per_trigger=1)
    q = foreach_batch_versioned_write(stream, table, ck).start()
    q.awaitTermination(120)

    assert current_version(spark, table) == 2
    counts = {v: read_version(spark, table, v).count() for v in (1, 2)}
    assert sorted(counts.values()) == [1, 2]  # one batch per version

    # replay the SAME batches (fresh checkpoint, same processed log):
    # the idempotent log must prevent duplicate versions
    stream2 = streaming_file_source(spark, src, schema, max_files_per_trigger=1)
    q2 = foreach_batch_versioned_write(
        stream2, table, str(tmp_path / "ck2"),
        processed_log=str(tmp_path / "ck" / "_versioned_done"),
    ).start()
    q2.awaitTermination(120)
    assert current_version(spark, table) == 2  # nothing re-applied


def test_foreach_batch_score_monitor_alerts_and_batch_parity(spark_mod, tmp_path):
    """Round-10: streaming score monitor — one metrics row per
    micro-batch; a well-ranked batch passes, an anti-ranked batch
    trips the AUC floor; streaming numbers equal the batch operators
    on the same rows; an all-null batch is skipped."""
    from metadata_etl_framework_spark.ops.evaluation import (
        binary_auc,
        brier_score,
        expected_calibration_error,
    )
    from metadata_etl_framework_spark.streaming.windows import (
        foreach_batch_score_monitor,
    )

    spark = spark_mod
    good = [(0.05 + 0.9 * (i % 2), i % 2) for i in range(60)]
    bad = [(0.95 - 0.9 * (i % 2), i % 2) for i in range(40)]
    src = str(tmp_path / "scores")
    spark.createDataFrame(good, "s double, y int").coalesce(1).write.parquet(src)
    spark.createDataFrame(bad, "s double, y int").coalesce(1).write.mode(
        "append").parquet(src)
    spark.createDataFrame(
        [(None, None)] * 5, "s double, y int"
    ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = streaming_file_source(spark, src, schema, max_files_per_trigger=1)
    metrics = str(tmp_path / "metrics")
    q = foreach_batch_score_monitor(
        stream, "s", "y", metrics, str(tmp_path / "ck")
    ).start()
    q.awaitTermination(120)

    rows = sorted(spark.read.parquet(metrics).collect(),
                  key=lambda r: -r.auc)
    assert len(rows) == 2  # the all-null batch appended nothing
    top, bot = rows
    assert top.auc == 1.0 and not top.auc_alerting
    assert bot.auc == 0.0 and bot.auc_alerting
    bad_df = spark.createDataFrame(bad, "s double, y int")
    assert bot.ece == expected_calibration_error(
        bad_df, "s", "y").first()["ece"]
    assert bot.brier == brier_score(bad_df, "s", "y").first()["brier"]
    assert (bot.n_pos, bot.n_neg) == tuple(
        binary_auc(bad_df, "s", "y").first()[:2]
    )


def test_foreach_batch_hll_rollup_batch_parity_and_replay(spark_mod, tmp_path):
    """Round-10: streaming distinct-count sketch — fragments appended
    per micro-batch merge to EXACTLY the batch-built rollup, and
    re-appending a batch's fragments changes nothing (max-merge
    idempotence = effectively-once without a processed log)."""
    import pandas as pd

    from metadata_etl_framework_spark.ops.sketch import (
        hll_rollup_estimate,
        windowed_hll_rollup,
    )
    from metadata_etl_framework_spark.streaming.windows import (
        foreach_batch_hll_rollup,
        read_hll_rollup,
        streaming_file_source,
    )

    spark = spark_mod
    rows1 = [(i % 300, f"2024-03-01 0{i % 8}:15:00") for i in range(500)]
    rows2 = [(i % 450 + 100, f"2024-03-01 0{i % 8}:45:00")
             for i in range(400)]
    src = str(tmp_path / "ev")
    for chunk in (rows1, rows2):
        df = spark.createDataFrame(chunk, "uid long, tss string").select(
            "uid", F.to_timestamp("tss").alias("ts")
        )
        df.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    sketch = str(tmp_path / "sketch")
    stream = streaming_file_source(spark, src, schema,
                                   max_files_per_trigger=1)
    q = foreach_batch_hll_rollup(
        stream, "ts", "uid", sketch, str(tmp_path / "ck")
    ).start()
    q.awaitTermination(120)

    merged = read_hll_rollup(spark, sketch)
    full = spark.read.parquet(src)
    batch_rollup = windowed_hll_rollup(full, "ts", "uid", "1 hour", m=64)

    def norm(df):
        p = df.toPandas()
        p["bucket_start"] = p["bucket_start"].astype("datetime64[us]")
        p = p.reindex(sorted(p.columns), axis=1)
        return p.sort_values(list(p.columns)).reset_index(drop=True)

    pd.testing.assert_frame_equal(norm(merged), norm(batch_rollup))

    # replay: append one batch's fragments AGAIN -> merged view unchanged
    frag = windowed_hll_rollup(
        spark.createDataFrame(rows1, "uid long, tss string").select(
            "uid", F.to_timestamp("tss").alias("ts")
        ),
        "ts", "uid", "1 hour", m=64,
    )
    frag.write.mode("append").parquet(sketch)
    pd.testing.assert_frame_equal(
        norm(read_hll_rollup(spark, sketch)), norm(batch_rollup)
    )

    # and the estimator runs off the merged streaming view
    est = hll_rollup_estimate(read_hll_rollup(spark, sketch), m=64)
    assert est.collect()[0]["estimate"] > 0


def test_foreach_batch_forecast_monitor_alerts_and_batch_parity(
    spark_mod, tmp_path
):
    """Round-10 second sweep: streaming forecast monitor — one metrics
    row per micro-batch; an exactly periodic batch passes, a
    periodicity-broken batch trips the sMAPE/MASE ceilings; streaming
    numbers equal the batch operator on the same rows; a too-short
    series appends a no-alert row; an all-null batch is skipped."""
    import datetime as dt

    from metadata_etl_framework_spark.functions.aggregations import (
        forecast_baseline_eval,
    )
    from metadata_etl_framework_spark.streaming.windows import (
        foreach_batch_forecast_monitor,
        streaming_file_source,
    )

    spark = spark_mod
    base = dt.datetime(2026, 3, 1)
    cyc = [1.0, 5.0, 2.0, 8.0]
    periodic = [(base + dt.timedelta(hours=h), cyc[h % 4])
                for h in range(40)]
    # period broken: alternate series with a different cycle length
    broken = [(base + dt.timedelta(days=2, hours=h),
               float((h % 7) * 3 + 1)) for h in range(40)]
    short = [(base + dt.timedelta(days=4, hours=h), 1.0)
             for h in range(3)]
    nulls = [(None, None)] * 4
    src = str(tmp_path / "series")
    for chunk in (periodic, broken, short, nulls):
        spark.createDataFrame(
            chunk, "ts timestamp, v double"
        ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = streaming_file_source(
        spark, src, schema, max_files_per_trigger=1
    )
    metrics = str(tmp_path / "metrics")
    q = foreach_batch_forecast_monitor(
        stream, "ts", "v", metrics, str(tmp_path / "ck"),
        bucket_seconds=3600, season=4, smape_ceiling=0.3,
    ).start()
    q.awaitTermination(120)

    rows = spark.read.parquet(metrics).collect()
    assert len(rows) == 3  # the all-null batch appended nothing
    by_nf = sorted(rows, key=lambda r: r.n_forecasts)
    empty, per, brk = by_nf[0], *sorted(
        by_nf[1:], key=lambda r: r.smape
    )
    assert empty.n_forecasts == 0 and not empty.smape_alerting
    assert per.smape == 0.0 and not per.smape_alerting
    assert not per.mase_alerting and per.mase == 0.0
    assert brk.smape_alerting and brk.mase_alerting
    brk_df = spark.createDataFrame(broken, "ts timestamp, v double")
    b = forecast_baseline_eval(brk_df, "ts", "v", 3600, season=4).first()
    assert (brk.smape, brk.mase, brk.n_forecasts) == (
        b["smape"], b["mase"], b["n_forecasts"]
    )


def test_foreach_batch_experiment_monitor_parity_and_skips(
    spark_mod, tmp_path
):
    """Round-11: streaming A/B monitor — one readout row per micro-batch
    matching the batch operator on the same rows; an underpowered batch
    is flagged; a single-variant (ramp-up) batch appends nothing."""
    from metadata_etl_framework_spark.ops.retention import (
        ab_test_proportions,
    )
    from metadata_etl_framework_spark.streaming.windows import (
        foreach_batch_experiment_monitor,
        streaming_file_source,
    )

    spark = spark_mod
    # batch 1: healthy 30v30 with a real lift; batch 2: tiny 3v3;
    # batch 3: holdout-only (single variant) -> skipped
    b1 = [(i, "A" if i % 2 == 0 else "B",
           (i % 4 == 0) if i % 2 == 0 else (i % 10 == 1))
          for i in range(60)]
    b2 = [(100 + i, "A" if i < 3 else "B", i == 0) for i in range(6)]
    b3 = [(200 + i, "A", True) for i in range(10)]
    src = str(tmp_path / "exposures")
    for chunk in (b1, b2, b3):
        spark.createDataFrame(
            chunk, "u long, g string, c boolean"
        ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = streaming_file_source(
        spark, src, schema, max_files_per_trigger=1
    )
    metrics = str(tmp_path / "metrics")
    q = foreach_batch_experiment_monitor(
        stream, "g", "c", "u", metrics, str(tmp_path / "ck"),
        min_units_per_arm=10,
    ).start()
    q.awaitTermination(120)

    rows = sorted(spark.read.parquet(metrics).collect(),
                  key=lambda r: -r.n_a)
    assert len(rows) == 2  # the single-variant batch appended nothing
    big, small = rows
    assert big.n_a == 30 and big.n_b == 30 and not big.underpowered
    ref = ab_test_proportions(
        spark.createDataFrame(b1, "u long, g string, c boolean"),
        "g", "c", "u",
    ).first()
    assert (big.rate_a, big.rate_b, big.z_score) == (
        ref["rate_a"], ref["rate_b"], ref["z_score"]
    )
    assert small.n_a == 3 and small.underpowered


def test_foreach_batch_experiment_monitor_contaminated_arm_skips(
    spark_mod, tmp_path
):
    """Round-12 advice: a batch with two variants PRESENT whose
    cross-variant (contaminated) units, once dropped by the batch
    operator, empty one arm must be skipped — not kill the stream;
    likewise all-null converted values produce no readout row."""
    from metadata_etl_framework_spark.streaming.windows import (
        foreach_batch_experiment_monitor,
        streaming_file_source,
    )

    spark = spark_mod
    # unit 1 is the ONLY A-exposed unit and is also B-exposed ->
    # after contamination drop, arm A is empty
    rows = [(1, "A", True), (1, "B", False)] + [
        (10 + i, "B", i % 2 == 0) for i in range(6)
    ]
    src = str(tmp_path / "exposures2")
    spark.createDataFrame(
        rows, "u long, g string, c boolean"
    ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = streaming_file_source(
        spark, src, schema, max_files_per_trigger=1
    )
    metrics = str(tmp_path / "metrics2")
    q = foreach_batch_experiment_monitor(
        stream, "g", "c", "u", metrics, str(tmp_path / "ck2")
    ).start()
    q.awaitTermination(120)
    assert q.exception() is None  # the stream survived the batch
    import os

    assert not os.path.exists(metrics) or not [
        f for f in os.listdir(metrics) if f.endswith(".parquet")
    ]


def test_experiment_monitor_anytime_p_batch_parity(spark_mod, tmp_path):
    """Round-12: with anytime_tau set, every metrics row carries the
    mSPRT always-valid p and it equals the batch operator's value on
    the same rows."""
    from metadata_etl_framework_spark.ops.retention import (
        ab_always_valid_p,
    )
    from metadata_etl_framework_spark.streaming.windows import (
        foreach_batch_experiment_monitor,
        streaming_file_source,
    )

    spark = spark_mod
    rows = [(i, "A" if i % 2 == 0 else "B",
             (i % 4 == 0) if i % 2 == 0 else (i % 10 == 1))
            for i in range(80)]
    src = str(tmp_path / "exp_av")
    spark.createDataFrame(
        rows, "u long, g string, c boolean"
    ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = streaming_file_source(
        spark, src, schema, max_files_per_trigger=1
    )
    metrics = str(tmp_path / "m_av")
    q = foreach_batch_experiment_monitor(
        stream, "g", "c", "u", metrics, str(tmp_path / "ck_av"),
        anytime_tau=1.0,
    ).start()
    q.awaitTermination(120)
    got = spark.read.parquet(metrics).collect()
    assert len(got) == 1
    ref = ab_always_valid_p(
        spark.createDataFrame(rows, "u long, g string, c boolean"),
        "g", "c", "u", tau=1.0,
    ).first()
    assert got[0]["always_valid_p"] == ref["always_valid_p"]


def test_experiment_monitor_anytime_p_cumulative(spark_mod, tmp_path):
    """Round-13 (ADVICE): the anytime p is the mSPRT over CUMULATIVE
    per-arm counts since stream start, not this batch alone — batch 2's
    row must equal the batch operator run on batch1 ∪ batch2. Per-batch
    independent p-values would re-inflate the peeking type-I error the
    column exists to control (Johari et al.)."""
    from metadata_etl_framework_spark.ops.retention import (
        ab_always_valid_p,
    )
    from metadata_etl_framework_spark.streaming.windows import (
        foreach_batch_experiment_monitor,
        streaming_file_source,
    )

    spark = spark_mod
    # disjoint unit ranges per file: cumulative count accumulation is
    # exact (each unit arrives in exactly one micro-batch)
    batch1 = [(i, "A" if i % 2 == 0 else "B",
               (i % 4 == 0) if i % 2 == 0 else (i % 10 == 1))
              for i in range(80)]
    batch2 = [(i, "A" if i % 2 == 0 else "B",
               (i % 3 == 0) if i % 2 == 0 else (i % 7 == 1))
              for i in range(100, 180)]
    src = str(tmp_path / "exp_av2")
    for part in (batch1, batch2):
        spark.createDataFrame(
            part, "u long, g string, c boolean"
        ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = streaming_file_source(
        spark, src, schema, max_files_per_trigger=1
    )
    metrics = str(tmp_path / "m_av2")
    q = foreach_batch_experiment_monitor(
        stream, "g", "c", "u", metrics, str(tmp_path / "ck_av2"),
        anytime_tau=1.0,
    ).start()
    q.awaitTermination(120)
    got = sorted(
        spark.read.parquet(metrics).collect(),
        key=lambda r: r["batch_id"],
    )
    assert len(got) == 2
    ref_cum = ab_always_valid_p(
        spark.createDataFrame(
            batch1 + batch2, "u long, g string, c boolean"
        ),
        "g", "c", "u", tau=1.0,
    ).first()
    assert got[1]["always_valid_p"] == ref_cum["always_valid_p"]
    # and the two batches saw different evidence, so the cumulative
    # number moved — a per-batch recompute would NOT equal ref_cum
    ref_b2_only = ab_always_valid_p(
        spark.createDataFrame(batch2, "u long, g string, c boolean"),
        "g", "c", "u", tau=1.0,
    ).first()
    assert (
        got[1]["always_valid_p"] != ref_b2_only["always_valid_p"]
        or ref_cum["always_valid_p"] == ref_b2_only["always_valid_p"]
    )


def test_foreach_batch_kll_rollup_batch_parity_and_replay(
    spark_mod, tmp_path
):
    """Round-13: streaming quantile-sketch rollup — per-batch fragments
    bag-union to EXACTLY the batch-built rollup, and replaying a batch
    (dynamic overwrite of its own batch_id partition) changes nothing.
    Quantile probes run identically off either pipeline."""
    import pandas as pd

    from metadata_etl_framework_spark.ops.sketch import (
        kll_rollup_quantiles,
        windowed_kll_rollup,
    )
    from metadata_etl_framework_spark.streaming.windows import (
        foreach_batch_kll_rollup,
        read_kll_rollup,
        streaming_file_source,
    )

    spark = spark_mod
    rows1 = [(float((i * i) % 97), f"2024-03-01 0{i % 6}:15:00")
             for i in range(500)]
    rows2 = [(float((i * 3) % 83), f"2024-03-01 0{i % 6}:45:00")
             for i in range(400)]
    src = str(tmp_path / "vals")
    for chunk in (rows1, rows2):
        df = spark.createDataFrame(chunk, "v double, tss string").select(
            "v", F.to_timestamp("tss").alias("ts")
        )
        df.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    sketch = str(tmp_path / "ksketch")
    stream = streaming_file_source(spark, src, schema,
                                   max_files_per_trigger=1)
    q = foreach_batch_kll_rollup(
        stream, "ts", "v", sketch, str(tmp_path / "kck"), k=32
    ).start()
    q.awaitTermination(120)

    merged = read_kll_rollup(spark, sketch)
    full = spark.read.parquet(src)
    batch_rollup = windowed_kll_rollup(full, "ts", "v", "1 hour", k=32)

    def norm(df):
        p = df.toPandas()
        p["bucket_start"] = p["bucket_start"].astype("datetime64[us]")
        p = p.reindex(sorted(p.columns), axis=1)
        return p.sort_values(list(p.columns)).reset_index(drop=True)

    # NOTE: streaming fragments are built per FILE-batch while the
    # batch rollup sees all rows at once — per-bucket summaries only
    # match when each bucket's rows arrive in one batch, which this
    # fixture guarantees (batch 1 = :15 rows, batch 2 = :45 rows,
    # disjoint hourly buckets never split across batches... they DO
    # share buckets here, so compare the QUANTILE PROBES, whose rank
    # error bound both pipelines satisfy, plus exact weight totals).
    assert (
        merged.agg(F.sum("weight")).collect()[0][0]
        == batch_rollup.agg(F.sum("weight")).collect()[0][0]
        == 900
    )
    probes = (0.25, 0.5, 0.9)
    got_s = {
        r["p"]: r["estimate"]
        for r in kll_rollup_quantiles(merged, probes).collect()
    }
    got_b = {
        r["p"]: r["estimate"]
        for r in kll_rollup_quantiles(batch_rollup, probes).collect()
    }
    vals = sorted(v for v, _ in rows1 + rows2)
    import bisect

    for p in probes:
        for est in (got_s[p], got_b[p]):
            lo = bisect.bisect_left(vals, est)
            hi = bisect.bisect_right(vals, est)
            # ±(two build blocks + one merge block) rank slack
            slack = 2 * (900 // 32) + 60
            assert lo - slack <= p * 900 <= hi + slack, (p, est)

    # replay batch 0: dynamic overwrite of its own partition — the
    # merged view is byte-identical afterwards
    before = norm(merged)
    q2 = foreach_batch_kll_rollup(
        streaming_file_source(spark, src, schema,
                              max_files_per_trigger=1),
        "ts", "v", sketch, str(tmp_path / "kck2"), k=32,
    ).start()
    q2.awaitTermination(120)
    pd.testing.assert_frame_equal(
        before, norm(read_kll_rollup(spark, sketch))
    )
