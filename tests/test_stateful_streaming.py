"""applyInPandasWithState operators under the REAL streaming engine:
per-key running aggregates and first-occurrence dedup, each checked
against its batch-equivalent oracle on identical input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_etl_framework_spark.sources.tables import load_table
from metadata_etl_framework_spark.streaming.stateful import (
    stateful_running_counts,
    stateful_stream_dedup,
)
from metadata_etl_framework_spark.streaming.windows import streaming_file_source

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark_mod():
    from metadata_etl_framework_spark.session import get_spark

    return get_spark(app_name="stateful-tests", shuffle_partitions=8)


@pytest.fixture(scope="module")
def stream_src(spark_mod, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stateful") / "events")
    ev = load_table(spark_mod, SF, "events")
    ev.repartition(4).write.mode("overwrite").parquet(path)
    return path


def test_stateful_running_counts_matches_batch(spark_mod, stream_src, tmp_path):
    spark = spark_mod
    batch = spark.read.parquet(stream_src)
    schema = batch.schema

    stream = streaming_file_source(spark, stream_src, schema, max_files_per_trigger=1)
    counts = stateful_running_counts(stream, "event_type", "value")
    q = (
        counts.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_counts")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # update mode emits one row per key per micro-batch; the LAST emission
    # per key must equal the batch totals
    got = spark.sql(
        """
        SELECT key, count, value_sum FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY key ORDER BY count DESC) rn
            FROM running_counts
        ) WHERE rn = 1
        """
    )
    expected = stateful_running_counts(batch, "event_type", "value")
    g = {r.key: (r["count"], round(r.value_sum, 6)) for r in got.collect()}
    e = {r.key: (r["count"], round(r.value_sum, 6)) for r in expected.collect()}
    assert set(g) == set(e)
    for k in e:
        assert g[k][0] == e[k][0], k
        # float accumulation order differs between state updates and one
        # batch agg; totals agree to float tolerance
        assert abs(g[k][1] - e[k][1]) < 1e-6 * max(1.0, abs(e[k][1])), k
    # state carried ACROSS micro-batches: some key must have been emitted
    # more than once with growing counts
    multi = spark.sql(
        "SELECT key, COUNT(*) n FROM running_counts GROUP BY key HAVING n > 1"
    )
    assert multi.count() > 0


def test_stateful_stream_dedup_first_occurrence_only(spark_mod, stream_src, tmp_path):
    spark = spark_mod
    schema = spark.read.parquet(stream_src).schema
    stream = streaming_file_source(spark, stream_src, schema, max_files_per_trigger=1)
    deduped = stateful_stream_dedup(stream, ["event_type"])
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_dedup")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("SELECT event_type FROM stream_dedup")
    n_types = (
        spark.read.parquet(stream_src).select("event_type").distinct().count()
    )
    # exactly one row per distinct key across ALL micro-batches — state
    # suppressed re-emission in later batches
    assert got.count() == n_types
    assert got.distinct().count() == n_types


def test_batch_fallbacks(spark_mod):
    ev = load_table(spark_mod, SF, "events")
    counts = stateful_running_counts(ev, "event_type", "value")
    assert not counts.isStreaming
    assert counts.count() == ev.select("event_type").distinct().count()
    dedup = stateful_stream_dedup(ev, ["event_type"])
    assert dedup.count() == ev.select("event_type").distinct().count()


def test_stream_static_enrichment_join(spark_mod, stream_src, tmp_path):
    """Stream-static join: a streaming fact enriched against a static
    dimension — the standard streaming lookup pattern; results must match
    the batch join over identical input."""
    spark = spark_mod
    schema = spark.read.parquet(stream_src).schema
    stream = streaming_file_source(spark, stream_src, schema,
                                   max_files_per_trigger=2)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"),
         ("purchase", "revenue"), ("signup", "growth"), ("error", "ops")],
        "event_type string, category string",
    )
    enriched = stream.join(F.broadcast(dim), "event_type", "left")
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched_events")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql(
        "SELECT category, COUNT(*) AS n FROM enriched_events GROUP BY category"
    )
    expected = (
        spark.read.parquet(stream_src)
        .join(dim, "event_type", "left")
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    g = {r.category: r.n for r in got.collect()}
    e = {r.category: r.n for r in expected.collect()}
    assert g == e and sum(g.values()) == spark.read.parquet(stream_src).count()


def test_idempotent_foreach_batch_skips_replays(spark_mod, tmp_path):
    """A replayed micro-batch (same batch_id after simulated failure) must
    not double-apply the side effect."""
    from metadata_etl_framework_spark.streaming.windows import (
        idempotent_foreach_batch,
    )

    applied = []
    wrapped = idempotent_foreach_batch(
        lambda df, bid: applied.append((bid, df.count())),
        processed_log=str(tmp_path / "batchlog"),
    )
    df = spark_mod.range(5)
    wrapped(df, 0)
    wrapped(df, 1)
    wrapped(df, 1)   # replay of batch 1 → skipped
    wrapped(df, 2)
    assert [b for b, _ in applied] == [0, 1, 2]


def test_native_session_window_stream_matches_batch(spark_mod, stream_src, tmp_path):
    """Spark's native session_window under the streaming engine: per-user
    session counts must match the same expression over the batch input
    (and corroborate sessionize_batch's gaps-and-islands count)."""
    from metadata_etl_framework_spark.streaming.windows import sessionize_batch

    spark = spark_mod
    batch = spark.read.parquet(stream_src)
    schema = batch.schema
    stream = streaming_file_source(spark, stream_src, schema,
                                   max_files_per_trigger=2)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("native_sessions")
        .option("checkpointLocation", str(tmp_path / "ck4"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql(
        "SELECT user_id, COUNT(*) AS n FROM native_sessions GROUP BY user_id"
    )
    expected = (
        batch.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    g = {r.user_id: r.n for r in got.collect()}
    e = {r.user_id: r.n for r in expected.collect()}
    # append-mode watermark may withhold the final open session per user;
    # everything else matches exactly
    for u, n in e.items():
        assert g.get(u, 0) in (n, n - 1), (u, g.get(u), n)
    # and the batch gaps-and-islands operator agrees with the native form
    isl = (
        sessionize_batch(batch, "ts", ["user_id"], gap="30 minutes",
                         order_tiebreak="event_id")
        .groupBy("user_id")
        .agg(F.max("session_id").alias("n"))
    )
    i = {r.user_id: r.n for r in isl.collect()}
    assert i == e


def test_tws_running_counts_matches_batch(spark_mod, stream_src, tmp_path):
    """Spark 4 transformWithState processor: last update-mode emission per
    key equals the batch groupBy totals, with state carried across
    micro-batches. Skips where the protobuf package (required by the
    TWS Python worker) is absent; the batch fallback is always tested."""
    from metadata_etl_framework_spark.streaming.stateful import (
        tws_running_counts,
    )

    spark = spark_mod
    # batch fallback works regardless of the streaming gate
    batch_tot = {r.key: r["count"] for r in tws_running_counts(
        spark.read.parquet(stream_src), "event_type", "value").collect()}
    assert sum(batch_tot.values()) == spark.read.parquet(stream_src).count()

    pytest.importorskip(
        "google.protobuf", reason="transformWithState worker needs protobuf"
    )
    batch = spark.read.parquet(stream_src)
    schema = batch.schema

    stream = streaming_file_source(spark, stream_src, schema,
                                   max_files_per_trigger=1)
    counts = tws_running_counts(stream, "event_type", "value")
    q = (
        counts.writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_counts")
        .option("checkpointLocation", str(tmp_path / "ck_tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql(
        """
        SELECT key, count, value_sum FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY key ORDER BY count DESC) rn
            FROM tws_counts
        ) WHERE rn = 1
        """
    )
    expected = tws_running_counts(batch, "event_type", "value")
    g = {r.key: (r["count"], r.value_sum) for r in got.collect()}
    e = {r.key: (r["count"], r.value_sum) for r in expected.collect()}
    assert set(g) == set(e)
    for k in e:
        assert g[k][0] == e[k][0], k
        assert abs(g[k][1] - e[k][1]) < 1e-6 * max(1.0, abs(e[k][1])), k
    multi = spark.sql(
        "SELECT key, COUNT(*) n FROM tws_counts GROUP BY key HAVING n > 1"
    )
    assert multi.count() > 0
