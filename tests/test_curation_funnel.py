"""Pins for the one-pass curation funnel (ops/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_etl_framework_spark.ops.curation import (
    apply_funnel,
    default_document_stages,
    funnel_stats,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "good text", "en"),
            (2, "bad", "en"),
            (3, "good text", "fr"),
            (4, None, "en"),  # NULL text must be dropped, not kept
            (5, "good text", None),  # NULL lang -> lang stage drops
        ],
        "doc_id int, text string, lang string",
    )


def _stages():
    # built lazily: Column ops invoke the JVM, so no module-level Columns
    return [
        ("nonempty", F.length(F.col("text")) > 0),
        ("long_enough", "length(text) >= 5"),  # SQL-string predicate form
        ("lang_en", F.col("lang") == "en"),
    ]


def test_funnel_stats_cumulative_counts(spark):
    rows = {r.stage_name: r for r in funnel_stats(_docs(spark), _stages()).collect()}
    # NULL predicate (doc 4) counts as a drop at the first stage
    assert (rows["nonempty"].entering, rows["nonempty"].surviving) == (5, 4)
    assert (rows["long_enough"].entering, rows["long_enough"].surviving) == (4, 3)
    # doc 3 (fr) and doc 5 (NULL lang) drop at the lang stage
    assert (rows["lang_en"].entering, rows["lang_en"].surviving) == (3, 1)
    assert rows["lang_en"].dropped == 2
    assert rows["long_enough"].retention == 0.75
    assert rows["lang_en"].cumulative_retention == 0.2


def test_funnel_stats_is_single_aggregation(spark):
    # the whole funnel must be one aggregate over one scan: exactly one
    # HashAggregate pair (partial+final) and one relation in the plan
    plan = funnel_stats(_docs(spark), _stages())._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 1


def test_apply_funnel_matches_stats_tail(spark):
    surviving = apply_funnel(_docs(spark), _stages())
    assert [r.doc_id for r in surviving.collect()] == [1]


def test_empty_input(spark):
    empty = _docs(spark).filter(F.lit(False))
    rows = funnel_stats(empty, _stages()).collect()
    assert len(rows) == 3
    assert all(
        (r.entering, r.surviving, r.retention, r.cumulative_retention)
        == (0, 0, 0.0, 0.0)
        for r in rows
    )
    assert apply_funnel(empty, _stages()).count() == 0


def test_default_stages_null_text_never_survives(spark):
    docs = spark.createDataFrame(
        [(1, None, "en", 0)], "doc_id int, text string, lang string, n_chars int"
    )
    assert apply_funnel(docs, default_document_stages()).count() == 0
    first = funnel_stats(docs, default_document_stages()).collect()[0]
    assert first.surviving == 0
