"""Declarative corpus-curation filter chains with funnel accounting.

FineWeb/RefinedWeb-style curation is an ordered list of named keep
predicates; the operational question is "how many documents did each
stage cost me?". The naive implementation runs k filters and k counts
(k full scans). Here every stage mask and every cumulative survivor
count is computed in ONE projection + ONE aggregation pass — the
funnel for a 100-TB corpus costs exactly one scan, and the filtered
output is an ordinary lazy filter on the conjunction.

Extends the reference's rule engine design (one-pass multi-rule
aggregation, `/root/reference/src/quality/dq_engine.py:285-322`,
SURVEY §2.10 design note) from validation to curation.

Stages are ``(name, predicate)`` pairs; predicates may be `Column`
expressions or SQL strings (compiled via ``F.expr``, so config-driven
pipelines can declare funnels as plain text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Stage = tuple[str, "Column | str"]


def _as_column(pred: "Column | str") -> Column:
    return F.expr(pred) if isinstance(pred, str) else pred


def funnel_stats(df: DataFrame, stages: list[Stage]) -> DataFrame:
    """Per-stage survivor accounting for an ordered filter chain.

    One row per stage: ``stage`` (1-based), ``stage_name``, ``entering``
    (survivors of all prior stages), ``surviving`` (… and this one),
    ``dropped``, ``retention`` (surviving/entering, 6 dp) and
    ``cumulative_retention`` (surviving/total). NULL predicate results
    count as drops (three-valued logic is coalesced to FALSE — a filter
    that can't evaluate a document must not keep it).

    Plan: one projection building cumulative-AND masks, one global
    aggregate (k+1 conditional sums), then a ``stack`` reshape of the
    single result row — no per-stage jobs, no driver loop over data.
    """
    cum = F.lit(True)
    masks = []
    for _, pred in stages:
        cum = cum & F.coalesce(_as_column(pred), F.lit(False))
        masks.append(cum)
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        # coalesce: SUM over an empty frame is NULL, the funnel says 0
        F.coalesce(F.sum(m.cast("long")), F.lit(0)).alias(f"__s{i}")
        for i, m in enumerate(masks)
    ]
    one = df.agg(*aggs)

    # stack the 1-row aggregate into the tall funnel frame
    stack_args: list[Column] = []
    for i, (name, _) in enumerate(stages):
        entering = F.col("__n") if i == 0 else F.col(f"__s{i - 1}")
        stack_args += [
            F.lit(i + 1),
            F.lit(name),
            entering,
            F.col(f"__s{i}"),
        ]
    k = len(stages)
    stacked = one.select(
        F.stack(
            F.lit(k),
            *stack_args,
        ).alias("stage", "stage_name", "entering", "surviving"),
        F.col("__n").alias("__total"),
    )
    return stacked.select(
        "stage",
        "stage_name",
        F.col("entering").cast("long").alias("entering"),
        F.col("surviving").cast("long").alias("surviving"),
        (F.col("entering") - F.col("surviving")).cast("long").alias("dropped"),
        F.round(
            F.when(
                F.col("entering") > 0,
                F.col("surviving") / F.col("entering"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("retention"),
        F.round(
            F.when(
                F.col("__total") > 0, F.col("surviving") / F.col("__total")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("cumulative_retention"),
    )


def apply_funnel(df: DataFrame, stages: list[Stage]) -> DataFrame:
    """Documents surviving every stage — one conjunctive filter, fully
    pushdown-eligible (Catalyst splits the conjunction and pushes the
    scan-evaluable terms to the source)."""
    keep = F.lit(True)
    for _, pred in stages:
        keep = keep & F.coalesce(_as_column(pred), F.lit(False))
    return df.filter(keep)


def default_document_stages(
    text_col: str = "text",
    min_chars: int = 100,
    max_words: int = 80,
    max_mean_word_len: float = 6.0,
    lang_col: str = "lang",
    keep_lang: str | None = "en",
) -> list[Stage]:
    """A C4/Gopher-flavored default chain over the documents schema:
    length floor, word-count ceiling, mean-word-length sanity, marker
    blocklist, optional language gate. All pure JVM column expressions."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words)
    mean_wl = F.when(
        n_words > 0,
        F.length(F.regexp_replace(F.trim(t), r"\s+", "")) / n_words,
    ).otherwise(F.lit(0.0))
    stages: list[Stage] = [
        ("min_chars", F.length(t) >= min_chars),
        ("max_words", n_words <= max_words),
        ("mean_word_len", mean_wl <= F.lit(float(max_mean_word_len))),
        ("no_dup_marker", ~t.contains("dup")),
    ]
    if keep_lang is not None:
        stages.append(("lang", F.col(lang_col) == keep_lang))
    return stages
