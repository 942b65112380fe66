"""Multinomial Naive Bayes over tokenized text — train and score as
pure count arithmetic, the classic high-throughput text classifier
(language ID, source routing, topic gating) a corpus pipeline can
train INSIDE the warehouse without any ML runtime.

The reference's analytics plane has no trainable-model surface
(cf. /root/reference/src/transformations/transform_engine.py — joins
and aggregations only); this is beyond-reference capability, chosen
because NB is exactly the model class whose training IS a pair of
groupBys: every sufficient statistic is an integer token count, so
both training and scoring are engine-replayable to the last bit.

Scale design:
- Training = ONE (label, token) groupBy + ONE label groupBy over the
  exploded token stream; the model is vocab-bounded (|labels|·|vocab|
  worst case, |seen pairs| actual), orders of magnitude smaller than
  the corpus. ``min_count`` prunes hapax tokens — the standard vocab
  cap that keeps the model broadcastable at 100 TB.
- Scoring = explode → vocab semi-join → |labels|-way broadcast fan-out
  → equi-join on (label, token) → one groupBy(doc, label). No UDFs,
  no iteration, no driver loops.
- Determinism: log terms round to 12 dp at model build and accumulate
  as DECIMAL(28,12) at scoring, so document scores are merge-order
  independent and the (score desc, label asc) argmax is deterministic
  in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


from .text import tokens

__all__ = ["nb_train", "nb_score", "nb_top_terms"]


def _doc_tokens(df: DataFrame, text_col: str) -> "F.Column":
    return F.transform(tokens(text_col), lambda t: F.lower(t))


def nb_train(
    df: DataFrame,
    text_col: str,
    label_col: str,
    smoothing: float = 1.0,
    min_count: int = 1,
) -> DataFrame:
    """Train a multinomial NB model; returns a tall model frame.

    Rows (kind, label, token, weight 12 dp):
    - ``('prior', c, NULL, ln(n_c / N))`` — document-count priors;
    - ``('token', c, t, ln((cnt_{c,t} + α) / (T_c + α·V)))`` — one row
      per label×token pair SEEN in class c;
    - ``('default', c, NULL, ln(α / (T_c + α·V)))`` — the smoothed
      weight for a vocab token unseen in class c.

    V is the vocabulary size (distinct lowercased whitespace tokens
    with corpus count ≥ ``min_count``); T_c the summed vocab-token
    count in class c. α is the Laplace/Lidstone ``smoothing``. Rows
    with NULL text/label are excluded.
    """
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (Laplace/Lidstone)")
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    base = df.where(
        F.col(text_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(label_col).cast("string").alias("_c"),
        _doc_tokens(df, text_col).alias("_toks"),
    )
    base = base.persist()
    try:
        exploded = base.select(
            "_c", F.explode("_toks").alias("_t")
        )
        vocab = (
            exploded.groupBy("_t")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") >= int(min_count))
            .select("_t")
        )
        pair = (
            exploded.join(vocab, "_t")
            .groupBy("_c", "_t")
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        pair = pair.persist()
        totals = pair.groupBy("_c").agg(F.sum("_cnt").alias("_tc"))
        v = vocab.agg(F.count(F.lit(1)).alias("_v"))
        docs = base.groupBy("_c").agg(F.count(F.lit(1)).alias("_nc"))
        n = base.agg(F.count(F.lit(1)).alias("_nd"))
        alpha = F.lit(float(smoothing))
        priors = docs.crossJoin(F.broadcast(n)).select(
            F.lit("prior").alias("kind"),
            F.col("_c").alias("label"),
            F.lit(None).cast("string").alias("token"),
            F.round(
                F.log(F.col("_nc").cast("double") / F.col("_nd")), 12
            ).alias("weight"),
        )
        denom = F.col("_tc").cast("double") + alpha * F.col("_v")
        tok = (
            pair.join(F.broadcast(totals), "_c")
            .crossJoin(F.broadcast(v))
            .select(
                F.lit("token").alias("kind"),
                F.col("_c").alias("label"),
                F.col("_t").alias("token"),
                F.round(
                    F.log(
                        (F.col("_cnt").cast("double") + alpha) / denom
                    ),
                    12,
                ).alias("weight"),
            )
        )
        defaults = (
            totals.crossJoin(F.broadcast(v))
            .select(
                F.lit("default").alias("kind"),
                F.col("_c").alias("label"),
                F.lit(None).cast("string").alias("token"),
                F.round(F.log(alpha / denom), 12).alias("weight"),
            )
        )
        out = priors.unionByName(tok).unionByName(defaults)
        out = out.localCheckpoint(eager=True)
    finally:
        base.unpersist()
        try:
            pair.unpersist()
        except Exception:
            pass
    return out


def nb_score(
    docs: DataFrame,
    model: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Score documents against an :func:`nb_train` model.

    Per document and label: score = prior + Σ_tokens weight, where a
    token outside the training vocabulary is DROPPED (the standard
    multinomial-NB inference rule) and a vocab token unseen in the
    label takes the label's smoothed default. Token weights accumulate
    as DECIMAL(28,12) over the 12-dp model weights; argmax ties break
    on label ascending. The model frames are broadcast (vocab-bounded
    by construction).

    Output: (id, predicted_label, score 12 dp, n_tokens long — vocab
    tokens actually scored), one row per input document with non-null
    id (a NULL/empty text scores on the prior alone).
    """
    priors = model.where(F.col("kind") == "prior").select(
        F.col("label"), F.col("weight").alias("_prior")
    )
    defaults = model.where(F.col("kind") == "default").select(
        F.col("label"), F.col("weight").alias("_default")
    )
    tok = model.where(F.col("kind") == "token").select(
        "label", F.col("token").alias("_t"), F.col("weight").alias("_w")
    )
    vocab = tok.select("_t").distinct()
    base = docs.where(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.coalesce(
            _doc_tokens(docs, text_col), F.array().cast("array<string>")
        ).alias("_toks"),
    )
    dt = base.select("_id", F.explode("_toks").alias("_t")).join(
        F.broadcast(vocab), "_t"
    )
    lab = priors.join(defaults, "label")
    scored_tokens = (
        dt.crossJoin(F.broadcast(lab.select("label", "_default")))
        .join(F.broadcast(tok), ["label", "_t"], "left")
        .select(
            "_id",
            "label",
            F.coalesce(F.col("_w"), F.col("_default")).alias("_lw"),
        )
        .groupBy("_id", "label")
        .agg(
            F.sum(F.col("_lw").cast("decimal(28,12)")).alias("_sum"),
            F.count(F.lit(1)).alias("_nt"),
        )
    )
    per_label = (
        base.select("_id")
        .crossJoin(F.broadcast(lab.select("label", "_prior")))
        .join(scored_tokens, ["_id", "label"], "left")
        .select(
            "_id",
            "label",
            (
                F.col("_prior")
                + F.coalesce(
                    F.col("_sum").cast("double"), F.lit(0.0)
                )
            ).alias("_score"),
            F.coalesce(F.col("_nt"), F.lit(0)).alias("_nt"),
        )
    )
    w = Window.partitionBy("_id").orderBy(
        F.desc("_score"), F.asc("label")
    )
    return (
        per_label.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(
            F.col("_id").alias(id_col),
            F.col("label").alias("predicted_label"),
            F.round("_score", 12).alias("score"),
            F.col("_nt").cast("long").alias("n_tokens"),
        )
        .orderBy(id_col)
    )


def nb_top_terms(model: DataFrame, k: int = 5) -> DataFrame:
    """The most DISCRIMINATIVE tokens per class from an
    :func:`nb_train` model — the interpretability readout ("what makes
    the model call something 'de'?") that turns the weight table into
    something a curator can review. A token's margin for class c is
    its log-likelihood under c minus the BEST log-likelihood under any
    other class (the one-vs-rest decision margin; a token absent from
    the other class falls back to that class's smoothed default, the
    same rule scoring uses).

    Pure frame math over the vocab-bounded model: one (token) window
    for the top-2 weights per token, one (label) window for the top-k
    margins — no data pass at all.

    Output: (label, token, weight 12 dp, margin 12 dp, rank int ≤ k),
    ordered by (label, rank); ties break on token ascending.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    tok = model.where(F.col("kind") == "token").select(
        "label", "token", "weight"
    )
    defaults = model.where(F.col("kind") == "default").select(
        F.col("label"), F.col("weight").alias("_default")
    )
    labels = defaults.select("label")
    # complete the (token x label) grid with the smoothed defaults so
    # "best OTHER class" sees absent-token classes at their true weight
    grid = (
        tok.select("token").distinct()
        .crossJoin(F.broadcast(labels))
        .join(tok, ["token", "label"], "left")
        .join(F.broadcast(defaults), "label")
        .select(
            "token",
            "label",
            F.coalesce(F.col("weight"), F.col("_default")).alias("_w"),
        )
    )
    others = grid.select(
        F.col("token"),
        F.col("label").alias("_other"),
        F.col("_w").alias("_ow"),
    )
    best_other = (
        grid.join(others, "token")
        .where(F.col("label") != F.col("_other"))
        .groupBy("token", "label", "_w")
        .agg(F.max("_ow").alias("_best_other"))
    )
    wlab = Window.partitionBy("label").orderBy(
        F.desc("_margin"), F.asc("token")
    )
    return (
        best_other.select(
            "label",
            "token",
            F.col("_w").alias("weight"),
            (F.col("_w") - F.col("_best_other")).alias("_margin"),
        )
        .withColumn("rank", F.row_number().over(wlab))
        .where(F.col("rank") <= int(k))
        .select(
            "label",
            "token",
            F.round("weight", 12).alias("weight"),
            F.round("_margin", 12).alias("margin"),
            F.col("rank").cast("int").alias("rank"),
        )
        .orderBy("label", "rank")
    )
