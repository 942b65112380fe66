"""Market-basket affinity: co-occurrence support / confidence / lift.

"What goes together?" — the association-rule table behind cross-sell
analytics, but equally the corpus question "which sources/topics
co-occur in the same crawl batch?". Extends the event-analytics family
(ops/retention.py) with the basket-shaped aggregation the reference's
analytics plane lacks.

Scale design: items are reduced to distinct (basket, item) PRESENCE
first (one groupBy — multiplicity inside a basket is not co-occurrence),
then candidate pairs come from a self-equi-join ON THE BASKET KEY —
never a global cross join. Work is Σ_b m_b² over basket sizes m_b, so
the optional ``max_basket_items`` gate drops degenerate mega-baskets
(the standard practice: a basket with 10⁴ items contributes 10⁸ pairs
and no signal). All statistics are exact integer-count ratios — no
floating accumulation to drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["basket_affinity"]


def basket_affinity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 1,
    max_basket_items: int | None = None,
) -> DataFrame:
    """Per-pair co-occurrence statistics over baskets.

    For every unordered item pair (a < b) present together in at least
    ``min_pair_count`` baskets: the joint basket count, support
    (joint / all baskets), both directional confidences
    (joint / item's basket count), and lift — joint·n / (c_a·c_b),
    > 1 means the pair co-occurs more than independence predicts.

    Output: (item_a, item_b, n_both long, support, conf_a_to_b,
    conf_b_to_a, lift — 6 dp), lift desc then items asc
    (deterministic).
    """
    items = (
        df.where(
            F.col(basket_col).isNotNull() & F.col(item_col).isNotNull()
        )
        .select(
            F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
        )
        .dropDuplicates(["_b", "_i"])
    )
    if max_basket_items is not None:
        w = Window.partitionBy("_b")
        items = (
            items.withColumn("_sz", F.count(F.lit(1)).over(w))
            .where(F.col("_sz") <= max_basket_items)
            .drop("_sz")
        )
    n_baskets = items.select("_b").distinct().count()
    if n_baskets == 0:
        return df.sparkSession.createDataFrame(
            [],
            "item_a string, item_b string, n_both long, support double, "
            "conf_a_to_b double, conf_b_to_a double, lift double",
        )
    ci = items.groupBy("_i").agg(F.count(F.lit(1)).alias("_c"))
    a = items.select(F.col("_b"), F.col("_i").alias("_ia"))
    b = items.select(F.col("_b"), F.col("_i").alias("_ib"))
    pairs = (
        a.join(b, "_b")
        .where(F.col("_ia") < F.col("_ib"))
        .groupBy("_ia", "_ib")
        .agg(F.count(F.lit(1)).alias("_cab"))
        .where(F.col("_cab") >= int(min_pair_count))
    )
    ca = ci.select(F.col("_i").alias("_ia"), F.col("_c").alias("_ca"))
    cb = ci.select(F.col("_i").alias("_ib"), F.col("_c").alias("_cb"))
    n = F.lit(n_baskets)
    return (
        pairs.join(ca, "_ia")
        .join(cb, "_ib")
        .select(
            F.col("_ia").cast("string").alias("item_a"),
            F.col("_ib").cast("string").alias("item_b"),
            F.col("_cab").cast("long").alias("n_both"),
            F.round(F.col("_cab") / n, 6).alias("support"),
            F.round(F.col("_cab") / F.col("_ca"), 6).alias("conf_a_to_b"),
            F.round(F.col("_cab") / F.col("_cb"), 6).alias("conf_b_to_a"),
            F.round(
                (F.col("_cab") * n) / (F.col("_ca") * F.col("_cb")), 6
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "item_a", "item_b")
    )
