"""Marketing-touch attribution for conversion events.

Which touch (click/view/campaign event) gets credit for each
conversion? Last-touch rides the distributed as-of join
(`functions/joins.py::asof_join` — one shuffle on the user key, no
range explosion); first-touch is a per-user ``min_by`` aggregate.
Completes the event-analytics family (funnel, sessionization, cohort
retention) on the same events schema.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_conversions(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("click", "view"),
    model: str = "last_touch",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    lookback: str | None = None,
) -> DataFrame:
    """Attribute every conversion to a touch event by the same user.

    ``model='last_touch'``: the latest touch at-or-before the conversion
    (as-of backward join; ``lookback`` like ``"3 days"`` nulls matches
    older than the window — the closest touch IS the latest, so an
    out-of-window latest means no in-window match exists). Touches are
    pre-reduced to one row per (user, ts) with a deterministic
    max-touch_id tie-break, so simultaneous touches can't make the
    winner depend on partition order.
    ``model='first_touch'``: the user's earliest touch AT-OR-BEFORE the
    conversion (min_by aggregate + a post-filter), the classic
    acquisition-credit definition — credit never flows backward in
    time, so a purchase is never attributed to a later click.
    ``lookback`` does not apply.

    Output: (conversion_id, user, conversion ts, touch_id, touch_type,
    gap_seconds — whole seconds, NULL when unattributed). Unattributed
    conversions (no touch) are kept with NULL touch columns, so
    attribution coverage is measurable from the result.
    """
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("user"),
        F.col(id_col).alias("conversion_id"),
        F.col(ts_col).alias("ts"),
    )
    touch = events.filter(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("touch_id"),
        F.col(type_col).alias("touch_type"),
    )
    if model == "last_touch":
        from metadata_etl_framework_spark.functions.joins import asof_join

        # one row per (user, ts): the as-of join orders by (ts, side)
        # only, so same-instant touches would otherwise win by partition
        # order. max_by(touch_id) is the documented deterministic rule.
        touch = touch.groupBy("user", "ts").agg(
            F.max("touch_id").alias("touch_id"),
            F.max_by("touch_type", "touch_id").alias("touch_type"),
        )
        out = asof_join(
            conv,
            touch,
            "ts",
            by=["user"],
            value_cols=["touch_id", "touch_type"],
            tolerance=lookback,
        )
        matched_ts = F.col("ts_right")
        touch_id = F.col("touch_id_right")
        touch_type = F.col("touch_type_right")
    elif model == "first_touch":
        firsts = touch.groupBy("user").agg(
            F.min("ts").alias("first_ts"),
            # deterministic under ts ties: min_by on a (ts, id) struct
            F.min(F.struct(F.col("ts"), F.col("touch_id"))).alias("_m"),
            F.min_by(
                "touch_type", F.struct(F.col("ts"), F.col("touch_id"))
            ).alias("first_type"),
        )
        out = conv.join(firsts, "user", "left")
        # earliest touch <= conv ts == global earliest IF that one is
        # <= conv ts, else no touch qualifies — so a post-filter on the
        # per-user min is exact, and gap_seconds is never negative.
        ok = F.col("first_ts") <= F.col("ts")
        matched_ts = F.when(ok, F.col("first_ts"))
        touch_id = F.when(ok, F.col("_m.touch_id"))
        touch_type = F.when(ok, F.col("first_type"))
    else:
        raise ValueError("model must be last_touch or first_touch")
    return out.select(
        "conversion_id",
        F.col("user").alias(user_col),
        F.col("ts").alias("conversion_ts"),
        touch_id.alias("touch_id"),
        touch_type.alias("touch_type"),
        (
            F.unix_timestamp(F.col("ts")) - F.unix_timestamp(matched_ts)
        ).cast("long").alias("gap_seconds"),
    )
