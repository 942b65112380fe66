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
    out-of-window latest means no in-window match exists).
    ``model='first_touch'``: the user's earliest touch ever (min_by
    aggregate), the classic acquisition-credit definition; ``lookback``
    does not apply.

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
        matched_ts = F.col("first_ts")
        touch_id = F.col("_m.touch_id")
        touch_type = F.col("first_type")
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
