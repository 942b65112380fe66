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


def markov_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("click", "view"),
    iterations: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order Markov (removal-effect) attribution — the
    data-driven alternative to first/last-touch: credit each channel
    by how much the corpus conversion probability DROPS when that
    channel is removed from the journey graph.

    Journeys: each user's touch/conversion events sorted by (ts, id);
    a conversion terminates the journey it follows (journey id = count
    of PRIOR conversions), trailing touches form a non-converting
    journey. States: 'start' → touches… → absorbing 'conv'/'null'.
    P(conversion from start) solves by ``iterations`` rounds of
    synchronous value iteration v(s) = Σ_d P(s,d)·v(d) with v(conv)=1,
    v(null)=0; removing channel c drops its out-transitions and
    redirects transitions INTO c to 'null'; removal_effect(c) = base −
    removed, shares normalize over positive effects.

    Scale split (the BPE/isotonic discipline): the ROW-SCALE work —
    two per-user windows and one groupBy((from, to)) — is distributed;
    the solve then runs DRIVER-SIDE on the collected transition grid,
    which is bounded by (len(touch_types)+3)² rows regardless of data
    volume (a 20-deep lazy join chain per solve was measured and
    rejected: Catalyst plan trees, not data, became the cost). The
    driver arithmetic is integer micro-units of the 12dp-rounded
    terms — exact sums, so the DuckDB oracle's unrolled
    ROUND+DECIMAL-sum iteration reproduces every v bit-for-bit.

    Output: one row per touch type — (touch, base_conversion 6dp,
    removed_conversion 6dp, removal_effect 6dp, share 6dp); share NULL
    when no channel has a positive effect.
    """
    from pyspark.sql import Window

    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    touches = list(touch_types)
    wanted = touches + [conversion_type]
    ev = events.where(
        F.col(type_col).isin(wanted)
        & F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("st"),
    )
    wu = Window.partitionBy("u").orderBy("t", "eid")
    is_conv = (F.col("st") == conversion_type).cast("int")
    jid = F.coalesce(
        F.sum(is_conv).over(
            wu.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    tagged = ev.withColumn("jid", jid)
    tch = tagged.where(F.col("st") != conversion_type)
    wj = Window.partitionBy("u", "jid").orderBy("t", "eid")
    steps = tch.select(
        F.coalesce(F.lag("st").over(wj), F.lit("start")).alias("s"),
        F.col("st").alias("d"),
    )
    last_touch = tch.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("u", "jid").orderBy(
                F.desc("t"), F.desc("eid")
            )
        ),
    ).where(F.col("rn") == 1).select("u", "jid", F.col("st").alias("lt"))
    per_j = (
        tagged.groupBy("u", "jid")
        .agg(F.max(is_conv).alias("has_conv"))
        .join(last_touch, ["u", "jid"], "left")
    )
    ends = per_j.select(
        F.coalesce("lt", F.lit("start")).alias("s"),
        F.when(F.col("has_conv") == 1, F.lit("conv"))
        .otherwise(F.lit("null"))
        .alias("d"),
    )
    counts = (
        steps.unionByName(ends)
        .groupBy("s", "d")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = counts.groupBy("s").agg(F.sum("c").alias("n"))
    # bounded pull: at most (len(touches)+3)^2 rows regardless of scale
    grid = [
        (r["s"], r["d"], float(r["c"]) / float(r["n"]))
        for r in counts.join(tot, "s").collect()
    ]
    states = [*touches, "start"]

    def _micro(x: float) -> int:
        # exact integer micro-units of the 12dp-rounded value; the
        # DuckDB twin is CAST(ROUND(x, 12) AS DECIMAL(28,12))
        return int(round(round(x, 12) * 1e12))

    def _solve(tr: "list[tuple[str, str, float]]") -> float:
        v = {s: 0.0 for s in states}
        v["conv"], v["null"] = 1.0, 0.0
        for _ in range(iterations):
            nv = {s: 0 for s in states}
            for s, d, p in tr:
                if s in nv:
                    nv[s] += _micro(p * v[d])
            for s in states:
                v[s] = float(nv[s]) / 1e12
        return v["start"]

    base_p = _solve(grid)
    out_rows = []
    effects = []
    for c in touches:
        merged: dict[tuple[str, str], int] = {}
        for s, d, p in grid:
            if s == c:
                continue
            d2 = "null" if d == c else d
            merged[(s, d2)] = merged.get((s, d2), 0) + _micro(p)
        removed_tr = [
            (s, d, float(m) / 1e12) for (s, d), m in merged.items()
        ]
        rp = _solve(removed_tr)
        eff = max(base_p - rp, 0.0)
        effects.append(eff)
        out_rows.append((c, base_p, rp, eff))
    te = sum(effects)
    final = [
        (
            c,
            round(b, 6),
            round(r, 6),
            round(e, 6),
            round(e / te, 6) if te > 0 else None,
        )
        for (c, b, r, e) in out_rows
    ]
    return events.sparkSession.createDataFrame(
        final,
        "touch string, base_conversion double, removed_conversion "
        "double, removal_effect double, share double",
    )
