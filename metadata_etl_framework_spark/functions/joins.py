"""Join operators.

Parity targets (reference):
- inner_join / left_join   src/transform/transformation_library.py:403-461
- merge_multiple           src/transform/transformation_library.py:463-493
- join (step type)         src/transform/transform_engine.py:178-197
- referential integrity    src/quality/dq_rule_examples.py:737-779
- detect_deletes           src/utils/incremental_load_manager.py:167-189

Scale notes: all joins here are equi-joins, so Catalyst + AQE pick
broadcast-hash vs sort-merge at runtime. `auto_broadcast` force-hints the
build side for known-small dimensions (nation/region-sized tables), which
removes the shuffle entirely on the 100 TB fact side.
"""

from __future__ import annotations

from functools import reduce
from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_broadcast(df: DataFrame, broadcast: bool) -> DataFrame:
    return F.broadcast(df) if broadcast else df


def inner_join(
    left: DataFrame, right: DataFrame, on: str | Sequence[str], broadcast: bool = False
) -> DataFrame:
    on = [on] if isinstance(on, str) else list(on)
    return left.join(_maybe_broadcast(right, broadcast), on, "inner")


def left_join(
    left: DataFrame, right: DataFrame, on: str | Sequence[str], broadcast: bool = False
) -> DataFrame:
    on = [on] if isinstance(on, str) else list(on)
    return left.join(_maybe_broadcast(right, broadcast), on, "left")


def join_data(
    left: DataFrame,
    right: DataFrame,
    how: str = "inner",
    left_on: str | Sequence[str] | None = None,
    right_on: str | Sequence[str] | None = None,
    on: str | Sequence[str] | None = None,
    broadcast: bool = False,
) -> DataFrame:
    """General equi-join with either shared ``on`` keys or left_on/right_on.

    With distinct key names the right key column is dropped after the join
    (reference merge semantics keep one key column when names collide).
    """
    right = _maybe_broadcast(right, broadcast)
    if on is not None:
        keys = [on] if isinstance(on, str) else list(on)
        return left.join(right, keys, how)
    lks = [left_on] if isinstance(left_on, str) else list(left_on or [])
    rks = [right_on] if isinstance(right_on, str) else list(right_on or [])
    if len(lks) != len(rks) or not lks:
        raise ValueError("left_on and right_on must be same-length, non-empty")
    cond = reduce(
        lambda a, b: a & b, [left[lk] == right[rk] for lk, rk in zip(lks, rks)]
    )
    joined = left.join(right, cond, how)
    # drop duplicate right-side key columns where the name differs
    for lk, rk in zip(lks, rks):
        if lk != rk and rk in left.columns:
            continue
        if lk != rk:
            joined = joined.drop(right[rk])
    return joined


def merge_multiple(
    dfs: Iterable[DataFrame], on: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """Left-fold N frames with one key set + join type."""
    dfs = list(dfs)
    if not dfs:
        raise ValueError("merge_multiple needs at least one DataFrame")
    keys = [on] if isinstance(on, str) else list(on)
    return reduce(lambda a, b: a.join(b, keys, how), dfs)


def referential_integrity_violations(
    data: DataFrame, ref: DataFrame, fk: str, pk: str, broadcast: bool = True
) -> DataFrame:
    """Rows of ``data`` whose ``fk`` has no match in ``ref.pk`` (anti-join).

    Null FKs are not violations (reference checks non-null values only).
    The reference materialized the PK set in memory; at scale this is a
    broadcast left_anti join instead.
    """
    ref_keys = ref.select(F.col(pk).alias(fk)).dropDuplicates()
    return data.filter(F.col(fk).isNotNull()).join(
        _maybe_broadcast(ref_keys, broadcast), [fk], "left_anti"
    )


def detect_deletes(
    target: DataFrame, source: DataFrame, keys: str | Sequence[str]
) -> DataFrame:
    """Rows present in target but absent from source (delete candidates)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return target.join(source.select(*keys).dropDuplicates(), keys, "left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: Sequence[str] = (),
    right_ts_col: str | None = None,
    value_cols: Sequence[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of (backward) join: each left row picks the LATEST right row with
    ``right_ts <= left_ts`` within the same ``by`` keys — the time-series
    join Spark lacks natively (pandas ``merge_asof`` / DuckDB ``ASOF
    JOIN`` semantics).

    Scale design: expressed as a COMPOSITION of built-in operators — tag
    both sides, union, one window sorted by (by, ts, side) carrying the
    last non-null right values forward — so the whole join is ONE shuffle
    on the ``by`` keys + a sort, no UDF, no range-explosion. This is the
    standard distributed as-of formulation; a per-key range join would
    explode, and a broadcast would cap the right side.

    ``tolerance`` (e.g. ``"30 minutes"``) nulls the match when the right
    row is older than ``left_ts - tolerance``. Right timestamp arrives as
    ``{right_ts_col}{suffix}``.
    """
    from pyspark.sql import Window

    right_ts_col = right_ts_col or ts_col
    by = list(by)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in by and c != right_ts_col
        ]
    value_cols = list(value_cols)
    matched_ts = f"{right_ts_col}{suffix}"

    l_tagged = left.withColumn("_side", F.lit(1)).withColumn(
        "_r", F.lit(None).cast(
            "struct<" + ", ".join(
                [f"{matched_ts}:timestamp"]
                + [
                    f"{c}{suffix}:{right.schema[c].dataType.simpleString()}"
                    for c in value_cols
                ]
            ) + ">"
        )
    )
    # the right row travels as ONE atomic struct: per-column last() would
    # mix values from different right rows when a value column is null
    r_struct = F.struct(
        F.col(right_ts_col).cast("timestamp").alias(matched_ts),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    r_tagged = right.select(
        *by,
        F.col(right_ts_col).alias(ts_col),
        r_struct.alias("_r"),
    ).withColumn("_side", F.lit(0))

    merged = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    # same-timestamp right row is visible to the left row (<= semantics)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.withColumn("_r", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).drop("_side")
    if tolerance is not None:
        stale = F.col(f"_r.{matched_ts}") < (
            F.col(ts_col) - F.expr(f"INTERVAL {tolerance}")
        )
        out = out.withColumn("_r", F.when(~stale, F.col("_r")))
    return out.select(
        *[c for c in out.columns if c != "_r"],
        *[F.col(f"_r.{matched_ts}").alias(matched_ts)]
        + [F.col(f"_r.{c}{suffix}").alias(f"{c}{suffix}") for c in value_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_size: float | None = None,
    extra_on: Sequence[str] = (),
) -> DataFrame:
    """Point-in-interval join without a cartesian product: the binned
    range-join strategy (each interval explodes into the fixed-width bins
    it covers; points hash to their bin; an EQUI-join on bin + optional
    keys narrows candidates, then the exact BETWEEN filter applies).

    Spark's optimizer turns a bare ``point BETWEEN lo AND hi`` join into
    a broadcast-nested-loop/cartesian — dead at scale. Binning makes it a
    hash shuffle whose fan-out is ``interval_width / bin_size`` rows per
    interval: pick ``bin_size`` near the typical interval width so each
    interval lands in O(1) bins.

    ``bin_size=None`` (default) derives it from the MEDIAN interval width
    in one cheap aggregate, so a few pathologically wide intervals can't
    explode the fan-out the way a too-small caller-chosen bin would: a
    single interval 1000× the median still lands in ~1000 bins (bounded by
    its own width), while the typical interval stays in 1-2 bins.
    """
    if bin_size is None:
        med = intervals.select(
            F.percentile_approx(
                F.col(hi_col) - F.col(lo_col), F.lit(0.5)
            ).alias("m")
        ).collect()[0]["m"]
        # median width 0 (point intervals) or all-null → fall back to 1.0
        bin_size = float(med) if med else 1.0
    b = float(bin_size)
    if b <= 0:
        raise ValueError(f"bin_size must be positive, got {bin_size!r}")
    # drop malformed/null intervals: sequence(lo_bin, hi_bin) would emit a
    # DESCENDING bin range for lo > hi instead of an empty one
    valid = intervals.filter(
        F.col(lo_col).isNotNull()
        & F.col(hi_col).isNotNull()
        & (F.col(lo_col) <= F.col(hi_col))
    )
    binned_intervals = valid.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b).cast("long"),
                F.floor(F.col(hi_col) / b).cast("long"),
            )
        ),
    )
    binned_points = points.withColumn(
        "_bin", F.floor(F.col(point_col) / b).cast("long")
    )
    on = ["_bin", *extra_on]
    return (
        binned_points.join(binned_intervals, on)
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("_bin")
    )


def range_count(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    target_bins: int = 16384,
) -> DataFrame:
    """Aggregate pushdown through a range join: per-interval COUNT of
    points falling in ``[lo, hi]``, computed as a CDF difference —
    ``count = rank_le(hi) - rank_lt(lo)`` — over a binned histogram of
    the points. The point×interval match set is NEVER materialized.

    Each rank resolves as (cumulative count of whole bins strictly below
    the bound's bin, from a broadcast dense cumulative histogram) plus
    (points on the correct side of the bound *within its single bin*,
    via an equi-join on that one bin with map-side partial aggregation).
    Shuffle volume is O(points + distinct bounds), independent of the
    match count — ``range_join(...).groupBy().count()`` shuffles
    O(matches) instead, which for a selective band query at 100 TB can
    be 10^11 rows that exist only to be counted. Returns the interval
    rows with an appended ``n_matches``; intervals with zero matching
    points are kept with ``n_matches = 0`` (callers wanting inner-join
    semantics filter ``n_matches > 0``).

    Reference parity: counting/validation arm of the range-condition
    join (src/transform/transformation_library.py join family); the
    rewrite itself is the classic band-join count optimization.
    """
    valid = intervals.filter(
        F.col(lo_col).isNotNull()
        & F.col(hi_col).isNotNull()
        & (F.col(lo_col) <= F.col(hi_col))
    )
    pts = points.select(F.col(point_col).cast("double").alias("_pt")).filter(
        F.col("_pt").isNotNull()
    )
    # bounded driver-side aggregate (3 scalars) to size the bins
    stats = pts.agg(
        F.min("_pt").alias("mn"), F.max("_pt").alias("mx")
    ).collect()[0]
    if stats["mn"] is None:
        return valid.withColumn("n_matches", F.lit(0).cast("long"))
    mn, mx = float(stats["mn"]), float(stats["mx"])
    span = mx - mn
    b = span / target_bins if span > 0 else 1.0
    min_bin = int(mn // b)
    max_bin = int(mx // b)

    spark = points.sparkSession
    hist = pts.groupBy(
        F.floor(F.col("_pt") / b).cast("long").alias("_bin")
    ).agg(F.count(F.lit(1)).alias("_cnt"))
    # dense bin spine so every bound's (clamped) bin has a cumulative row
    spine = (
        spark.range(1)
        .select(
            F.explode(F.sequence(F.lit(min_bin), F.lit(max_bin))).alias("_b0")
        )
        .select(F.col("_b0").cast("long").alias("_bin"))
    )
    # cumulative over <= target_bins rows: the single-partition window is
    # deliberate and tiny (the histogram, not the data)
    from pyspark.sql.window import Window

    dense = (
        spine.join(hist, "_bin", "left")
        .select("_bin", F.coalesce("_cnt", F.lit(0)).alias("_cnt"))
    )
    cum = dense.select(
        "_bin",
        F.coalesce(
            F.sum("_cnt").over(
                Window.orderBy("_bin").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_cum"),
    )

    # distinct bound values; rank is a function of (side, value) alone,
    # so duplicate bounds across intervals collapse before any join
    bnds = (
        valid.select(F.col(lo_col).cast("double").alias("_v"),
                     F.lit("lo").alias("_side"))
        .unionByName(
            valid.select(F.col(hi_col).cast("double").alias("_v"),
                         F.lit("hi").alias("_side"))
        )
        .distinct()
        .withColumn(
            "_bin",
            F.least(
                F.greatest(
                    F.floor(F.col("_v") / b).cast("long"), F.lit(min_bin)
                ),
                F.lit(max_bin),
            ),
        )
        .join(F.broadcast(cum), "_bin")
    )

    # points join ONLY the bounds sharing their single bin; the aggregate
    # is partial (map-side combine) before the 2×|intervals|-group shuffle
    pb = pts.withColumn("_bin", F.floor(F.col("_pt") / b).cast("long"))
    inbin = (
        pb.join(F.broadcast(bnds.select("_side", "_v", "_bin")), "_bin")
        .groupBy("_side", "_v")
        .agg(
            F.sum(
                F.when(
                    ((F.col("_side") == "hi") & (F.col("_pt") <= F.col("_v")))
                    | ((F.col("_side") == "lo") & (F.col("_pt") < F.col("_v"))),
                    1,
                ).otherwise(0)
            ).alias("_inb")
        )
    )
    from pyspark.storagelevel import StorageLevel

    # referenced twice below (lo side, hi side): persist so the histogram
    # + in-bin join lineage runs once; 2×|distinct bounds| rows of scalars
    ranks = (
        bnds.join(inbin, ["_side", "_v"], "left")
        .select(
            "_side", "_v",
            (F.col("_cum") + F.coalesce(F.col("_inb"), F.lit(0))).alias("_rank"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rank_hi = ranks.filter(F.col("_side") == "hi").select(
        F.col("_v").alias("_hv"), F.col("_rank").alias("_rank_hi")
    )
    rank_lo = ranks.filter(F.col("_side") == "lo").select(
        F.col("_v").alias("_lv"), F.col("_rank").alias("_rank_lo")
    )
    return (
        valid.join(F.broadcast(rank_hi), F.col(hi_col) == F.col("_hv"))
        .join(F.broadcast(rank_lo), F.col(lo_col) == F.col("_lv"))
        .withColumn(
            "n_matches", (F.col("_rank_hi") - F.col("_rank_lo")).cast("long")
        )
        .drop("_hv", "_lv", "_rank_hi", "_rank_lo")
    )


def fuzzy_join_blocked(
    left: DataFrame,
    right: DataFrame,
    block_on: "Sequence[str]",
    left_text: str,
    right_text: str,
    max_distance: int = 2,
    left_key: str | None = None,
    right_key: str | None = None,
    suffixes: "tuple[str, str]" = ("_l", "_r"),
    sort_output: bool = False,
) -> DataFrame:
    """Blocked fuzzy (edit-distance) join — the entity-resolution /
    record-linkage primitive: candidate pairs come from an EQUI-join on
    ``block_on`` (nation, zip prefix, soundex, …), then survive only if
    ``levenshtein(left_text, right_text) <= max_distance``.

    The blocking key is the whole scale story: without it fuzzy matching
    is an O(n·m) cross join — the canonical 100-TB killer. With it the
    plan is an ordinary shuffled equi-join whose cost is Σ per-block
    |L_b|·|R_b|; choose blocks so the largest product stays bounded
    (standard ER practice — block harder before matching looser).
    Levenshtein runs JVM-side (`F.levenshtein`), no UDF.

    Self-join dedup: pass ``left_key``/``right_key`` (same column on
    both sides) and pairs are restricted to ``left_key < right_key`` —
    each undirected pair once, no self-matches.

    Output: block columns, ``{left_text}{suffixes[0]}``,
    ``{right_text}{suffixes[1]}``, key columns likewise suffixed when
    given, and ``distance`` (int). Unordered by default —
    ``sort_output=True`` adds a presentation sort ascending by keys,
    which is a GLOBAL sort (one extra range-shuffle of the full match
    set): leave it off in pipelines and order in the consumer.
    """
    sl, sr = suffixes
    lt, rt = f"{left_text}{sl}", f"{right_text}{sr}"
    lsel = [F.col(c) for c in block_on] + [F.col(left_text).alias(lt)]
    rsel = [F.col(c) for c in block_on] + [F.col(right_text).alias(rt)]
    out_keys: list[str] = []
    if left_key:
        lk = f"{left_key}{sl}"
        lsel.append(F.col(left_key).alias(lk))
        out_keys.append(lk)
    if right_key:
        rk = f"{right_key}{sr}"
        rsel.append(F.col(right_key).alias(rk))
        out_keys.append(rk)
    pairs = left.select(*lsel).join(right.select(*rsel), list(block_on))
    if left_key and right_key:
        pairs = pairs.where(F.col(out_keys[0]) < F.col(out_keys[1]))
    dist = F.levenshtein(F.col(lt), F.col(rt))
    out = pairs.withColumn("distance", dist.cast("int")).where(
        F.col("distance") <= int(max_distance)
    )
    if sort_output:
        order = out_keys if out_keys else [lt, rt]
        out = out.orderBy(*order)
    return out


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: "Sequence[str]",
    fact_ts: str,
    start_col: str,
    end_col: str | None = None,
    value_cols: "Sequence[str] | None" = None,
    suffix: str = "_dim",
) -> DataFrame:
    """Feature-store point-in-time join: every fact row is enriched with
    the dimension VERSION valid at its timestamp — latest ``start_col``
    ≤ fact time, and (when ``end_col`` is given) fact time strictly
    before the version's end. Two correctness properties training
    pipelines break without this: no data from the FUTURE leaks into a
    feature (the as-of direction), and no EXPIRED version survives past
    its end (a deleted/closed key must stop matching, not keep serving
    its last value).

    Built on :func:`asof_join`'s union+window composition — ONE shuffle
    on the keys, no per-key range explosion, no broadcast cap on the
    dimension. An expired or missing match leaves the carried columns
    NULL. Carried columns arrive as ``{col}{suffix}``.
    """
    keys = list(keys)
    if value_cols is None:
        value_cols = [
            c
            for c in dim.columns
            if c not in keys and c not in (start_col, end_col)
        ]
    carried = list(value_cols) + ([end_col] if end_col else [])
    out = asof_join(
        facts,
        dim,
        ts_col=fact_ts,
        by=keys,
        right_ts_col=start_col,
        value_cols=carried,
        suffix=suffix,
    )
    if end_col:
        e = F.col(f"{end_col}{suffix}")
        # evaluate expiry BEFORE nulling any carried column (it reads
        # the matched end itself)
        out = out.withColumn(
            "_pit_expired",
            e.isNotNull() & (F.col(fact_ts).cast("timestamp") >= e),
        )
        for c in [start_col] + carried:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(~F.col("_pit_expired"), F.col(f"{c}{suffix}")),
            )
        out = out.drop("_pit_expired")
    return out
