"""Two-level exact pico-int aggregation — the fast path for the
engine's DECIMAL numeric-parity convention.

Every trainer in the repo (GLM family, GMM, CV grids, the two-sample
statistics) accumulates per-row terms rounded to pico-ints (×10¹²) and
summed EXACTLY so results are merge-order free and cross-engine
reproducible. The straightforward form — ``SUM(CAST(ROUND(t·1e12) AS
DECIMAL(38,0)))`` — pays ~1 µs/row per distinct stream (builder-profiled
r13: the 16-byte non-compact decimal buffer dominates the aggregation
update), which made the iterative trainers the slowest headline queries.

This module keeps the exactness and drops the cost with a TWO-LEVEL sum:

1. **Level 1**: group rows by ``(spark_partition_id(), mono_id % B)`` —
   a deterministic-by-construction round-robin split of every partition
   into ``B`` even sub-buckets — and sum each pico term as a plain
   LONG. The partial fits: per-group rows ≈ partition_rows / B, and the
   pico grid's documented per-row bound (|t·1e12| ≲ 1e13, see
   ops/glm.py::linear_train) keeps the partial ≤ ~1e13 ·
   partition_rows / B ≪ 2⁶³ for any sane partition size (a 128 MB
   parquet split is ≤ ~5·10⁷ rows; with B = 256 that is ≥ 45× margin).
   Spark ANSI mode is ON, so a genuine overflow fails LOUDLY instead of
   wrapping — raise ``sub_buckets`` if a workload ever trips it.
2. **Level 2**: sum the ≤ #partitions·B long partials as
   DECIMAL(38,0) — exact at any scale, over a vanishingly small frame.

Integer addition is associative and commutative, so the regrouped total
is BIT-IDENTICAL to the single-level decimal sum — the grouping key
(partition id, row index) can be nondeterministic across runs without
affecting the result, which is why this passes the repo's value-hash
oracle gates unchanged. Measured at sf0.1 (600k rows × 5 streams):
3.7 s single-level decimal → 1.1 s two-level (3.3×); the level-1 partial
aggregation collapses fully map-side (≤ B groups per task), so the
shuffle carries O(partitions · B) rows of longs, never row-scale data.

Scale note (100 TB): level-1 output is ``partitions × B`` rows — at
1e6 partitions × 256 that is 2.6e8 tiny rows through one exchange,
still far below fact scale; lower ``sub_buckets`` if partials are known
small, raise it for hot rows. The per-row pico bound is the caller's
contract, exactly as it already is for the single-level form.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["exact_pico_sums"]

_COUNT_ALIAS = "__c"

# Below this many row×stream decimal updates the two-level split LOSES:
# the level-1 (partition, sub-bucket) grouping pass plus the extra
# exchange cost more than the decimal buffers they avoid. Measured r14→r15
# on the driver bench: poisson (5 streams × ~15k customer rows × 4 passes)
# regressed 1.89 → 2.62 s under blanket adoption, while every call site
# above ~3M row-streams per pass (huber 20 streams × 600k, GMM, the CV
# grids) won 1.6–4×. Callers that know their row count pass ``row_hint``
# and the split engages only when it pays; unknown-size callers keep the
# two-level form, which is the right default at data scale.
# r17 re-measurement of the crossover (min-of-3 at local[32], cached
# orders projections, 6 decimal streams): 90k row-streams single 0.58 s
# vs two-level 0.65 s; 300k row-streams tied (0.52/0.56); 900k
# row-streams single 1.09 s vs two-level 0.62 s — the old 2M threshold
# kept the 150k-row orders trainers (9 streams ≈ 1.35M row-streams,
# where two-level measured 2.07 → 1.32 s/pass) on the slow arm.
_TWO_LEVEL_MIN_ROW_STREAMS = 400_000


def exact_pico_sums(
    df: DataFrame,
    pico_terms: "Mapping[str, Column]",
    group_cols: "Sequence[str]" = (),
    long_terms: "Mapping[str, Column] | None" = None,
    count_alias: "str | None" = None,
    sub_buckets: int = 256,
    row_hint: "int | None" = None,
) -> DataFrame:
    """Exact grouped sums of pico-scaled terms via bounded long partials.

    ``pico_terms``: alias → double expression ``t``; the output column
    is the exact DECIMAL(38,0) total of ``ROUND(t·1e12)`` (bit-identical
    to the single-level decimal sum — see module docstring).
    ``long_terms``: alias → integer expression summed exactly as long at
    level 1 and as DECIMAL(38,0) at level 2 (counters, 0/1 hits).
    ``count_alias``: when set, adds an exact row count (long, 0 for an
    empty global group rather than NULL).
    ``group_cols``: optional caller grouping (e.g. a CV fold) — output
    has one row per present group, like ``df.groupBy(...).agg(...)``.
    ``row_hint``: approximate input row count when the caller already
    knows it (iterative trainers count rows on their init pass). When
    ``row_hint × streams`` is below ``_TWO_LEVEL_MIN_ROW_STREAMS`` the
    two-level split is skipped for the plain single-level DECIMAL sum —
    bit-identical output, one exchange fewer, cheaper on small frames
    (see the threshold note above). Omit it (the default) to keep the
    two-level form, the right call at unknown/large scale.
    """
    if not pico_terms and not long_terms and count_alias is None:
        raise ValueError("exact_pico_sums: nothing to aggregate")
    if sub_buckets < 1:
        raise ValueError("sub_buckets must be >= 1")
    pico = F.lit(1e12)
    streams = len(pico_terms) + len(long_terms or {})
    if (
        row_hint is not None
        and row_hint * max(streams, 1) < _TWO_LEVEL_MIN_ROW_STREAMS
    ):
        aggs = [
            F.sum(F.round(t * pico).cast("decimal(38,0)")).alias(k)
            for k, t in pico_terms.items()
        ]
        aggs += [
            F.sum(t.cast("decimal(38,0)")).alias(k)
            for k, t in (long_terms or {}).items()
        ]
        if count_alias is not None:
            aggs.append(
                F.coalesce(F.count(F.lit(1)), F.lit(0)).alias(count_alias)
            )
        if group_cols:
            return df.groupBy(*group_cols).agg(*aggs)
        return df.agg(*aggs)
    l1_aggs = [
        F.sum(F.round(t * pico).cast("long")).alias(k)
        for k, t in pico_terms.items()
    ]
    l1_aggs += [
        F.sum(t.cast("long")).alias(k)
        for k, t in (long_terms or {}).items()
    ]
    if count_alias is not None:
        l1_aggs.append(F.count(F.lit(1)).alias(_COUNT_ALIAS))
    l1 = df.groupBy(
        *group_cols,
        F.spark_partition_id().alias("__pb"),
        F.pmod(F.monotonically_increasing_id(), F.lit(int(sub_buckets)))
        .alias("__sb"),
    ).agg(*l1_aggs)
    l2_aggs = [
        F.sum(F.col(k).cast("decimal(38,0)")).alias(k)
        for k in pico_terms
    ]
    l2_aggs += [
        F.sum(F.col(k).cast("decimal(38,0)")).alias(k)
        for k in (long_terms or {})
    ]
    if count_alias is not None:
        l2_aggs.append(
            F.coalesce(F.sum(_COUNT_ALIAS), F.lit(0)).alias(count_alias)
        )
    if group_cols:
        return l1.groupBy(*group_cols).agg(*l2_aggs)
    return l1.agg(*l2_aggs)
