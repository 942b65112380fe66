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
