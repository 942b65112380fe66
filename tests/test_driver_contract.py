"""Invariants of the driver contract surface (__spark_entry__).

The grading driver executes the FIRST 50 queries() entries and joins
them with oracle_sql(); these tests pin the shape so a refactor can't
silently shrink the gate or orphan an oracle."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_driver_gate_is_exactly_fifty_resolvable_entries():
    # round 13: the hard gate grew past the historical 50 — it now
    # carries the rotated 50 PLUS every new-round flagship (gated from
    # day one); pin the floor and the _DRIVER_KEYS agreement instead
    # of a fixed count
    q = entry_mod.queries()
    assert len(q) >= 50
    assert list(q) == list(entry_mod._DRIVER_KEYS)
    assert all(callable(f) for f in q.values())


def test_oracles_reference_only_existing_queries():
    q = {**entry_mod.queries(), **entry_mod.extra_queries()}
    o = {**entry_mod.oracle_sql(), **entry_mod.extra_oracle_sql()}
    orphans = set(o) - set(q)
    assert not orphans, orphans


def test_every_entry_is_oracle_backed():
    """Every entry has a DuckDB oracle EXCEPT the explicitly declared
    ROWS_ONLY_KEYS (non-SQL-expressible results — eigen-decomposition —
    pinned against numpy in tests/test_units.py instead). Anything else
    without an oracle is a contract failure, and a rows-only entry must
    never sit in the 50-entry hard driver gate."""
    q = {**entry_mod.queries(), **entry_mod.extra_queries()}
    o = {**entry_mod.oracle_sql(), **entry_mod.extra_oracle_sql()}
    assert set(q) - set(o) == set(entry_mod.ROWS_ONLY_KEYS)
    assert not set(entry_mod.ROWS_ONLY_KEYS) & set(entry_mod.queries())
    # rows-only stays an exceptional, enumerated state — never a bucket
    assert len(entry_mod.ROWS_ONLY_KEYS) <= 2


def test_no_duplicate_keys_between_driver_and_extras():
    dk = list(entry_mod.queries())
    ek = list(entry_mod.extra_queries())
    assert len(dk) == len(set(dk))
    assert len(ek) == len(set(ek))
    assert not set(dk) & set(ek)


def test_driver_oracle_coverage_is_fifty_of_fifty():
    # every driver entry is oracle-backed (gate may exceed 50 — see
    # test_driver_gate_is_exactly_fifty_resolvable_entries)
    assert len(entry_mod.oracle_sql()) == len(entry_mod.queries())
