"""Invariants of the driver contract surface (__spark_entry__).

The grading driver executes the FIRST 50 queries() entries and joins
them with oracle_sql(); these tests pin the shape so a refactor can't
silently shrink the gate or orphan an oracle."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_driver_gate_is_exactly_fifty_resolvable_entries():
    q = entry_mod.queries()
    assert len(q) == 50
    assert all(callable(f) for f in q.values())


def test_oracles_reference_only_existing_queries():
    q = {**entry_mod.queries(), **entry_mod.extra_queries()}
    o = {**entry_mod.oracle_sql(), **entry_mod.extra_oracle_sql()}
    orphans = set(o) - set(q)
    assert not orphans, orphans


def test_every_entry_is_oracle_backed():
    """No rows-only entries remain anywhere: the former xxhash64-seeded
    trio (simhash_signatures, simhash_near_dups_pairs,
    dedup_ngram_jaccard) now runs the md5 hash arm, which DuckDB
    recomputes bit-for-bit."""
    q = {**entry_mod.queries(), **entry_mod.extra_queries()}
    o = {**entry_mod.oracle_sql(), **entry_mod.extra_oracle_sql()}
    assert set(q) - set(o) == set()


def test_no_duplicate_keys_between_driver_and_extras():
    dk = list(entry_mod.queries())
    ek = list(entry_mod.extra_queries())
    assert len(dk) == len(set(dk))
    assert len(ek) == len(set(ek))
    assert not set(dk) & set(ek)


def test_driver_oracle_coverage_is_fifty_of_fifty():
    assert len(entry_mod.oracle_sql()) == 50  # every driver entry
