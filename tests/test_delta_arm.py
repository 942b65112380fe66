"""Delta MERGE arm (incremental/delta.py): clause composition verified
via an injected DeltaTable fake — delta-spark has no JARs in this
environment, and the reference's own delta strategy is a stub
(incremental_load_manager.py:786-798), so the builder chain is the part
we own and test."""

import pytest

from metadata_etl_framework_spark.incremental.delta import (
    DeltaUnavailableError,
    apply_cdc_delta,
    delta_available,
    merge_condition,
    merge_upsert_delta,
    read_change_feed,
    scd2_merge_delta,
)


class FakeMergeBuilder:
    def __init__(self, log):
        self.log = log

    def whenMatchedUpdateAll(self, condition=None):
        self.log.append(("whenMatchedUpdateAll", condition))
        return self

    def whenMatchedUpdate(self, set=None, condition=None):
        self.log.append(("whenMatchedUpdate", set, condition))
        return self

    def whenMatchedDelete(self, condition=None):
        self.log.append(("whenMatchedDelete", condition))
        return self

    def whenNotMatchedInsertAll(self, condition=None):
        self.log.append(("whenNotMatchedInsertAll", condition))
        return self

    def whenNotMatchedInsert(self, values=None, condition=None):
        self.log.append(("whenNotMatchedInsert", values, condition))
        return self

    def execute(self):
        self.log.append(("execute",))


class FakeDeltaTable:
    def __init__(self, log):
        self.log = log

    def alias(self, a):
        self.log.append(("alias", a))
        return self

    def merge(self, source, condition):
        self.log.append(("merge", condition))
        return FakeMergeBuilder(self.log)


def _ops(log):
    return [e[0] for e in log]


def test_delta_not_available_here_and_error_is_actionable(spark):
    assert not delta_available()
    with pytest.raises(DeltaUnavailableError, match="delta-spark"):
        read_change_feed(spark, "/tmp/some_delta_table")


def test_merge_condition_is_null_safe():
    assert merge_condition(["k1", "k2"]) == "t.k1 <=> s.k1 AND t.k2 <=> s.k2"


@pytest.mark.parametrize(
    "mode,expected",
    [
        ("upsert", ["whenMatchedUpdateAll", "whenNotMatchedInsertAll"]),
        ("insert_only", ["whenNotMatchedInsertAll"]),
        ("update_only", ["whenMatchedUpdateAll"]),
    ],
)
def test_merge_upsert_delta_clauses(spark, mode, expected):
    log = []
    src = spark.createDataFrame([(1, "a")], "k int, v string")
    merge_upsert_delta(
        spark, "tbl", src, ["k"], mode,
        delta_table_factory=lambda s, t: FakeDeltaTable(log),
    )
    assert _ops(log) == ["alias", "merge"] + expected + ["execute"]
    assert ("merge", "t.k <=> s.k") in log


def test_merge_upsert_delta_rejects_unknown_mode(spark):
    src = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="unknown merge mode"):
        merge_upsert_delta(spark, "tbl", src, ["k"], "replace",
                           delta_table_factory=lambda s, t: FakeDeltaTable([]))


def test_apply_cdc_delta_routes_ops(spark):
    log = []
    ev = spark.createDataFrame(
        [(1, "x", "INSERT")], "k int, v string, op string"
    )
    apply_cdc_delta(
        spark, "tbl", ev, ["k"],
        delta_table_factory=lambda s, t: FakeDeltaTable(log),
    )
    assert _ops(log) == [
        "alias", "merge", "whenMatchedDelete", "whenMatchedUpdate",
        "whenNotMatchedInsert", "execute",
    ]
    assert ("whenMatchedDelete", "s.op = 'DELETE'") in log
    # BOTH arms exclude the op column: with Delta schema autoMerge on,
    # UPDATE SET * would evolve the CDC op column into the target
    upd = [e for e in log if e[0] == "whenMatchedUpdate"][0]
    assert upd[1] == {"k": "s.k", "v": "s.v"} and upd[2] == "s.op <> 'DELETE'"
    ins = [e for e in log if e[0] == "whenNotMatchedInsert"][0]
    assert ins[1] == {"k": "s.k", "v": "s.v"} and ins[2] == "s.op <> 'DELETE'"


def test_scd2_merge_delta_closes_then_appends(spark):
    log, appended = [], []
    changes = spark.createDataFrame(
        [(1, "new", "UPDATE"), (2, "brand", "INSERT")],
        "k int, v string, change_type string",
    )
    scd2_merge_delta(
        spark, "dim", changes, ["k"], "2024-01-02 00:00:00",
        delta_table_factory=lambda s, t: FakeDeltaTable(log),
        append_writer=lambda df: appended.append(df),
    )
    merge_cond = [e for e in log if e[0] == "merge"][0][1]
    assert merge_cond == "t.k <=> s.k AND t.is_current = true"
    upd = [e for e in log if e[0] == "whenMatchedUpdate"][0]
    assert upd[1]["is_current"] == "false"
    assert "2024-01-02 00:00:00" in upd[1]["end_date"]
    (new_versions,) = appended
    rows = {
        (r["k"], r["is_current"], r["end_date"]) for r in new_versions.collect()
    }
    # both UPDATE and INSERT change rows become open current versions
    assert rows == {(1, True, None), (2, True, None)}
    assert "change_type" not in new_versions.columns
