"""SchemaManager lifecycle tests: versions, checksums, migrations,
rollback, validation (round-1 VERDICT item #9; reference
src/utils/schema_manager.py:79-560)."""

from __future__ import annotations

import pytest

from metadata_etl_framework_spark.catalog.schema_manager import (
    MigrationStep,
    MigrationError,
    SchemaManager,
    SchemaVersionError,
    split_sql_statements,
)
from metadata_etl_framework_spark.catalog.store import MetadataStore


@pytest.fixture()
def mgr():
    return SchemaManager(MetadataStore(":memory:"), schema_name="test_schema")


def test_split_sql_statements_handles_strings_and_comments():
    sql = """
    CREATE TABLE a (x TEXT DEFAULT 'semi;colon');  -- trailing; comment
    CREATE TABLE b (y INT);
    """
    stmts = split_sql_statements(sql)
    assert len(stmts) == 2
    assert "semi;colon" in stmts[0]
    assert stmts[1].startswith("CREATE TABLE b")


def test_apply_and_version_tracking(mgr):
    assert mgr.get_current_schema_version() is None
    assert mgr.apply_schema_sql(
        "CREATE TABLE t1 (id INTEGER PRIMARY KEY, name TEXT);", "1.0", "base"
    )
    assert mgr.get_current_schema_version() == "1.0"
    # idempotent re-apply (same checksum) is a no-op success
    assert mgr.apply_schema_sql(
        "CREATE TABLE t1 (id INTEGER PRIMARY KEY, name TEXT);", "1.0"
    )
    # drift: same version, different SQL → hard error
    with pytest.raises(SchemaVersionError, match="different checksum"):
        mgr.apply_schema_sql("CREATE TABLE other (x INT);", "1.0")


def test_migration_and_rollback_across_instances():
    store = MetadataStore(":memory:")
    mgr = SchemaManager(store, schema_name="s")
    mgr.apply_schema_sql("CREATE TABLE t1 (id INTEGER);", "1.0", "base")
    mgr.apply_migration(
        MigrationStep(
            version="1.1",
            description="add t2",
            up_sql="CREATE TABLE t2 (k INTEGER); ALTER TABLE t1 ADD COLUMN extra TEXT;",
            down_sql="DROP TABLE t2; ALTER TABLE t1 DROP COLUMN extra;",
        )
    )
    assert mgr.get_current_schema_version() == "1.1"
    assert mgr.validate_schema({"t1": ["id", "extra"], "t2": ["k"]}).valid

    # rollback from a FRESH manager over the same store: down_sql persisted
    mgr2 = SchemaManager(store, schema_name="s")
    assert mgr2.rollback_migration("1.1")
    assert mgr2.get_current_schema_version() == "1.0"
    res = mgr2.validate_schema({"t1": ["id", "extra"], "t2": ["k"]})
    assert not res.valid
    assert res.missing_tables == ["t2"]
    assert res.missing_columns == {"t1": ["extra"]}

    with pytest.raises(MigrationError, match="not applied"):
        mgr2.rollback_migration("1.1")


def test_rollback_without_down_sql_refuses(mgr):
    mgr.apply_schema_sql("CREATE TABLE t1 (id INTEGER);", "1.0")
    with pytest.raises(MigrationError, match="no rollback SQL"):
        mgr.rollback_migration("1.0")


def test_failed_statement_raises_and_records_nothing(mgr):
    with pytest.raises(MigrationError, match="statement failed"):
        mgr.apply_schema_sql("CREATE BOGUS SYNTAX;", "2.0")
    assert mgr.get_current_schema_version() is None


def test_schema_info_and_backup(mgr):
    mgr.apply_schema_sql("CREATE TABLE t1 (id INTEGER, v TEXT);", "1.0")
    info = mgr.get_schema_info()
    assert info["version"] == "1.0"
    assert "t1" in info["tables"]
    ddl = mgr.create_backup_script()
    assert "CREATE TABLE t1" in ddl and "SCHEMA_VERSIONS" in ddl
