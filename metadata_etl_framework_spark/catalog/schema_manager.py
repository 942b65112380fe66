"""Metadata-store schema lifecycle: versions, checksums, migrations,
rollback, structure validation, DDL backup.

Parity target: ``SchemaManager`` (reference:
src/utils/schema_manager.py:79-560) — version-tracking table
(:107-143), current-version lookup (:145-169), apply-from-file with
statement splitting + checksum (:171-222), apply/rollback migration
(:224-300), structure validation (:301-349, :557-595), backup script
(:400-462). Runs against the sqlite-backed ``MetadataStore`` (the
engine's control plane); the SQL surface is standard DDL so the same
flow ports to Postgres/MySQL unchanged.

Beyond the reference: the down_sql is PERSISTED with the version record,
so rollback works across process restarts (the reference could only roll
back migrations registered in the same process), and a checksum DRIFT
(same version, different SQL) raises instead of silently skipping.
"""

from __future__ import annotations

import hashlib
import time
from dataclasses import dataclass, field

from metadata_etl_framework_spark.catalog.store import MetadataStore


class SchemaVersionError(Exception):
    pass


class MigrationError(Exception):
    pass


def _checksum(sql: str) -> str:
    return hashlib.sha256(sql.encode()).hexdigest()


@dataclass
class MigrationStep:
    version: str
    description: str
    up_sql: str
    down_sql: str | None = None
    checksum: str = field(default="")

    def __post_init__(self):
        if not self.checksum:
            self.checksum = _checksum(self.up_sql)


@dataclass
class SchemaValidationResult:
    valid: bool
    missing_tables: list[str]
    missing_columns: dict[str, list[str]]


def split_sql_statements(sql: str) -> list[str]:
    """Split a DDL script on ';' outside string literals / line comments
    (reference: schema_manager.py:464-494)."""
    statements: list[str] = []
    buf: list[str] = []
    in_string: str | None = None
    i = 0
    while i < len(sql):
        ch = sql[i]
        if in_string:
            buf.append(ch)
            if ch == in_string:
                in_string = None
        elif ch in ("'", '"'):
            in_string = ch
            buf.append(ch)
        elif ch == "-" and sql[i : i + 2] == "--":
            nl = sql.find("\n", i)
            i = len(sql) if nl < 0 else nl
            continue
        elif ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                statements.append(stmt)
            buf = []
        else:
            buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        statements.append(tail)
    return statements


class SchemaManager:
    VERSION_TABLE = "SCHEMA_VERSIONS"

    def __init__(self, store: MetadataStore, schema_name: str = "etl_metadata",
                 applied_by: str = "engine"):
        self.store = store
        self.schema_name = schema_name
        self.applied_by = applied_by
        self._ensure_schema_tracking()

    # ------------------------------------------------------------- tracking

    def _ensure_schema_tracking(self) -> None:
        self.store.execute(
            f"""
            CREATE TABLE IF NOT EXISTS {self.VERSION_TABLE} (
                schema_name TEXT NOT NULL,
                version TEXT NOT NULL,
                checksum TEXT NOT NULL,
                description TEXT,
                down_sql TEXT,
                applied_at REAL,
                applied_by TEXT,
                PRIMARY KEY (schema_name, version)
            )
            """
        )

    def get_current_schema_version(self, schema_name: str | None = None) -> str | None:
        rows = self.store.query(
            f"SELECT version FROM {self.VERSION_TABLE} WHERE schema_name = ? "
            "ORDER BY applied_at DESC LIMIT 1",
            (schema_name or self.schema_name,),
        )
        return rows[0]["version"] if rows else None

    def history(self, schema_name: str | None = None) -> list[dict]:
        return self.store.query(
            f"SELECT version, checksum, description, applied_at, applied_by "
            f"FROM {self.VERSION_TABLE} WHERE schema_name = ? "
            "ORDER BY applied_at",
            (schema_name or self.schema_name,),
        )

    def _record(self, version: str, checksum: str, description: str,
                down_sql: str | None) -> None:
        self.store.insert(
            self.VERSION_TABLE,
            {
                "schema_name": self.schema_name,
                "version": version,
                "checksum": checksum,
                "description": description,
                "down_sql": down_sql,
                "applied_at": time.time(),
                "applied_by": self.applied_by,
            },
        )

    def _applied(self, version: str) -> dict | None:
        rows = self.store.query(
            f"SELECT * FROM {self.VERSION_TABLE} "
            "WHERE schema_name = ? AND version = ?",
            (self.schema_name, version),
        )
        return rows[0] if rows else None

    # ------------------------------------------------------------ lifecycle

    def apply_schema_sql(self, schema_sql: str, version: str,
                         description: str = "",
                         down_sql: str | None = None) -> bool:
        """Apply a (possibly multi-statement) DDL script as ``version``.

        Idempotent on same version+checksum; same version with DIFFERENT
        SQL raises (drift must be a new version, never a silent skip)."""
        checksum = _checksum(schema_sql)
        existing = self._applied(version)
        if existing:
            if existing["checksum"] != checksum:
                raise SchemaVersionError(
                    f"version {version} already applied with a different "
                    f"checksum — register the change as a new version"
                )
            return True
        for stmt in split_sql_statements(schema_sql):
            try:
                self.store.execute(stmt)
            except Exception as e:
                raise MigrationError(f"statement failed in {version}: {e}") from e
        self._record(version, checksum, description, down_sql)
        return True

    def apply_schema_from_file(self, schema_file: str, version: str,
                               description: str = "") -> bool:
        with open(schema_file, encoding="utf-8") as f:
            return self.apply_schema_sql(f.read(), version, description)

    def apply_migration(self, migration: MigrationStep) -> bool:
        return self.apply_schema_sql(
            migration.up_sql, migration.version, migration.description,
            migration.down_sql,
        )

    def rollback_migration(self, version: str) -> bool:
        """Run the persisted down_sql and delete the version record."""
        existing = self._applied(version)
        if not existing:
            raise MigrationError(f"version {version} is not applied")
        down = existing.get("down_sql")
        if not down:
            raise MigrationError(f"no rollback SQL recorded for {version}")
        for stmt in split_sql_statements(down):
            try:
                self.store.execute(stmt)
            except Exception as e:
                raise MigrationError(f"rollback failed for {version}: {e}") from e
        self.store.execute(
            f"DELETE FROM {self.VERSION_TABLE} "
            "WHERE schema_name = ? AND version = ?",
            (self.schema_name, version),
        )
        return True

    # ----------------------------------------------------------- inspection

    def _current_tables(self) -> set[str]:
        rows = self.store.query(
            "SELECT name FROM sqlite_master WHERE type = 'table'"
        )
        return {r["name"] for r in rows}

    def _table_columns(self, table: str) -> set[str]:
        rows = self.store.query(f"PRAGMA table_info({table})")
        return {r["name"] for r in rows}

    def validate_schema(self, expected: dict[str, list[str]]) -> SchemaValidationResult:
        """expected: {table: [required column, ...]} → structural diff."""
        tables = self._current_tables()
        missing_tables = [t for t in expected if t not in tables]
        missing_columns: dict[str, list[str]] = {}
        for t, cols in expected.items():
            if t in tables:
                have = self._table_columns(t)
                missing = [c for c in cols if c not in have]
                if missing:
                    missing_columns[t] = missing
        return SchemaValidationResult(
            valid=not missing_tables and not missing_columns,
            missing_tables=missing_tables,
            missing_columns=missing_columns,
        )

    def get_schema_info(self) -> dict:
        return {
            "schema_name": self.schema_name,
            "version": self.get_current_schema_version(),
            "tables": sorted(self._current_tables()),
            "history_len": len(self.history()),
        }

    def create_backup_script(self) -> str:
        """DDL dump of every table (reference: schema_manager.py:400-462)."""
        rows = self.store.query(
            "SELECT sql FROM sqlite_master "
            "WHERE type = 'table' AND sql IS NOT NULL ORDER BY name"
        )
        return ";\n\n".join(r["sql"] for r in rows) + ";\n"
