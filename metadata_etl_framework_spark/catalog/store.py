"""Metadata catalog (control plane): pipelines, connections, sources,
targets, transformations, DQ profiles, SLAs, run state.

Parity targets (reference):
- schema        database/metadata_schema.sql:2-203
- ConfigLoader  src/orchestrator/config_loader.py:22-350 (load + validate
  + TTL/hash cache + JSON parameter parsing)

Backed by SQLite through stdlib ``sqlite3`` — the catalog is tiny
(hundreds of rows) and driver-side by design; the DATA plane never
touches it. On a cluster the same schema lives in any JDBC-reachable
database; nothing below assumes SQLite beyond DDL dialect.
"""

from __future__ import annotations

import hashlib
import json
import sqlite3
import time
from typing import Any

_DDL = """
CREATE TABLE IF NOT EXISTS PIPELINES (
    pipeline_id INTEGER PRIMARY KEY AUTOINCREMENT,
    pipeline_name TEXT NOT NULL UNIQUE,
    description TEXT,
    is_active INTEGER DEFAULT 1,
    schedule TEXT,
    created_at TEXT DEFAULT CURRENT_TIMESTAMP
);
CREATE TABLE IF NOT EXISTS CONNECTIONS (
    connection_id INTEGER PRIMARY KEY AUTOINCREMENT,
    connection_name TEXT NOT NULL UNIQUE,
    connection_type TEXT NOT NULL,
    parameters TEXT
);
CREATE TABLE IF NOT EXISTS SOURCE_CONFIG (
    source_id INTEGER PRIMARY KEY AUTOINCREMENT,
    pipeline_id INTEGER NOT NULL,
    source_name TEXT NOT NULL,
    connection_id INTEGER,
    source_type TEXT NOT NULL,
    parameters TEXT
);
CREATE TABLE IF NOT EXISTS TARGET_CONFIG (
    target_id INTEGER PRIMARY KEY AUTOINCREMENT,
    pipeline_id INTEGER NOT NULL,
    target_name TEXT NOT NULL,
    connection_id INTEGER,
    target_type TEXT NOT NULL,
    load_type TEXT DEFAULT 'overwrite',
    parameters TEXT
);
CREATE TABLE IF NOT EXISTS TRANSFORMATIONS (
    transformation_id INTEGER PRIMARY KEY AUTOINCREMENT,
    pipeline_id INTEGER NOT NULL,
    name TEXT,
    primary_source TEXT
);
CREATE TABLE IF NOT EXISTS TRANSFORM_STEPS (
    step_id INTEGER PRIMARY KEY AUTOINCREMENT,
    transformation_id INTEGER NOT NULL,
    step_order INTEGER NOT NULL,
    step_type TEXT NOT NULL,
    config TEXT
);
CREATE TABLE IF NOT EXISTS DQ_RULES (
    rule_id INTEGER PRIMARY KEY AUTOINCREMENT,
    pipeline_id INTEGER NOT NULL,
    rule TEXT NOT NULL
);
CREATE TABLE IF NOT EXISTS SLA_DEFINITIONS (
    sla_id INTEGER PRIMARY KEY AUTOINCREMENT,
    pipeline_id INTEGER NOT NULL,
    sla_type TEXT NOT NULL,
    threshold REAL NOT NULL,
    parameters TEXT
);
CREATE TABLE IF NOT EXISTS PIPELINE_RUNS (
    run_id INTEGER PRIMARY KEY AUTOINCREMENT,
    pipeline_id INTEGER NOT NULL,
    status TEXT NOT NULL,
    trigger_type TEXT,
    triggered_by TEXT,
    started_at REAL,
    finished_at REAL,
    duration_sec REAL,
    error TEXT
);
CREATE TABLE IF NOT EXISTS TRANSFORM_LOG (
    log_id INTEGER PRIMARY KEY AUTOINCREMENT,
    run_id INTEGER NOT NULL,
    step_name TEXT,
    step_type TEXT,
    rows_out INTEGER,
    duration_sec REAL
);
CREATE TABLE IF NOT EXISTS EXTRACTION_LOG (
    log_id INTEGER PRIMARY KEY AUTOINCREMENT,
    run_id INTEGER NOT NULL,
    source_name TEXT,
    status TEXT,
    duration_sec REAL
);
CREATE TABLE IF NOT EXISTS LOAD_LOG (
    log_id INTEGER PRIMARY KEY AUTOINCREMENT,
    run_id INTEGER NOT NULL,
    target_name TEXT,
    status TEXT,
    rows_written INTEGER,
    duration_sec REAL
);
CREATE TABLE IF NOT EXISTS ERROR_LOG (
    error_id INTEGER PRIMARY KEY AUTOINCREMENT,
    run_id INTEGER,
    stage TEXT,
    category TEXT,
    message TEXT,
    created_at TEXT DEFAULT CURRENT_TIMESTAMP
);
CREATE TABLE IF NOT EXISTS AUDIT_LOG (
    audit_id INTEGER PRIMARY KEY AUTOINCREMENT,
    event_type TEXT NOT NULL,
    entity TEXT,
    actor TEXT,
    details TEXT,
    created_at TEXT DEFAULT CURRENT_TIMESTAMP
);
CREATE TABLE IF NOT EXISTS SLA_RESULTS (
    result_id INTEGER PRIMARY KEY AUTOINCREMENT,
    run_id INTEGER NOT NULL,
    sla_type TEXT,
    threshold REAL,
    actual REAL,
    met INTEGER
);
CREATE TABLE IF NOT EXISTS WATERMARKS (
    pipeline_id INTEGER NOT NULL,
    source_name TEXT NOT NULL,
    column_name TEXT NOT NULL,
    watermark_value TEXT,
    updated_at TEXT DEFAULT CURRENT_TIMESTAMP,
    PRIMARY KEY (pipeline_id, source_name, column_name)
);
CREATE TABLE IF NOT EXISTS WATERMARK_HISTORY (
    history_id INTEGER PRIMARY KEY AUTOINCREMENT,
    pipeline_id INTEGER NOT NULL,
    source_name TEXT NOT NULL,
    column_name TEXT NOT NULL,
    watermark_value TEXT,
    recorded_at REAL
);
CREATE TABLE IF NOT EXISTS LINEAGE_EDGES (
    edge_id INTEGER PRIMARY KEY AUTOINCREMENT,
    run_id INTEGER,
    src TEXT NOT NULL,
    dst TEXT NOT NULL,
    transform TEXT
);
"""


class MetadataStore:
    """Thin catalog wrapper. One connection, autocommit, row dicts out."""

    def __init__(self, path: str = ":memory:"):
        self.path = path
        self.conn = sqlite3.connect(path, check_same_thread=False)
        self.conn.row_factory = sqlite3.Row
        self.conn.executescript(_DDL)

    def execute(self, sql: str, params: tuple = ()) -> sqlite3.Cursor:
        cur = self.conn.execute(sql, params)
        self.conn.commit()
        return cur

    def query(self, sql: str, params: tuple = ()) -> list[dict[str, Any]]:
        return [dict(r) for r in self.conn.execute(sql, params).fetchall()]

    def insert(self, table: str, row: dict[str, Any]) -> int:
        cols = ", ".join(row)
        qs = ", ".join("?" for _ in row)
        cur = self.execute(
            f"INSERT INTO {table} ({cols}) VALUES ({qs})", tuple(row.values())
        )
        return int(cur.lastrowid)

    # -------- convenience registrations (mirror the reference's setup API)

    def register_pipeline(self, name: str, description: str = "",
                          schedule: str | None = None) -> int:
        return self.insert(
            "PIPELINES",
            {"pipeline_name": name, "description": description, "schedule": schedule},
        )

    def register_connection(self, name: str, ctype: str, parameters: dict) -> int:
        return self.insert(
            "CONNECTIONS",
            {
                "connection_name": name,
                "connection_type": ctype,
                "parameters": json.dumps(parameters),
            },
        )

    def register_source(self, pipeline_id: int, name: str, source_type: str,
                        parameters: dict, connection_id: int | None = None) -> int:
        return self.insert(
            "SOURCE_CONFIG",
            {
                "pipeline_id": pipeline_id,
                "source_name": name,
                "source_type": source_type,
                "connection_id": connection_id,
                "parameters": json.dumps(parameters),
            },
        )

    def register_target(self, pipeline_id: int, name: str, target_type: str,
                        parameters: dict, load_type: str = "overwrite",
                        connection_id: int | None = None) -> int:
        return self.insert(
            "TARGET_CONFIG",
            {
                "pipeline_id": pipeline_id,
                "target_name": name,
                "target_type": target_type,
                "load_type": load_type,
                "connection_id": connection_id,
                "parameters": json.dumps(parameters),
            },
        )

    def register_transformation(self, pipeline_id: int,
                                steps: list[dict[str, Any]],
                                primary_source: str | None = None,
                                name: str = "main") -> int:
        tid = self.insert(
            "TRANSFORMATIONS",
            {"pipeline_id": pipeline_id, "name": name, "primary_source": primary_source},
        )
        for i, step in enumerate(steps):
            self.insert(
                "TRANSFORM_STEPS",
                {
                    "transformation_id": tid,
                    "step_order": i,
                    "step_type": step["type"],
                    "config": json.dumps(step.get("config", {})),
                },
            )
        return tid

    def register_dq_rule(self, pipeline_id: int, rule: dict[str, Any]) -> int:
        return self.insert(
            "DQ_RULES", {"pipeline_id": pipeline_id, "rule": json.dumps(rule)}
        )

    def register_sla(self, pipeline_id: int, sla_type: str, threshold: float,
                     parameters: dict | None = None) -> int:
        return self.insert(
            "SLA_DEFINITIONS",
            {
                "pipeline_id": pipeline_id,
                "sla_type": sla_type,
                "threshold": threshold,
                "parameters": json.dumps(parameters or {}),
            },
        )


class ConfigLoader:
    """PIPELINES ⋈ SOURCE_CONFIG ⋈ TARGET_CONFIG ⋈ TRANSFORMATIONS⋈STEPS
    → one config dict (the reference's IR #1, config_loader.py:22-275),
    with the same TTL + content-hash cache (config_loader.py:315-350)."""

    def __init__(self, store: MetadataStore, cache_ttl_sec: float = 300.0):
        self.store = store
        self.cache_ttl = cache_ttl_sec
        self._cache: dict[int, tuple[float, str, dict]] = {}

    def load_pipeline_metadata(self, pipeline_id: int) -> dict[str, Any]:
        cached = self._cache.get(pipeline_id)
        if cached and time.monotonic() - cached[0] < self.cache_ttl:
            return cached[2]
        config = self._load(pipeline_id)
        digest = hashlib.md5(
            json.dumps(config, sort_keys=True, default=str).encode()
        ).hexdigest()
        if cached and cached[1] == digest:
            self._cache[pipeline_id] = (time.monotonic(), digest, cached[2])
            return cached[2]
        self._cache[pipeline_id] = (time.monotonic(), digest, config)
        return config

    def _load(self, pipeline_id: int) -> dict[str, Any]:
        rows = self.store.query(
            "SELECT * FROM PIPELINES WHERE pipeline_id = ?", (pipeline_id,)
        )
        if not rows:
            raise KeyError(f"pipeline {pipeline_id} not found")
        pipeline = rows[0]

        def _params(raw: str | None) -> dict:
            return json.loads(raw) if raw else {}

        sources = [
            {**s, "parameters": _params(s["parameters"])}
            for s in self.store.query(
                "SELECT * FROM SOURCE_CONFIG WHERE pipeline_id = ?", (pipeline_id,)
            )
        ]
        targets = [
            {**t, "parameters": _params(t["parameters"])}
            for t in self.store.query(
                "SELECT * FROM TARGET_CONFIG WHERE pipeline_id = ?", (pipeline_id,)
            )
        ]
        transformations = []
        for t in self.store.query(
            "SELECT * FROM TRANSFORMATIONS WHERE pipeline_id = ?", (pipeline_id,)
        ):
            steps = [
                {"type": s["step_type"], "config": _params(s["config"])}
                for s in self.store.query(
                    "SELECT * FROM TRANSFORM_STEPS WHERE transformation_id = ? "
                    "ORDER BY step_order",
                    (t["transformation_id"],),
                )
            ]
            transformations.append(
                {"name": t["name"], "primary_source": t["primary_source"], "steps": steps}
            )
        dq_rules = [
            json.loads(r["rule"])
            for r in self.store.query(
                "SELECT * FROM DQ_RULES WHERE pipeline_id = ?", (pipeline_id,)
            )
        ]
        slas = self.store.query(
            "SELECT * FROM SLA_DEFINITIONS WHERE pipeline_id = ?", (pipeline_id,)
        )
        return {
            "pipeline": dict(pipeline),
            "sources": sources,
            "targets": targets,
            "transformations": transformations,
            "dq_rules": dq_rules,
            "slas": [dict(s) for s in slas],
        }

    def validate_metadata(self, config: dict[str, Any]) -> list[str]:
        """Required-section validation (orchestrator_manager.py:106-127).
        Returns a list of problems (empty = valid)."""
        problems = []
        if not config.get("sources"):
            problems.append("no sources configured")
        if not config.get("targets"):
            problems.append("no targets configured")
        known = {s["source_name"] for s in config.get("sources", [])}
        for t in config.get("transformations", []):
            ps = t.get("primary_source")
            if ps and ps not in known:
                problems.append(f"primary_source {ps!r} is not a configured source")
            for step in t.get("steps", []):
                if step["type"] == "join":
                    right = step.get("config", {}).get("right_source")
                    if right and right not in known:
                        problems.append(f"join right_source {right!r} unknown")
        return problems
