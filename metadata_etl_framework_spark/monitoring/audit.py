"""Audit logger → AUDIT_LOG table.

Parity target: src/monitoring/audit_logger.py:20-322 (pipeline / user /
system / data-access / security events; report query; archival).
"""

from __future__ import annotations

from typing import Any


class AuditLogger:
    def __init__(self, store):
        self.store = store

    def log(self, event_type: str, entity: str | None = None,
            actor: str | None = None, details: str | None = None) -> int:
        return self.store.insert(
            "AUDIT_LOG",
            {"event_type": event_type, "entity": entity, "actor": actor,
             "details": details},
        )

    def report(self, event_type: str | None = None, limit: int = 100) -> list[dict[str, Any]]:
        if event_type:
            return self.store.query(
                "SELECT * FROM AUDIT_LOG WHERE event_type = ? "
                "ORDER BY audit_id DESC LIMIT ?",
                (event_type, limit),
            )
        return self.store.query(
            "SELECT * FROM AUDIT_LOG ORDER BY audit_id DESC LIMIT ?", (limit,)
        )

    def summary_report(self) -> dict[str, Any]:
        """Aggregated audit report: event counts by type + top actors
        (reference: generate_audit_report, audit_logger.py:230-254)."""
        by_type = self.store.query(
            "SELECT event_type, COUNT(*) AS n FROM AUDIT_LOG "
            "GROUP BY event_type ORDER BY n DESC"
        )
        by_actor = self.store.query(
            "SELECT actor, COUNT(*) AS n FROM AUDIT_LOG "
            "WHERE actor IS NOT NULL GROUP BY actor ORDER BY n DESC LIMIT 10"
        )
        total = self.store.query("SELECT COUNT(*) AS n FROM AUDIT_LOG")[0]["n"]
        return {"total_events": total, "by_type": by_type, "top_actors": by_actor}

    def user_activity(self, actor: str, limit: int = 100) -> list[dict[str, Any]]:
        """Per-user trail (reference: get_user_activity, :271-284)."""
        return self.store.query(
            "SELECT * FROM AUDIT_LOG WHERE actor = ? "
            "ORDER BY audit_id DESC LIMIT ?",
            (actor, limit),
        )

    def archive_before(self, audit_id: int) -> int:
        """Delete (archive) entries older than the given id; returns count."""
        n = self.store.query(
            "SELECT COUNT(*) AS n FROM AUDIT_LOG WHERE audit_id < ?", (audit_id,)
        )[0]["n"]
        self.store.execute("DELETE FROM AUDIT_LOG WHERE audit_id < ?", (audit_id,))
        return n
