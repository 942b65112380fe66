"""Alert manager: transport registry, rate limiting, escalation.

Parity target: src/monitoring/alert_manager.py:33-318. Default transport
is log-only (email/slack/teams/pagerduty in the reference are HTTP/SMTP
side effects — here they are pluggable callables so tests and air-gapped
runs stay hermetic).
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable

logger = logging.getLogger(__name__)


class AlertManager:
    def __init__(self, store=None, rate_limit_sec: float = 60.0):
        self.store = store
        self.rate_limit_sec = rate_limit_sec
        self.transports: dict[str, Callable[[str, str], None]] = {
            "log": lambda kind, msg: logger.warning("ALERT [%s] %s", kind, msg)
        }
        self._last_sent: dict[str, float] = {}
        self.sent: list[dict[str, Any]] = []  # in-memory audit for tests

    def register_transport(self, name: str, fn: Callable[[str, str], None]) -> None:
        self.transports[name] = fn

    def send(self, kind: str, message: str, transport: str = "log",
             escalate_after: int | None = None) -> bool:
        """Send unless rate-limited; returns whether it went out."""
        now = time.monotonic()
        last = self._last_sent.get(kind)
        if last is not None and now - last < self.rate_limit_sec:
            return False
        self._last_sent[kind] = now
        self.transports[transport](kind, message)
        record = {"kind": kind, "message": message, "transport": transport, "ts": now}
        self.sent.append(record)
        if self.store is not None:
            self.store.insert(
                "AUDIT_LOG",
                {"event_type": f"alert:{kind}", "entity": transport,
                 "details": message[:2000]},
            )
        repeats = sum(1 for s in self.sent if s["kind"] == kind)
        if escalate_after and repeats >= escalate_after:
            self.transports[transport](f"{kind}:ESCALATED",
                                       f"{repeats} occurrences: {message}")
        return True
