"""Alert manager: transport registry, rate limiting, escalation, and the
concrete slack/teams/pagerduty/email transport payloads.

Parity target: src/monitoring/alert_manager.py:33-318. The default
transport is log-only; the network transports build the reference's
exact payload shapes (slack :148-162, teams :164-180, pagerduty
:182-207, email :124-146) with the HTTP/SMTP side effect INJECTED
(``http_post`` / ``smtp_send``), defaulting to import-gated
requests/smtplib — tests and air-gapped runs stay hermetic.
"""

from __future__ import annotations

import json
import logging
import time
from typing import Any, Callable

logger = logging.getLogger(__name__)


def _default_http_post(url: str, payload: dict) -> Any:
    try:
        import requests  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("requests not installed; inject http_post") from e
    resp = requests.post(url, json=payload, timeout=10)
    resp.raise_for_status()
    return resp


def slack_transport(webhook_url: str, channel: str | None = None,
                    http_post: Callable | None = None) -> Callable[[str, str], None]:
    """Slack incoming-webhook transport (alert_manager.py:148-162)."""
    post = http_post or _default_http_post

    def send(kind: str, message: str) -> None:
        payload: dict[str, Any] = {"text": f"[{kind}] {message}"}
        if channel:
            payload["channel"] = channel
        post(webhook_url, payload)

    return send


def teams_transport(webhook_url: str,
                    http_post: Callable | None = None) -> Callable[[str, str], None]:
    """Teams MessageCard transport (alert_manager.py:164-180)."""
    post = http_post or _default_http_post

    def send(kind: str, message: str) -> None:
        post(webhook_url, {
            "@type": "MessageCard",
            "@context": "http://schema.org/extensions",
            "summary": kind,
            "text": message,
        })

    return send


PAGERDUTY_EVENTS_URL = "https://events.pagerduty.com/v2/enqueue"


def pagerduty_transport(routing_key: str, severity: str = "error",
                        http_post: Callable | None = None) -> Callable[[str, str], None]:
    """PagerDuty Events-v2 trigger transport (alert_manager.py:182-207)."""
    post = http_post or _default_http_post

    def send(kind: str, message: str) -> None:
        post(PAGERDUTY_EVENTS_URL, {
            "routing_key": routing_key,
            "event_action": "trigger",
            "payload": {
                "summary": kind,
                "source": "metadata-etl-framework-spark",
                "severity": severity,
                "component": "pipeline",
                "details": message,
            },
        })

    return send


def email_transport(smtp_config: dict[str, Any], recipients: list[str],
                    smtp_send: Callable | None = None) -> Callable[[str, str], None]:
    """SMTP transport (alert_manager.py:124-146). ``smtp_send(config,
    from_addr, recipients, mime_string)`` is injectable; the default
    performs STARTTLS + login + sendmail via smtplib."""

    def _default_smtp_send(cfg: dict, from_addr: str, to: list[str],
                           mime_string: str) -> None:  # pragma: no cover
        import smtplib

        server = smtplib.SMTP(cfg.get("server"), cfg.get("port", 587))
        try:
            server.starttls()
            if cfg.get("username"):
                server.login(cfg["username"], cfg.get("password", ""))
            server.sendmail(from_addr, to, mime_string)
        finally:
            server.quit()

    sender = smtp_send or _default_smtp_send

    def send(kind: str, message: str) -> None:
        from email.mime.multipart import MIMEMultipart
        from email.mime.text import MIMEText

        msg = MIMEMultipart()
        msg["From"] = smtp_config.get("from_email", "etl@localhost")
        msg["To"] = ", ".join(recipients)
        msg["Subject"] = f"[ETL alert] {kind}"
        msg.attach(MIMEText(message, "html"))
        sender(smtp_config, msg["From"], recipients, msg.as_string())

    return send


# ------------------------------------------------------------- formatters
# (alert_manager.py:297-327)


def format_sla_violation_alert(sla_check: dict[str, Any]) -> str:
    return (
        "SLA Violation Alert:\n"
        f"Pipeline: {sla_check.get('pipeline_id')}\n"
        f"SLA Type: {sla_check.get('sla_type')}\n"
        f"Actual: {sla_check.get('actual')}\n"
        f"Threshold: {sla_check.get('threshold')}\n"
        f"Deviation: {sla_check.get('deviation')}%\n"
        f"Status: {sla_check.get('status')}"
    )


def format_dq_failure_alert(dq_results: dict[str, Any]) -> str:
    return (
        "Data Quality Failure Alert:\n"
        f"Run ID: {dq_results.get('dq_run_id')}\n"
        f"Quality Score: {dq_results.get('quality_score')}%\n"
        f"Issues: {json.dumps(dq_results.get('issues', {}))}"
    )


def format_pipeline_failure_alert(error_log: dict[str, Any]) -> str:
    return (
        "Pipeline Failure Alert:\n"
        f"Pipeline: {error_log.get('pipeline_id')}\n"
        f"Run ID: {error_log.get('run_id')}\n"
        f"Error: {error_log.get('error_message')}\n"
        f"Trace: {error_log.get('error_trace')}"
    )


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
