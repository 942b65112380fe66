"""Pipeline scheduler: cron matching, concurrency policies, retry queue,
execution windows, event/dependency triggers.

Parity target: src/orchestrator/pipeline_scheduler.py:92-657 (loop
:485-532, policy :293-312, windows :599-626, retry :559-579, triggers
:203-264). The reference polls every 30s on a daemon thread; here the
core is a testable ``tick(now)`` — callers (CLI daemon, Airflow, cron)
own the clock. A standard 5-field cron matcher is implemented inline
(croniter isn't a dependency).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Any, Callable


def _match_field(spec: str, value: int) -> bool:
    for part in spec.split(","):
        if part == "*":
            return True
        if part.startswith("*/"):
            if value % int(part[2:]) == 0:
                return True
        elif "-" in part:
            lo, hi = part.split("-")
            if int(lo) <= value <= int(hi):
                return True
        elif part.isdigit() and int(part) == value:
            return True
    return False


def cron_matches(expr: str, dt: datetime) -> bool:
    """5-field cron (min hour dom month dow); dow 0=Sunday as in cron.

    Standard (Vixie) cron day semantics: when BOTH day-of-month and
    day-of-week are restricted (neither is ``*``), the entry fires when
    EITHER matches; otherwise the restricted one must match."""
    minute, hour, dom, month, dow = expr.split()
    dom_ok = _match_field(dom, dt.day)
    dow_ok = _match_field(dow, (dt.weekday() + 1) % 7)
    # Vixie treats any field STARTING with '*' (e.g. '*/2') as unrestricted
    # for the dom/dow OR rule, not just the bare '*'
    dom_restricted = not dom.startswith("*")
    dow_restricted = not dow.startswith("*")
    day_ok = (
        (dom_ok or dow_ok) if (dom_restricted and dow_restricted)
        else (dom_ok and dow_ok)
    )
    return (
        _match_field(minute, dt.minute)
        and _match_field(hour, dt.hour)
        and _match_field(month, dt.month)
        and day_ok
    )


def next_run_time(expr: str, after: datetime, horizon_days: int = 366) -> datetime | None:
    """Next matching minute strictly after ``after`` (croniter.get_next parity)."""
    t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
    end = after + timedelta(days=horizon_days)
    while t <= end:
        if cron_matches(expr, t):
            return t
        t += timedelta(minutes=1)
    return None


@dataclass
class Schedule:
    pipeline_id: int
    cron: str
    concurrency_policy: str = "allow"  # allow | skip | queue | fail
    window_start: str | None = None   # "HH:MM"
    window_end: str | None = None
    depends_on: list[int] = field(default_factory=list)
    max_retries: int = 0
    retry_delay_sec: float = 60.0


class PipelineScheduler:
    def __init__(
        self,
        executor: Callable[[int, str], Any],
        store=None,
        async_executor: bool = False,
    ):
        """``executor(pipeline_id, trigger_type)`` runs a pipeline (the
        orchestrator's execute_pipeline).

        ``async_executor=True`` runs each fire on a worker thread, so a
        pipeline stays in ``self.running`` across ticks and the
        skip/queue/fail concurrency policies can actually engage. The
        synchronous default (deterministic, test-friendly) never overlaps
        runs, so those policies are vacuous there by construction."""
        self.executor = executor
        self.store = store
        self.async_executor = async_executor
        self.schedules: dict[int, Schedule] = {}
        self.running: set[int] = set()
        self.queue: list[int] = []
        self.retry_queue: list[tuple[float, int, int]] = []  # (due, pid, attempt)
        self.history: list[dict[str, Any]] = []
        self._last_success: dict[int, float] = {}
        self._last_fired_minute: dict[int, datetime] = {}
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._workers: list[threading.Thread] = []

    def add_schedule(self, schedule: Schedule) -> None:
        self.schedules[schedule.pipeline_id] = schedule

    # ------------------------------------------------------------------ core

    def _in_window(self, s: Schedule, dt: datetime) -> bool:
        if not s.window_start or not s.window_end:
            return True
        hm = dt.strftime("%H:%M")
        return s.window_start <= hm <= s.window_end

    def _deps_met(self, s: Schedule) -> bool:
        return all(pid in self._last_success for pid in s.depends_on)

    def tick(self, now: datetime | None = None) -> list[dict[str, Any]]:
        """One scheduler step: fire due schedules + drain retry/concurrency
        queues. Returns the actions taken (testable, clock-injectable)."""
        now = now or datetime.now()
        actions = []
        # retry queue first
        due = [r for r in self.retry_queue if r[0] <= now.timestamp()]
        self.retry_queue = [r for r in self.retry_queue if r[0] > now.timestamp()]
        for _, pid, attempt in due:
            actions.append(self._fire(pid, "retry", attempt))
        # cron-due schedules; a schedule fires at most once per matched
        # minute — without this, any poll interval < 60s double-fires
        minute = now.replace(second=0, microsecond=0)
        for pid, s in self.schedules.items():
            if not cron_matches(s.cron, now):
                continue
            if self._last_fired_minute.get(pid) == minute:
                continue
            self._last_fired_minute[pid] = minute
            if not self._in_window(s, now) or not self._deps_met(s):
                actions.append({"pipeline_id": pid, "action": "skipped_window_or_deps"})
                continue
            if pid in self.running:
                if s.concurrency_policy == "skip":
                    actions.append({"pipeline_id": pid, "action": "skipped_concurrent"})
                    continue
                if s.concurrency_policy == "queue":
                    self.queue.append(pid)
                    actions.append({"pipeline_id": pid, "action": "queued"})
                    continue
                if s.concurrency_policy == "fail":
                    actions.append({"pipeline_id": pid, "action": "failed_concurrent"})
                    continue
            actions.append(self._fire(pid, "scheduled", 0))
        # drain queue for finished pipelines
        still_queued = []
        for pid in self.queue:
            if pid not in self.running:
                actions.append(self._fire(pid, "queued", 0))
            else:
                still_queued.append(pid)
        self.queue = still_queued
        return actions

    def trigger(self, pipeline_id: int, trigger_type: str = "manual") -> dict[str, Any]:
        return self._fire(pipeline_id, trigger_type, 0)

    def trigger_event(self, event_name: str, pipeline_id: int) -> dict[str, Any]:
        return self._fire(pipeline_id, f"event:{event_name}", 0)

    def _fire(self, pid: int, trigger_type: str, attempt: int) -> dict[str, Any]:
        if self.async_executor:
            self.running.add(pid)
            record = {"pipeline_id": pid, "action": "started",
                      "trigger": trigger_type}
            worker = threading.Thread(
                target=self._run_sync, args=(pid, trigger_type, attempt),
                daemon=True,
            )
            self._workers.append(worker)
            worker.start()
            self.history.append(record)
            return record
        self.running.add(pid)
        try:
            return self._run_sync(pid, trigger_type, attempt)
        finally:
            self.running.discard(pid)

    def _run_sync(self, pid: int, trigger_type: str, attempt: int) -> dict[str, Any]:
        try:
            result = self.executor(pid, trigger_type)
            self._last_success[pid] = time.time()
            record = {"pipeline_id": pid, "action": "executed",
                      "trigger": trigger_type, "result": result}
        except Exception as exc:
            s = self.schedules.get(pid)
            record = {"pipeline_id": pid, "action": "failed",
                      "trigger": trigger_type, "error": str(exc)}
            if s and attempt < s.max_retries:
                self.retry_queue.append(
                    (time.time() + s.retry_delay_sec, pid, attempt + 1)
                )
                record["action"] = "failed_will_retry"
        finally:
            if self.async_executor:
                self.running.discard(pid)
        self.history.append(record)
        return record

    def wait_idle(self, timeout: float = 30.0) -> None:
        """Join outstanding async workers (test/shutdown helper)."""
        for w in self._workers:
            w.join(timeout=timeout)
        self._workers = [w for w in self._workers if w.is_alive()]

    # ------------------------------------------------------------- daemon

    def start(self, poll_sec: float = 30.0) -> None:
        """Daemon loop (reference :111-120,485-532); tick() is the body."""
        def _loop():
            while not self._stop.is_set():
                self.tick()
                self._stop.wait(poll_sec)

        self._thread = threading.Thread(target=_loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)

    # ------------------------------------------------------------- export

    def export_adf_trigger(self, pipeline_id: int,
                           trigger_config: dict[str, Any] | None = None) -> dict[str, Any]:
        """Azure Data Factory ScheduleTrigger resource for a schedule
        (reference: pipeline_scheduler.py:450-483)."""
        if pipeline_id not in self.schedules:
            raise ValueError(f"no schedule for pipeline {pipeline_id}")
        cfg = trigger_config or {}
        return {
            "name": f"pipeline_{pipeline_id}_trigger",
            "type": "Microsoft.DataFactory/factories/triggers",
            "apiVersion": "2018-06-01",
            "properties": {
                "type": "ScheduleTrigger",
                "typeProperties": {
                    "recurrence": {
                        "frequency": cfg.get("frequency", "Day"),
                        "interval": cfg.get("interval", 1),
                        "startTime": cfg.get("start_time", "1970-01-01T00:00:00Z"),
                        "timeZone": cfg.get("timezone", "UTC"),
                    }
                },
                "pipelines": [
                    {
                        "pipelineReference": {
                            "referenceName": f"pipeline_{pipeline_id}",
                            "type": "PipelineReference",
                        }
                    }
                ],
            },
        }

    def export_airflow_dag(self, dag_id: str = "metadata_etl") -> str:
        """Textual Airflow DAG equivalent (reference exports the same)."""
        lines = [
            "from airflow import DAG",
            "from airflow.operators.python import PythonOperator",
            f"dag = DAG('{dag_id}')",
        ]
        for pid, s in self.schedules.items():
            lines.append(
                f"task_{pid} = PythonOperator(task_id='pipeline_{pid}', "
                f"python_callable=run_pipeline, op_args=[{pid}], dag=dag)  "
                f"# schedule: {s.cron}"
            )
            for dep in s.depends_on:
                lines.append(f"task_{dep} >> task_{pid}")
        return "\n".join(lines)
