"""Performance monitor: per-run resource metrics, baseline compare,
bottleneck heuristics.

Parity target: src/monitoring/performance_monitor.py:99-664. The
reference samples psutil on a thread; psutil is absent here, so driver
metrics come from stdlib ``resource``/``os`` and executor-side facts
from the SparkContext status tracker — the pieces a listener would see
on a real cluster.
"""

from __future__ import annotations

import os
import resource
import time
from dataclasses import dataclass, field
from typing import Any


def _rss_mb() -> float:
    # ru_maxrss is KB on Linux
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


@dataclass
class RunMetrics:
    name: str
    started_at: float = 0.0
    duration_sec: float = 0.0
    cpu_sec: float = 0.0
    peak_rss_mb: float = 0.0
    executor_count: int = 0
    extras: dict[str, Any] = field(default_factory=dict)


class PerformanceMonitor:
    def __init__(self, spark=None, store=None):
        self.spark = spark
        self.store = store
        self.history: list[RunMetrics] = []
        self._active: dict[str, tuple[float, float]] = {}

    def start(self, name: str) -> None:
        ru = resource.getrusage(resource.RUSAGE_SELF)
        self._active[name] = (time.monotonic(), ru.ru_utime + ru.ru_stime)

    def stop(self, name: str, **extras: Any) -> RunMetrics:
        t0, cpu0 = self._active.pop(name)
        ru = resource.getrusage(resource.RUSAGE_SELF)
        m = RunMetrics(
            name=name,
            started_at=t0,
            duration_sec=time.monotonic() - t0,
            cpu_sec=(ru.ru_utime + ru.ru_stime) - cpu0,
            peak_rss_mb=_rss_mb(),
            executor_count=self._executor_count(),
            extras=extras,
        )
        self.history.append(m)
        return m

    def _executor_count(self) -> int:
        if self.spark is None:
            return 0
        try:
            return int(
                self.spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
            )
        except Exception:
            return 0

    # --------------------------------------------------- continuous sampler
    # (reference: _monitoring_worker + start/stop_monitoring,
    # performance_monitor.py:286-341 — a daemon thread samples resource
    # state on an interval while a run executes)

    def start_monitoring(self, run_id: str, interval_sec: float = 1.0) -> None:
        import threading

        samples: list[dict[str, float]] = []
        stop = threading.Event()

        def _worker() -> None:
            while not stop.is_set():
                ru = resource.getrusage(resource.RUSAGE_SELF)
                samples.append(
                    {
                        "ts": time.time(),
                        "cpu_sec": ru.ru_utime + ru.ru_stime,
                        "rss_mb": _rss_mb(),
                    }
                )
                stop.wait(interval_sec)

        t = threading.Thread(target=_worker, daemon=True)
        t.start()
        self._samplers = getattr(self, "_samplers", {})
        self._samplers[run_id] = (stop, t, samples)

    def stop_monitoring(self, run_id: str) -> dict[str, Any]:
        """Stop the sampler; returns utilization summary over the samples
        (reference: calculate_resource_utilization, :343-412)."""
        stop, t, samples = self._samplers.pop(run_id)
        stop.set()
        t.join(timeout=5)
        if not samples:
            return {"run_id": run_id, "samples": 0}
        cpu_delta = samples[-1]["cpu_sec"] - samples[0]["cpu_sec"]
        wall = max(samples[-1]["ts"] - samples[0]["ts"], 1e-9)
        return {
            "run_id": run_id,
            "samples": len(samples),
            "wall_sec": wall,
            "avg_cpu_util": cpu_delta / wall,
            "peak_rss_mb": max(s["rss_mb"] for s in samples),
        }

    # ------------------------------------------------------------- analysis

    def baseline_compare(self, name: str, window: int = 5) -> dict[str, Any] | None:
        """Latest run vs the mean of the preceding ``window`` runs of the
        same name (reference: baseline compare + regression flag)."""
        runs = [m for m in self.history if m.name == name]
        if len(runs) < 2:
            return None
        cur, prior = runs[-1], runs[-1 - window : -1]
        base = sum(m.duration_sec for m in prior) / len(prior)
        return {
            "name": name,
            "current_sec": cur.duration_sec,
            "baseline_sec": base,
            "regression": cur.duration_sec > 1.5 * base,
        }

    def bottleneck_hints(self, m: RunMetrics) -> list[str]:
        """Reference-style heuristics (performance_monitor.py:343-412)."""
        hints = []
        if m.duration_sec > 0 and m.cpu_sec / m.duration_sec < 0.3:
            hints.append("low CPU utilization — likely I/O or shuffle bound")
        cpus = os.cpu_count() or 1
        if m.duration_sec > 0 and m.cpu_sec / m.duration_sec > 0.9 * cpus:
            hints.append("CPU saturated — consider more executors/partitions")
        if m.peak_rss_mb > 0.8 * _total_memory_mb():
            hints.append("driver memory pressure — avoid collect(), raise driver memory")
        return hints


def _total_memory_mb() -> float:
    try:
        pages = os.sysconf("SC_PHYS_PAGES")
        return pages * os.sysconf("SC_PAGE_SIZE") / (1024 * 1024)
    except (ValueError, OSError):  # pragma: no cover
        return float("inf")
