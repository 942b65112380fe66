"""Watermark state store for batch-incremental loads.

Parity target: ``IncrementalLoadManager`` watermark handling (reference:
src/utils/incremental_load_manager.py:103-165,548-650; DDL
database/incremental_schema.sql:5-18). The reference upserts into a
WATERMARKS table; here the store is a small JSON-lines state directory
(swap for a JDBC/Delta table in production — interface is identical).
History rows are retained for gap detection.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Watermark:
    pipeline_id: str
    source_id: str
    column: str
    value: Any
    updated_at: float = 0.0


class WatermarkStore:
    """Tiny driver-side state store; data-plane filtering stays in Spark."""

    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _path(self, pipeline_id: str, source_id: str) -> str:
        return os.path.join(self.state_dir, f"{pipeline_id}__{source_id}.jsonl")

    def get(self, pipeline_id: str, source_id: str) -> Watermark | None:
        path = self._path(pipeline_id, source_id)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            lines = f.read().strip().splitlines()
        return Watermark(**json.loads(lines[-1])) if lines else None

    def update(self, wm: Watermark) -> None:
        wm.updated_at = time.time()
        with open(self._path(wm.pipeline_id, wm.source_id), "a") as f:
            f.write(json.dumps(asdict(wm)) + "\n")

    def history(self, pipeline_id: str, source_id: str) -> list[Watermark]:
        path = self._path(pipeline_id, source_id)
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [Watermark(**json.loads(l)) for l in f.read().strip().splitlines()]

    def reset(self, pipeline_id: str, source_id: str) -> None:
        path = self._path(pipeline_id, source_id)
        if os.path.exists(path):
            os.remove(path)

    # ------------------------------------------------------------ data plane

    def incremental_filter(
        self, df: DataFrame, pipeline_id: str, source_id: str, column: str
    ) -> DataFrame:
        """Rows past the stored watermark — the predicate is a plain Column
        comparison, so it prunes partitions / pushes into the scan."""
        wm = self.get(pipeline_id, source_id)
        return df if wm is None else df.filter(F.col(column) > F.lit(wm.value))

    def detect_gaps(
        self, pipeline_id: str, source_id: str, expected_interval_sec: float,
        tolerance: float = 0.5,
    ) -> list[dict]:
        """Watermark-history deltas outside expected ± tolerance (reference:
        incremental_load_manager.py:480-519)."""
        hist = self.history(pipeline_id, source_id)
        gaps = []
        for prev, cur in zip(hist, hist[1:]):
            delta = cur.updated_at - prev.updated_at
            if abs(delta - expected_interval_sec) > tolerance * expected_interval_sec:
                gaps.append({"from": prev.value, "to": cur.value, "delta_sec": delta})
        return gaps
