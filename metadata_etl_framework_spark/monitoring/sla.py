"""SLA monitoring: per-run checks + compliance rate.

Parity target: src/monitoring/sla_monitor.py:21-298 — sla types
execution_time (seconds ceiling), quality_score (floor), row_count
(floor), data_freshness (hours ceiling, vs a supplied timestamp);
beyond parity: drift_psi / drift_ks (ceilings on the batch's PSI /
binned-KS statistic vs a persisted baseline) and score_auc (floor) /
score_ece (ceiling) on the batch's classifier-quality readout — fed
from ops/evaluation.py so a curation run gates on model quality the
way it gates on drift — and forecast_smape (ceiling on the
seasonal-naive backtest, functions/aggregations.py::
forecast_baseline_eval) so a metrics pipeline gates on its own
predictability.
Deviation = (actual - threshold) / threshold, signed so callers can rank
violations.
"""

from __future__ import annotations

import time
from typing import Any, Sequence


class SLAMonitor:
    def __init__(self, store):
        self.store = store

    def record_run(
        self,
        run_id: int,
        pipeline_id: int,
        slas: Sequence[dict[str, Any]],
        duration_sec: float | None = None,
        quality_score: float | None = None,
        row_count: int | None = None,
        freshness_ts: float | None = None,
        drift_psi: float | None = None,
        drift_ks: float | None = None,
        score_auc: float | None = None,
        score_ece: float | None = None,
        forecast_smape: float | None = None,
    ) -> list[dict[str, Any]]:
        results = []
        for sla in slas:
            stype, threshold = sla["sla_type"], float(sla["threshold"])
            actual: float | None
            if stype == "execution_time":
                actual, met = duration_sec, (duration_sec or 0) <= threshold
            elif stype == "quality_score":
                actual = quality_score
                met = quality_score is None or quality_score >= threshold
            elif stype == "row_count":
                actual = float(row_count) if row_count is not None else None
                met = row_count is None or row_count >= threshold
            elif stype == "data_freshness":
                age_h = (time.time() - freshness_ts) / 3600 if freshness_ts else None
                actual, met = age_h, age_h is None or age_h <= threshold
            elif stype == "drift_psi":
                # ceiling on the batch's PSI vs baseline (industry rule
                # of thumb: <0.1 stable, 0.1–0.25 watch, >0.25 shifted);
                # feed from quality/drift.py::psi_vs_baseline
                actual = drift_psi
                met = drift_psi is None or drift_psi <= threshold
            elif stype == "drift_ks":
                # ceiling on the batch's (binned) KS statistic vs
                # baseline; feed from quality/drift.py::ks_vs_baseline
                actual = drift_ks
                met = drift_ks is None or drift_ks <= threshold
            elif stype == "score_auc":
                # FLOOR on the run's classifier AUC — feed from
                # ops/evaluation.py::binary_auc / score_eval_suite;
                # None (no labels this run, or single-class) never
                # violates, matching the drift None semantics
                actual = score_auc
                met = score_auc is None or score_auc >= threshold
            elif stype == "score_ece":
                # ceiling on expected calibration error — feed from
                # ops/evaluation.py::expected_calibration_error
                actual = score_ece
                met = score_ece is None or score_ece <= threshold
            elif stype == "forecast_smape":
                # ceiling on the run's seasonal-naive backtest sMAPE —
                # feed from functions/aggregations.py::
                # forecast_baseline_eval; None (series shorter than the
                # season) never violates, the drift None semantics
                actual = forecast_smape
                met = forecast_smape is None or forecast_smape <= threshold
            else:
                raise ValueError(f"unknown sla type {stype!r}")
            deviation = (
                (actual - threshold) / threshold if actual is not None and threshold else None
            )
            self.store.insert(
                "SLA_RESULTS",
                {
                    "run_id": run_id,
                    "sla_type": stype,
                    "threshold": threshold,
                    "actual": actual,
                    "met": int(bool(met)),
                },
            )
            results.append(
                {
                    "sla_type": stype,
                    "threshold": threshold,
                    "actual": actual,
                    "met": bool(met),
                    "deviation": deviation,
                }
            )
        return results

    def compliance_rate(self, pipeline_id: int | None = None) -> float:
        """Fraction of SLA checks met across recorded runs (×100)."""
        rows = self.store.query(
            "SELECT r.met FROM SLA_RESULTS r JOIN PIPELINE_RUNS p "
            "ON p.run_id = r.run_id"
            + (" WHERE p.pipeline_id = ?" if pipeline_id else ""),
            (pipeline_id,) if pipeline_id else (),
        )
        if not rows:
            return 100.0
        return 100.0 * sum(r["met"] for r in rows) / len(rows)
