"""REST API over the engine (Flask).

Parity target: src/api/rest_api.py:538-673 — /health, /pipelines full
CRUD (create/list/show/update/soft-delete), /executions
create/list/get/status/cancel, /metrics. The reference ships both Flask
and FastAPI duals; so does this repo — the FastAPI twin is
``api/fastapi_app.py::create_fastapi_app`` (identical routes and status
codes, pydantic-validated bodies, import-gated because FastAPI is
optional). This Flask app is the always-available arm.
"""

from __future__ import annotations

import json
from typing import Any

from metadata_etl_framework_spark.catalog.store import ConfigLoader, MetadataStore


def create_app(store: MetadataStore, orchestrator=None):
    from flask import Flask, jsonify, request

    app = Flask("metadata-etl-spark")

    @app.get("/health")
    def health():
        n = store.query("SELECT COUNT(*) AS n FROM PIPELINES")[0]["n"]
        return jsonify({"status": "ok", "pipelines": n})

    @app.get("/pipelines")
    def list_pipelines():
        return jsonify(store.query("SELECT * FROM PIPELINES"))

    @app.post("/pipelines")
    def create_pipeline():
        body: dict[str, Any] = request.get_json(force=True)
        pid = store.register_pipeline(
            body["pipeline_name"], body.get("description", ""), body.get("schedule")
        )
        return jsonify({"pipeline_id": pid}), 201

    @app.get("/pipelines/<int:pipeline_id>")
    def show_pipeline(pipeline_id: int):
        try:
            config = ConfigLoader(store).load_pipeline_metadata(pipeline_id)
        except KeyError:
            return jsonify({"error": "not found"}), 404
        return app.response_class(
            json.dumps(config, default=str), mimetype="application/json"
        )

    @app.put("/pipelines/<int:pipeline_id>")
    def update_pipeline(pipeline_id: int):
        body: dict[str, Any] = request.get_json(force=True)
        rows = store.query(
            "SELECT * FROM PIPELINES WHERE pipeline_id = ?", (pipeline_id,)
        )
        if not rows:
            return jsonify({"error": "not found"}), 404
        allowed = {"pipeline_name", "description", "schedule", "is_active"}
        updates = {k: v for k, v in body.items() if k in allowed}
        if updates:
            sets = ", ".join(f"{k} = ?" for k in updates)
            store.execute(
                f"UPDATE PIPELINES SET {sets} WHERE pipeline_id = ?",
                (*updates.values(), pipeline_id),
            )
        return jsonify({"pipeline_id": pipeline_id, "updated": sorted(updates)})

    @app.delete("/pipelines/<int:pipeline_id>")
    def delete_pipeline(pipeline_id: int):
        rows = store.query(
            "SELECT * FROM PIPELINES WHERE pipeline_id = ?", (pipeline_id,)
        )
        if not rows:
            return jsonify({"error": "not found"}), 404
        # soft delete (reference semantics: deactivate, keep run history)
        store.execute(
            "UPDATE PIPELINES SET is_active = 0 WHERE pipeline_id = ?",
            (pipeline_id,),
        )
        return jsonify({"pipeline_id": pipeline_id, "deleted": True})

    @app.get("/executions/<int:run_id>/status")
    def execution_status(run_id: int):
        rows = store.query(
            "SELECT run_id, pipeline_id, status, started_at, finished_at, "
            "duration_sec FROM PIPELINE_RUNS WHERE run_id = ?",
            (run_id,),
        )
        if not rows:
            return jsonify({"error": "not found"}), 404
        return jsonify(rows[0])

    @app.post("/executions/<int:run_id>/cancel")
    def cancel_execution(run_id: int):
        rows = store.query(
            "SELECT status FROM PIPELINE_RUNS WHERE run_id = ?", (run_id,)
        )
        if not rows:
            return jsonify({"error": "not found"}), 404
        if rows[0]["status"] not in ("RUNNING", "PENDING"):
            return jsonify({"error": f"not cancellable: {rows[0]['status']}"}), 409
        store.execute(
            "UPDATE PIPELINE_RUNS SET status = 'CANCELLED' WHERE run_id = ?",
            (run_id,),
        )
        return jsonify({"run_id": run_id, "status": "CANCELLED"})

    @app.post("/executions")
    def create_execution():
        body = request.get_json(force=True)
        if orchestrator is None:
            return jsonify({"error": "no orchestrator attached"}), 503
        result = orchestrator.execute_pipeline(
            int(body["pipeline_id"]), trigger_type="api", triggered_by="rest"
        )
        return jsonify(json.loads(json.dumps(result, default=str))), 201

    @app.post("/pipelines/<int:pipeline_id>/backfill")
    def backfill_pipeline(pipeline_id: int):
        body = request.get_json(force=True)
        if orchestrator is None:
            return jsonify({"error": "no orchestrator attached"}), 503
        parts = body.get("partitions") or []
        if not parts:
            return jsonify({"error": "partitions list required"}), 400
        result = orchestrator.backfill(
            pipeline_id,
            parts,
            param_name=body.get("param_name", "partition"),
            resume=bool(body.get("resume", True)),
        )
        return jsonify(json.loads(json.dumps(result, default=str))), 201

    @app.get("/executions")
    def list_executions():
        return jsonify(
            store.query("SELECT * FROM PIPELINE_RUNS ORDER BY run_id DESC LIMIT 50")
        )

    @app.get("/executions/<int:run_id>")
    def get_execution(run_id: int):
        rows = store.query("SELECT * FROM PIPELINE_RUNS WHERE run_id = ?", (run_id,))
        if not rows:
            return jsonify({"error": "not found"}), 404
        return jsonify(rows[0])

    @app.get("/metrics")
    def metrics():
        runs = store.query(
            "SELECT status, COUNT(*) AS n, AVG(duration_sec) AS avg_duration "
            "FROM PIPELINE_RUNS GROUP BY status"
        )
        return jsonify({"runs": runs})

    return app
