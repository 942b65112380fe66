"""REST API over the engine — FastAPI dual of ``api/rest.py``.

Parity target: src/api/rest_api.py:613-673 — the reference ships BOTH a
Flask and a FastAPI app over the same store; this module completes the
pair. Same routes, same status codes, same JSON shapes as the Flask app
(/health, /pipelines CRUD with soft delete, /executions
create/list/get/status/cancel, /metrics), with request bodies validated
by pydantic models instead of hand-read dicts.

Import-gated: FastAPI is an optional dependency. ``create_fastapi_app``
raises ImportError with an install hint where the package is absent
(this sandbox); the Flask app has no such dependency and is always
available. Route handlers are thin delegations to the same
MetadataStore/orchestrator calls the Flask app makes, so behavior
cannot drift between the duals.
"""

from __future__ import annotations

import json
from typing import Any, Optional

from metadata_etl_framework_spark.catalog.store import ConfigLoader, MetadataStore


def create_fastapi_app(store: MetadataStore, orchestrator=None):
    try:
        from fastapi import FastAPI, HTTPException, Response
        from pydantic import BaseModel
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "create_fastapi_app requires the 'fastapi' package "
            "(pip install fastapi); use create_app (Flask) where it is "
            "unavailable — the two expose identical routes"
        ) from exc

    class PipelineCreate(BaseModel):
        pipeline_name: str
        description: str = ""
        schedule: Optional[str] = None

    class PipelineUpdate(BaseModel):
        pipeline_name: Optional[str] = None
        description: Optional[str] = None
        schedule: Optional[str] = None
        is_active: Optional[int] = None

    class ExecutionCreate(BaseModel):
        pipeline_id: int

    class BackfillCreate(BaseModel):
        partitions: list
        param_name: str = "partition"
        resume: bool = True

    app = FastAPI(title="metadata-etl-spark")

    @app.get("/health")
    def health() -> dict[str, Any]:
        n = store.query("SELECT COUNT(*) AS n FROM PIPELINES")[0]["n"]
        return {"status": "ok", "pipelines": n}

    @app.get("/pipelines")
    def list_pipelines() -> list[dict[str, Any]]:
        return store.query("SELECT * FROM PIPELINES")

    @app.post("/pipelines", status_code=201)
    def create_pipeline(body: PipelineCreate) -> dict[str, Any]:
        pid = store.register_pipeline(
            body.pipeline_name, body.description, body.schedule
        )
        return {"pipeline_id": pid}

    @app.get("/pipelines/{pipeline_id}")
    def show_pipeline(pipeline_id: int) -> Response:
        try:
            config = ConfigLoader(store).load_pipeline_metadata(pipeline_id)
        except KeyError:
            raise HTTPException(status_code=404, detail="not found")
        return Response(
            json.dumps(config, default=str), media_type="application/json"
        )

    @app.put("/pipelines/{pipeline_id}")
    def update_pipeline(pipeline_id: int, body: PipelineUpdate) -> dict[str, Any]:
        rows = store.query(
            "SELECT * FROM PIPELINES WHERE pipeline_id = ?", (pipeline_id,)
        )
        if not rows:
            raise HTTPException(status_code=404, detail="not found")
        updates = {
            k: v for k, v in body.model_dump(exclude_unset=True).items()
            if v is not None
        }
        if updates:
            sets = ", ".join(f"{k} = ?" for k in updates)
            store.execute(
                f"UPDATE PIPELINES SET {sets} WHERE pipeline_id = ?",
                (*updates.values(), pipeline_id),
            )
        return {"pipeline_id": pipeline_id, "updated": sorted(updates)}

    @app.delete("/pipelines/{pipeline_id}")
    def delete_pipeline(pipeline_id: int) -> dict[str, Any]:
        rows = store.query(
            "SELECT * FROM PIPELINES WHERE pipeline_id = ?", (pipeline_id,)
        )
        if not rows:
            raise HTTPException(status_code=404, detail="not found")
        # soft delete (reference semantics: deactivate, keep run history)
        store.execute(
            "UPDATE PIPELINES SET is_active = 0 WHERE pipeline_id = ?",
            (pipeline_id,),
        )
        return {"pipeline_id": pipeline_id, "deleted": True}

    @app.get("/executions/{run_id}/status")
    def execution_status(run_id: int) -> dict[str, Any]:
        rows = store.query(
            "SELECT run_id, pipeline_id, status, started_at, finished_at, "
            "duration_sec FROM PIPELINE_RUNS WHERE run_id = ?",
            (run_id,),
        )
        if not rows:
            raise HTTPException(status_code=404, detail="not found")
        return rows[0]

    @app.post("/executions/{run_id}/cancel")
    def cancel_execution(run_id: int) -> dict[str, Any]:
        rows = store.query(
            "SELECT status FROM PIPELINE_RUNS WHERE run_id = ?", (run_id,)
        )
        if not rows:
            raise HTTPException(status_code=404, detail="not found")
        if rows[0]["status"] not in ("RUNNING", "PENDING"):
            raise HTTPException(
                status_code=409,
                detail=f"not cancellable: {rows[0]['status']}",
            )
        store.execute(
            "UPDATE PIPELINE_RUNS SET status = 'CANCELLED' WHERE run_id = ?",
            (run_id,),
        )
        return {"run_id": run_id, "status": "CANCELLED"}

    @app.post("/executions", status_code=201)
    def create_execution(body: ExecutionCreate) -> dict[str, Any]:
        if orchestrator is None:
            raise HTTPException(
                status_code=503, detail="no orchestrator attached"
            )
        result = orchestrator.execute_pipeline(
            body.pipeline_id, trigger_type="api", triggered_by="rest"
        )
        return json.loads(json.dumps(result, default=str))

    @app.post("/pipelines/{pipeline_id}/backfill", status_code=201)
    def backfill_pipeline(
        pipeline_id: int, body: BackfillCreate
    ) -> dict[str, Any]:
        if orchestrator is None:
            raise HTTPException(
                status_code=503, detail="no orchestrator attached"
            )
        if not body.partitions:
            raise HTTPException(
                status_code=400, detail="partitions list required"
            )
        result = orchestrator.backfill(
            pipeline_id,
            body.partitions,
            param_name=body.param_name,
            resume=body.resume,
        )
        return json.loads(json.dumps(result, default=str))

    @app.get("/executions")
    def list_executions() -> list[dict[str, Any]]:
        return store.query(
            "SELECT * FROM PIPELINE_RUNS ORDER BY run_id DESC LIMIT 50"
        )

    @app.get("/executions/{run_id}")
    def get_execution(run_id: int) -> dict[str, Any]:
        rows = store.query(
            "SELECT * FROM PIPELINE_RUNS WHERE run_id = ?", (run_id,)
        )
        if not rows:
            raise HTTPException(status_code=404, detail="not found")
        return rows[0]

    @app.get("/metrics")
    def metrics() -> dict[str, Any]:
        runs = store.query(
            "SELECT status, COUNT(*) AS n, AVG(duration_sec) AS avg_duration "
            "FROM PIPELINE_RUNS GROUP BY status"
        )
        return {"runs": runs}

    return app
