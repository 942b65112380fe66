"""FastAPI dual of the REST surface (api/fastapi_app.py).

The reference ships Flask AND FastAPI apps over the same store
(src/api/rest_api.py:613-673); this suite drives the FastAPI twin
through the same scenario test_control_plane.py::test_cli_and_rest runs
against Flask. FastAPI is optional (absent in this sandbox), so the
client tests skip cleanly without it — but the import-gate contract
(clear ImportError with an install hint, pointing at the Flask arm) is
asserted unconditionally.
"""

from __future__ import annotations

import pytest

from metadata_etl_framework_spark.catalog.store import MetadataStore


def _has_fastapi() -> bool:
    try:
        import fastapi  # noqa: F401
        import fastapi.testclient  # noqa: F401 (needs httpx)

        return True
    except ImportError:
        return False


def test_import_gate_message_without_fastapi():
    """Where FastAPI is missing, create_fastapi_app must raise the
    documented ImportError naming the package and the Flask fallback —
    not an opaque ModuleNotFoundError from deep inside."""
    if _has_fastapi():
        pytest.skip("fastapi installed; gate path not reachable")
    from metadata_etl_framework_spark.api.fastapi_app import create_fastapi_app

    with pytest.raises(ImportError, match="fastapi.*create_app"):
        create_fastapi_app(MetadataStore(":memory:"))


@pytest.mark.skipif(not _has_fastapi(), reason="fastapi not installed")
def test_fastapi_routes_mirror_flask(spark, tmp_path):
    """Same scenario as the Flask arm: health, CRUD, execution lifecycle,
    metrics — identical routes, status codes, and payload shapes."""
    from fastapi.testclient import TestClient

    from metadata_etl_framework_spark.api.fastapi_app import create_fastapi_app
    from metadata_etl_framework_spark.orchestrator.manager import (
        OrchestratorManager,
    )
    from tests.test_control_plane import _register_q1_pipeline

    disk = MetadataStore(str(tmp_path / "meta.db"))
    pid = _register_q1_pipeline(disk, str(tmp_path / "out"))

    app = create_fastapi_app(disk, orchestrator=OrchestratorManager(spark, disk))
    client = TestClient(app)

    assert client.get("/health").json()["status"] == "ok"
    assert client.get("/pipelines").json()[0]["pipeline_name"] == (
        "pricing_summary"
    )

    created = client.post(
        "/pipelines",
        json={"pipeline_name": "second", "description": "d"},
    )
    assert created.status_code == 201 and created.json()["pipeline_id"]

    run = client.post("/executions", json={"pipeline_id": pid})
    assert run.status_code == 201 and run.json()["status"] == "SUCCESS"
    listed = client.get("/executions").json()
    assert listed and listed[0]["status"] == "SUCCESS"
    assert client.get("/metrics").json()["runs"]

    upd = client.put(f"/pipelines/{pid}", json={"description": "new desc"})
    assert upd.status_code == 200 and upd.json()["updated"] == ["description"]
    assert client.put("/pipelines/99999", json={}).status_code == 404
    dele = client.delete(f"/pipelines/{pid}")
    assert dele.status_code == 200 and dele.json()["deleted"]
    assert disk.query(
        "SELECT is_active FROM PIPELINES WHERE pipeline_id = ?", (pid,)
    )[0]["is_active"] == 0

    run_id = listed[0]["run_id"]
    st = client.get(f"/executions/{run_id}/status")
    assert st.status_code == 200 and st.json()["status"] == "SUCCESS"
    assert client.post(f"/executions/{run_id}/cancel").status_code == 409
    disk.execute(
        "UPDATE PIPELINE_RUNS SET status = 'RUNNING' WHERE run_id = ?",
        (run_id,),
    )
    ok = client.post(f"/executions/{run_id}/cancel")
    assert ok.status_code == 200 and ok.json()["status"] == "CANCELLED"
