"""CLI entry points.

Parity target: src/api/cli.py:493-541 — commands:
    setup-db, pipelines list|show|execute|template,
    executions list|status|cancel, health

Usage:
    python -m metadata_etl_framework_spark.api.cli --db etl.db pipelines list
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any

from metadata_etl_framework_spark.catalog.store import ConfigLoader, MetadataStore

PIPELINE_TEMPLATE: dict[str, Any] = {
    "pipeline": {"pipeline_name": "example", "schedule": "0 2 * * *"},
    "sources": [
        {"source_name": "lineitem", "source_type": "parquet",
         "parameters": {"path": "/data/lineitem.parquet"}}
    ],
    "transformations": [
        {"primary_source": "lineitem", "steps": [
            {"type": "filter", "config": {"condition": "l_quantity > 0"}},
            {"type": "aggregate", "config": {
                "group_by": ["l_returnflag"],
                "aggregations": {"l_quantity": ["sum"]}}},
        ]}
    ],
    # corpus-curation steps (documents tables): filter_funnel -> dedup
    # -> quality_filter -> sample -> split, all deterministic; a drift
    # step compares the batch against a named reference source; see
    # operators/step_compiler
    "curation_steps_example": [
        {"type": "filter_funnel", "config": {"stages": [
            {"name": "min_chars", "condition": "length(text) >= 100"},
            {"name": "lang", "condition": "lang = 'en'"}]}},
        {"type": "dedup", "config": {"method": "near", "threshold": 0.8}},
        {"type": "quality_filter", "config": {"min_score": 0.5}},
        {"type": "sample", "config": {"mode": "weighted_k", "k": 10000,
                                      "weight_column": "n_chars"}},
        {"type": "split", "config": {"fractions": {"train": 0.98,
                                                   "val": 0.01,
                                                   "test": 0.01}}},
    ],
    "targets": [
        {"target_name": "out", "target_type": "parquet",
         "parameters": {"path": "/data/out"}}
    ],
    "dq_rules": [{"type": "not_null", "column": "l_returnflag"}],
    "slas": [{"sla_type": "execution_time", "threshold": 600}],
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="metadata-etl-spark")
    p.add_argument("--db", default="metadata.db", help="metadata store path")
    sub = p.add_subparsers(dest="command", required=True)

    sub.add_parser("setup-db", help="create metadata tables")
    sub.add_parser("health", help="engine + catalog health check")

    pp = sub.add_parser("pipelines").add_subparsers(dest="sub", required=True)
    pp.add_parser("list")
    show = pp.add_parser("show")
    show.add_argument("pipeline_id", type=int)
    ex = pp.add_parser("execute")
    ex.add_argument("pipeline_id", type=int)
    xp = pp.add_parser("explain")
    xp.add_argument("pipeline_id", type=int)
    xp.add_argument("--fail-on-cartesian", action="store_true")
    bf = pp.add_parser("backfill")
    bf.add_argument("pipeline_id", type=int)
    bf.add_argument("partitions", nargs="+",
                    help="partition values substituted for {partition}")
    bf.add_argument("--param-name", default="partition")
    bf.add_argument("--no-resume", action="store_true")
    pp.add_parser("template")

    ee = sub.add_parser("executions").add_subparsers(dest="sub", required=True)
    ee.add_parser("list")
    st = ee.add_parser("status")
    st.add_argument("run_id", type=int)
    ca = ee.add_parser("cancel")
    ca.add_argument("run_id", type=int)

    sc = sub.add_parser("schema").add_subparsers(dest="sub", required=True)
    sc.add_parser("version")
    sc.add_parser("history")
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = build_parser().parse_args(argv)
    store = MetadataStore(args.db)

    if args.command == "setup-db":
        print(f"metadata store initialized at {args.db}")
        return 0
    if args.command == "health":
        n = store.query("SELECT COUNT(*) AS n FROM PIPELINES")[0]["n"]
        print(json.dumps({"status": "ok", "pipelines": n}))
        return 0
    if args.command == "pipelines":
        if args.sub == "list":
            for row in store.query("SELECT * FROM PIPELINES"):
                print(json.dumps(row))
        elif args.sub == "show":
            config = ConfigLoader(store).load_pipeline_metadata(args.pipeline_id)
            print(json.dumps(config, indent=2, default=str))
        elif args.sub == "template":
            print(json.dumps(PIPELINE_TEMPLATE, indent=2))
        elif args.sub == "execute":
            from metadata_etl_framework_spark.orchestrator.manager import (
                OrchestratorManager,
            )
            from metadata_etl_framework_spark.session import get_spark

            spark = spark or get_spark(app_name="cli")
            result = OrchestratorManager(spark, store).execute_pipeline(
                args.pipeline_id, trigger_type="manual", triggered_by="cli"
            )
            print(json.dumps(result, default=str))
        elif args.sub == "explain":
            from metadata_etl_framework_spark.operators import TransformEngine
            from metadata_etl_framework_spark.session import get_spark

            spark = spark or get_spark(app_name="cli")
            from metadata_etl_framework_spark.sources.registry import (
                create_connector,
            )

            config = ConfigLoader(store).load_pipeline_metadata(
                args.pipeline_id
            )
            # dry-run extraction: build the source frames WITHOUT the
            # extraction-log side effects the real run records
            conn_cache = {
                c["connection_id"]: c
                for c in store.query("SELECT * FROM CONNECTIONS")
            }
            sources = {}
            for sc in config["sources"]:
                conn = conn_cache.get(sc.get("connection_id"))
                connector = create_connector(
                    spark,
                    {
                        "type": sc["source_type"],
                        **(dict(conn) if conn else {}),
                        **sc["parameters"],
                    },
                )
                sources[sc["source_name"]] = connector.read(**sc["parameters"])
            eng = TransformEngine(spark)
            for tconf in config.get("transformations", []):
                rows = eng.explain_transformations(
                    sources, tconf,
                    primary=tconf.get("primary_source"),
                    fail_on_cartesian=args.fail_on_cartesian,
                )
                for row in rows:
                    print(json.dumps(row, default=str))
        elif args.sub == "backfill":
            from metadata_etl_framework_spark.orchestrator.manager import (
                OrchestratorManager,
            )
            from metadata_etl_framework_spark.session import get_spark

            spark = spark or get_spark(app_name="cli")
            result = OrchestratorManager(spark, store).backfill(
                args.pipeline_id,
                args.partitions,
                param_name=args.param_name,
                resume=not args.no_resume,
            )
            print(json.dumps(result, default=str))
        return 0
    if args.command == "executions":
        if args.sub == "list":
            for row in store.query(
                "SELECT * FROM PIPELINE_RUNS ORDER BY run_id DESC LIMIT 50"
            ):
                print(json.dumps(row))
        elif args.sub == "status":
            rows = store.query(
                "SELECT * FROM PIPELINE_RUNS WHERE run_id = ?", (args.run_id,)
            )
            print(json.dumps(rows[0] if rows else {"error": "not found"}))
        elif args.sub == "cancel":
            rows = store.query(
                "SELECT status FROM PIPELINE_RUNS WHERE run_id = ?", (args.run_id,)
            )
            if not rows:
                print(json.dumps({"error": "not found"}))
                return 1
            if rows[0]["status"] not in ("RUNNING", "PENDING"):
                print(json.dumps(
                    {"error": f"not cancellable: {rows[0]['status']}"}
                ))
                return 1
            store.execute(
                "UPDATE PIPELINE_RUNS SET status = 'CANCELLED' WHERE run_id = ?",
                (args.run_id,),
            )
            print(json.dumps({"run_id": args.run_id, "status": "CANCELLED"}))
        return 0
    if args.command == "schema":
        from metadata_etl_framework_spark.catalog.schema_manager import (
            SchemaManager,
        )

        mgr = SchemaManager(store)
        if args.sub == "version":
            print(json.dumps({"version": mgr.get_current_schema_version()}))
        elif args.sub == "history":
            for row in mgr.history():
                print(json.dumps(row, default=str))
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
