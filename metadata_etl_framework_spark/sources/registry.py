"""Connector factory: connection-config dict → reader/writer object.

Parity target: ``_create_connector`` (reference:
src/transform/connector_factory.py:135-147) — dispatch on the ``type``
field:
  oracle/postgresql/mysql/sqlserver/mssql → JDBC
  csv/excel/parquet/json/file            → FileConnector
  s3/azure_blob/gcs/azure                → FileConnector (URI scheme)
  mongodb/cassandra                      → Spark connector formats
  redis/dynamodb                         → driver-side KV connectors
  rest/soap/api                          → driver-side API connector

JDBC replaces the reference's hand-rolled cursor batching with Spark's
partitioned reads (partitionColumn/lowerBound/upperBound/numPartitions) —
the scale path for parallel extraction from an RDBMS.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from metadata_etl_framework_spark.sources.file_connector import FileConnector

_JDBC_SUBPROTOCOL = {
    "postgresql": "postgresql",
    "mysql": "mysql",
    "oracle": "oracle:thin",
    "sqlserver": "sqlserver",
    "mssql": "sqlserver",
    "sqlite": "sqlite",
    # embedded, file-backed (jdbc:derby:/path;create=true — pass url=);
    # Derby ships in Spark's own jars, so this arm is integration-testable
    # with no external server (tests/test_relational_jdbc.py)
    "derby": "derby",
}

_FILE_TYPES = {"csv", "excel", "parquet", "json", "file", "orc",
               "s3", "azure_blob", "gcs", "azure", "hdfs"}


class JDBCConnector:
    """Relational scan/sink over Spark's JDBC source.

    read(query=...) pushes the full query to the database; read(table=...,
    partition_column=...) parallelizes the scan across numPartitions.
    Write modes: append / overwrite / truncate_and_load (overwrite with
    truncate=true — preserves table DDL, reference parity:
    src/connectors/relational_connector.py:117-164).
    """

    def __init__(self, spark: SparkSession, conn_config: dict[str, Any]):
        self.spark = spark
        self.cfg = conn_config
        sub = _JDBC_SUBPROTOCOL.get(conn_config.get("type", "").lower())
        self.url = conn_config.get("url") or (
            f"jdbc:{sub}://{conn_config.get('host', 'localhost')}:"
            f"{conn_config.get('port', '')}/{conn_config.get('database', '')}"
        )

    def _base_options(self) -> dict[str, str]:
        opts = {"url": self.url}
        for k in ("user", "password", "driver"):
            if self.cfg.get(k):
                opts[k] = str(self.cfg[k])
        return opts

    def read(
        self,
        query: str | None = None,
        table: str | None = None,
        partition_column: str | None = None,
        lower_bound: Any = None,
        upper_bound: Any = None,
        num_partitions: int | None = None,
        **options: Any,
    ) -> DataFrame:
        opts = {**self._base_options(), **options}
        if query:
            opts["query"] = query
        elif table:
            opts["dbtable"] = table
        else:
            raise ValueError("need query= or table=")
        if partition_column:
            opts.update(
                partitionColumn=partition_column,
                lowerBound=str(lower_bound),
                upperBound=str(upper_bound),
                numPartitions=str(num_partitions or 8),
            )
        return self.spark.read.format("jdbc").options(**opts).load()

    def write(self, df: DataFrame, table: str, mode: str = "append", **options) -> None:
        opts = {**self._base_options(), "dbtable": table, **options}
        if mode == "truncate_and_load":
            df.write.format("jdbc").options(**opts, truncate="true").mode("overwrite").save()
        else:
            df.write.format("jdbc").options(**opts).mode(mode).save()


def create_connector(spark: SparkSession, conn_config: dict[str, Any]):
    """Dispatch a connection-config dict to the right connector object."""
    ctype = str(conn_config.get("type", "")).lower()
    if ctype in _JDBC_SUBPROTOCOL:
        return JDBCConnector(spark, conn_config)
    if ctype in _FILE_TYPES:
        return FileConnector(spark, conn_config.get("options"))
    if ctype == "mongodb":
        from metadata_etl_framework_spark.sources.nosql_connector import (
            MongoConnector,
        )

        return MongoConnector(spark, conn_config)
    if ctype == "cassandra":
        from metadata_etl_framework_spark.sources.nosql_connector import (
            CassandraConnector,
        )

        return CassandraConnector(spark, conn_config)
    if ctype == "redis":
        from metadata_etl_framework_spark.sources.nosql_connector import (
            RedisConnector,
        )

        return RedisConnector(spark, conn_config)
    if ctype in {"dynamodb", "dynamo"}:
        from metadata_etl_framework_spark.sources.nosql_connector import (
            DynamoConnector,
        )

        return DynamoConnector(spark, conn_config)
    if ctype in {"rest", "soap", "api", "graphql"}:
        from metadata_etl_framework_spark.sources.api_connector import APIConnector

        return APIConnector(spark, conn_config)
    raise ValueError(f"unknown connector type {ctype!r}")
