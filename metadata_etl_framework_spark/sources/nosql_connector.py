"""NoSQL sources/sinks: MongoDB, Cassandra, Redis, DynamoDB.

Parity target: ``NoSQLConnector`` (reference:
src/connectors/nosql_connector.py:92-193 — read/write over pymongo,
cassandra-driver, redis, boto3). Spark-first split:

- **MongoDB / Cassandra** scale through their official Spark connector
  packages (``mongodb`` / ``org.apache.spark.sql.cassandra`` formats):
  the scan distributes across executors with partition pushdown — never
  a driver-side cursor loop like the reference. The option plumbing is a
  pure function (unit-testable without the package); load() surfaces a
  clear error naming the required ``spark.jars.packages`` coordinate
  when the connector jar is absent.
- **Redis / DynamoDB** are key-value stores without Spark connectors in
  common use; I/O is driver-side through their clients (injectable for
  tests, import-gated otherwise) and lands in a DataFrame immediately,
  like the reference — bounded by an explicit key set / scan pagination.
"""

from __future__ import annotations

import json
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession

MONGO_PACKAGE = "org.mongodb.spark:mongo-spark-connector_2.13:10.4.0"
CASSANDRA_PACKAGE = "com.datastax.spark:spark-cassandra-connector_2.13:3.5.1"


class MongoConnector:
    """Distributed MongoDB scan/sink via the Spark Mongo connector."""

    FORMAT = "mongodb"

    def __init__(self, spark: SparkSession, conn_config: dict[str, Any]):
        self.spark = spark
        self.cfg = conn_config

    def read_options(
        self,
        collection: str | None = None,
        pipeline: list[dict] | None = None,
    ) -> dict[str, str]:
        cfg = self.cfg
        uri = cfg.get("uri") or (
            f"mongodb://{cfg.get('host', 'localhost')}:{cfg.get('port', 27017)}"
        )
        opts = {
            "connection.uri": uri,
            "database": str(cfg.get("database", "default")),
            "collection": str(collection or cfg.get("collection", "")),
        }
        if not opts["collection"]:
            raise ValueError("MongoDB connector requires 'collection'")
        if pipeline:
            # server-side filter/project pushdown (find(query) parity)
            opts["aggregation.pipeline"] = json.dumps(pipeline)
        return opts

    def read(self, collection: str | None = None,
             pipeline: list[dict] | None = None) -> DataFrame:
        opts = self.read_options(collection, pipeline)
        try:
            return self.spark.read.format(self.FORMAT).options(**opts).load()
        except Exception as e:  # connector jar absent → actionable message
            raise RuntimeError(
                f"MongoDB Spark connector not on the classpath; add "
                f"spark.jars.packages={MONGO_PACKAGE}"
            ) from e

    def write(self, df: DataFrame, collection: str | None = None,
              mode: str = "append") -> None:
        opts = self.read_options(collection)
        spark_mode = "overwrite" if mode == "overwrite" else "append"
        try:
            df.write.format(self.FORMAT).options(**opts).mode(spark_mode).save()
        except Exception as e:
            raise RuntimeError(
                f"MongoDB Spark connector not on the classpath; add "
                f"spark.jars.packages={MONGO_PACKAGE}"
            ) from e


class CassandraConnector:
    """Distributed Cassandra scan/sink via the DataStax Spark connector."""

    FORMAT = "org.apache.spark.sql.cassandra"

    def __init__(self, spark: SparkSession, conn_config: dict[str, Any]):
        self.spark = spark
        self.cfg = conn_config

    def read_options(self, table: str | None = None) -> dict[str, str]:
        cfg = self.cfg
        opts = {
            "keyspace": str(cfg.get("keyspace", cfg.get("database", ""))),
            "table": str(table or cfg.get("table", "")),
        }
        if cfg.get("host"):
            opts["spark.cassandra.connection.host"] = str(cfg["host"])
        if cfg.get("port"):
            opts["spark.cassandra.connection.port"] = str(cfg["port"])
        if not opts["keyspace"] or not opts["table"]:
            raise ValueError("Cassandra connector requires 'keyspace' and 'table'")
        return opts

    def read(self, table: str | None = None) -> DataFrame:
        opts = self.read_options(table)
        try:
            return self.spark.read.format(self.FORMAT).options(**opts).load()
        except Exception as e:
            raise RuntimeError(
                f"Cassandra Spark connector not on the classpath; add "
                f"spark.jars.packages={CASSANDRA_PACKAGE}"
            ) from e

    def write(self, df: DataFrame, table: str | None = None,
              mode: str = "append") -> None:
        opts = self.read_options(table)
        writer = df.write.format(self.FORMAT).options(**opts)
        try:
            if mode == "overwrite":
                # connector requires explicit opt-in to truncate
                writer.mode("overwrite").option("confirm.truncate", "true").save()
            else:
                writer.mode("append").save()
        except Exception as e:
            raise RuntimeError(
                f"Cassandra Spark connector not on the classpath; add "
                f"spark.jars.packages={CASSANDRA_PACKAGE}"
            ) from e


class RedisConnector:
    """Driver-side Redis key-value scan/sink → DataFrame.

    ``client`` is injectable (tests use a dict-backed fake); otherwise the
    ``redis`` package is import-gated. Reads are bounded by an explicit
    key list or a scan pattern — no unbounded full-keyspace pull unless
    asked (reference parity: nosql_connector.py:125-129, 178-184).
    """

    def __init__(self, spark: SparkSession, conn_config: dict[str, Any],
                 client: Any | None = None):
        self.spark = spark
        self.cfg = conn_config
        self._client = client

    @property
    def client(self) -> Any:
        if self._client is None:
            try:
                import redis  # noqa: PLC0415
            except ImportError as e:
                raise RuntimeError(
                    "redis package not installed; inject a client"
                ) from e
            self._client = redis.Redis(**self.cfg.get("conn_args", {}))
        return self._client

    @staticmethod
    def _decode(v: Any) -> str | None:
        if v is None:
            return None
        return v.decode() if isinstance(v, (bytes, bytearray)) else str(v)

    def read(self, keys: Iterable[str] | None = None,
             pattern: str | None = None) -> DataFrame:
        c = self.client
        if keys is None:
            keys = [self._decode(k) for k in c.scan_iter(match=pattern or "*")]
        keys = list(keys)
        values = c.mget(keys) if keys else []
        rows = [
            {"key": k, "value": self._decode(v)} for k, v in zip(keys, values)
        ]
        return self.spark.createDataFrame(rows, schema="key string, value string")

    def write(self, df: DataFrame, key_col: str = "key",
              value_col: str = "value") -> int:
        c = self.client
        n = 0
        # one partition resident on the driver at a time
        for row in df.toLocalIterator():
            k, v = row[key_col], row[value_col]
            if k is not None and v is not None:
                c.set(k, v)
                n += 1
        return n


class DynamoConnector:
    """Driver-side DynamoDB scan/sink → DataFrame.

    ``resource`` is injectable (tests use a fake with paged scans);
    otherwise boto3 is import-gated. The scan follows LastEvaluatedKey
    pagination to completion (the reference read a single page —
    nosql_connector.py:131-137 — which silently truncates at 1 MB)."""

    def __init__(self, spark: SparkSession, conn_config: dict[str, Any],
                 resource: Any | None = None):
        self.spark = spark
        self.cfg = conn_config
        self._resource = resource

    @property
    def resource(self) -> Any:
        if self._resource is None:
            try:
                import boto3  # noqa: PLC0415
            except ImportError as e:
                raise RuntimeError(
                    "boto3 not installed; inject a dynamodb resource"
                ) from e
            self._resource = boto3.resource(
                "dynamodb", **self.cfg.get("conn_args", {})
            )
        return self._resource

    def read(self, table: str | None = None, limit: int | None = None) -> DataFrame:
        name = table or self.cfg.get("table")
        if not name:
            raise ValueError("DynamoDB connector requires 'table'")
        t = self.resource.Table(name)
        items: list[dict] = []
        kwargs: dict[str, Any] = {}
        while True:
            resp = t.scan(**kwargs)
            items.extend(resp.get("Items", []))
            if limit is not None and len(items) >= limit:
                items = items[:limit]
                break
            lek = resp.get("LastEvaluatedKey")
            if not lek:
                break
            kwargs["ExclusiveStartKey"] = lek
        if not items:
            return self.spark.createDataFrame([], schema="dummy string").limit(0)
        return self.spark.createDataFrame(items)

    def write(self, df: DataFrame, table: str | None = None) -> int:
        name = table or self.cfg.get("table")
        if not name:
            raise ValueError("DynamoDB connector requires 'table'")
        t = self.resource.Table(name)
        n = 0
        for row in df.toLocalIterator():
            t.put_item(Item=row.asDict(recursive=True))
            n += 1
        return n
