"""Live JDBC round-trip for the relational connector — no server needed.

Embedded Apache Derby ships inside Spark's own jars (it backs the Hive
metastore), so `JDBCConnector` gets a REAL integration test of its
read/write arms (`sources/registry.py`) in this sandbox: append,
truncate_and_load, query pushdown, and the partitioned parallel scan.
Every other relational flavor differs only by URL/driver string.
Skip-gated in case a stripped Spark build lacks the Derby jars.
"""

from __future__ import annotations

import pytest

from metadata_etl_framework_spark.sources.registry import (
    JDBCConnector,
    create_connector,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _connector(spark, tmp_path) -> JDBCConnector:
    conn = create_connector(
        spark,
        {
            "type": "derby",
            "url": f"jdbc:derby:{tmp_path}/smokedb;create=true",
            "driver": DRIVER,
        },
    )
    assert isinstance(conn, JDBCConnector)
    return conn


def _skip_if_no_derby(exc: Exception):
    msg = str(exc)
    if "ClassNotFoundException" in msg or "No suitable driver" in msg:
        pytest.skip(f"Derby JDBC driver unavailable: {msg[:120]}")
    raise exc


def test_jdbc_write_read_roundtrip_and_query_pushdown(spark, tmp_path):
    conn = _connector(spark, tmp_path)
    df = spark.createDataFrame(
        [(i, f"name_{i}", float(i) * 1.5) for i in range(100)],
        "id int, name string, score double",
    )
    try:
        conn.write(df, "people", mode="append")
    except Exception as exc:  # pragma: no cover - env-dependent
        _skip_if_no_derby(exc)

    back = conn.read(table="people")
    assert back.count() == 100
    assert set(back.columns) == {"ID", "NAME", "SCORE"} or set(
        back.columns
    ) == {"id", "name", "score"}

    # query= pushes the filter to the database, not to Spark (quoted
    # identifiers: Spark's JDBC writer creates case-preserved columns,
    # which Derby folds to uppercase if referenced unquoted)
    filtered = conn.read(
        query='SELECT "id", "score" FROM people WHERE "id" < 10'
    )
    rows = filtered.collect()
    assert len(rows) == 10
    assert {r[0] for r in rows} == set(range(10))

    # append again doubles; truncate_and_load resets to exactly the frame
    conn.write(df, "people", mode="append")
    assert conn.read(table="people").count() == 200
    conn.write(df, "people", mode="truncate_and_load")
    assert conn.read(table="people").count() == 100


def test_jdbc_partitioned_parallel_scan(spark, tmp_path):
    """partitionColumn/numPartitions: the scan splits into bound ranges —
    the scale path for parallel RDBMS extraction — and the union of the
    partitions is exactly the table."""
    conn = _connector(spark, tmp_path)
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(500)], "id int, bucket int"
    )
    try:
        conn.write(df, "wide", mode="append")
    except Exception as exc:  # pragma: no cover - env-dependent
        _skip_if_no_derby(exc)

    scanned = conn.read(
        table="wide",
        partition_column="id",
        lower_bound=0,
        upper_bound=500,
        num_partitions=4,
    )
    assert scanned.rdd.getNumPartitions() == 4
    assert scanned.count() == 500
    assert sorted(r[0] for r in scanned.select("id").collect()) == list(
        range(500)
    )
