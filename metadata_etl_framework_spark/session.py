"""SparkSession factory.

Centralizes the session configuration so every entry point (tests, bench,
CLI, driver contract) builds sessions the same way. Tuned for local[N]
iteration but with settings that carry to a real cluster: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), UTC session
timezone (deterministic timestamp semantics), Arrow enabled for the
pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "metadata-etl-framework-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a real cluster the caller passes the cluster master / relies on
    spark-submit; nothing here assumes single-node execution.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # ops/exact_agg.py's overflow contract requires ANSI mode: a long
        # overflow of a level-1 partial must fail LOUDLY, never wrap. ANSI
        # defaults ON in Spark 4 but OFF in 3.5 — pin it explicitly so the
        # exactness guarantee is engine-version independent.
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # test/bench parquet carries TIMESTAMP(NANOS); read as long and let
        # sources.tables.read_parquet_table rebuild TimestampType columns
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
