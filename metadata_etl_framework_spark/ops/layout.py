"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping.

A table range-partitioned and sorted by ONE column prunes scans on that
column only; interleaving the bits of several columns into one Morton
code and range-partitioning by it co-locates rows that are close in ALL
of those dimensions, so min/max file statistics prune selective scans
on any participating column (the technique behind Delta/Iceberg
``OPTIMIZE ZORDER BY``; public literature: Morton 1966, the lakehouse
z-ordering write-ups). At 100 TB this is the difference between a
2-column predicate reading ~1/N of the files and reading all of them.

Everything here is pure JVM integer arithmetic (shifts as multiplies,
masks as mod) — no UDF, fully codegen-able, and independently
recomputable by any SQL engine for oracle verification.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min-max scale a numeric column onto the integer grid [0, 2^bits):
    rank-preserving, constant columns land on 0."""
    span = hi - lo
    frac = F.when(span > 0, (col - lo) / span).otherwise(F.lit(0.0))
    top = F.lit((1 << bits) - 1)
    return F.least(
        top, F.floor(frac * (1 << bits)).cast("long")
    )


def zorder_value(scaled: Sequence[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of the pre-scaled integer columns
    into one Morton code (column 0 owns bit positions 0, n, 2n, ...)."""
    n = len(scaled)
    terms = []
    for j, c in enumerate(scaled):
        for i in range(bits):
            # ((c >> i) & 1) << (i*n + j), written with */% so the same
            # expression runs verbatim on any SQL engine
            bit = (c / F.lit(1 << i)).cast("long") % 2
            terms.append(bit * F.lit(1 << (i * n + j)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_repartition(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 12,
    num_partitions: int | None = None,
    out_col: str = "zvalue",
) -> DataFrame:
    """Append a Morton code over ``cols`` and range-partition + sort by
    it, producing write-ready partitions whose per-file min/max stats are
    tight in every participating dimension.

    One bounded stats aggregate (min/max per column) sizes the grid; the
    code itself is a pure projection. ``df.write`` after this yields the
    z-ordered layout; readers need nothing special — pruning falls out
    of ordinary parquet row-group statistics.
    """
    cols = list(cols)
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_hi_{c}") for c in cols],
    ).collect()[0]
    scaled = [
        _scale_to_bits(
            F.col(c).cast("double"),
            F.lit(float(stats[f"_lo_{c}"] if stats[f"_lo_{c}"] is not None else 0.0)),
            F.lit(float(stats[f"_hi_{c}"] if stats[f"_hi_{c}"] is not None else 0.0)),
            bits,
        )
        for c in cols
    ]
    with_z = df.withColumn(out_col, zorder_value(scaled, bits))
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return with_z.repartitionByRange(n, out_col).sortWithinPartitions(out_col)


def estimate_row_bytes(df: DataFrame, sample_rows: int = 2000) -> float:
    """In-memory bytes per row, estimated from a bounded driver sample
    (``sample_rows`` rows — never the dataset). Used to size output
    files; the sample cost is constant regardless of table size."""
    pdf = df.limit(sample_rows).toPandas()
    if len(pdf) == 0:
        return 1.0
    return float(pdf.memory_usage(index=False, deep=True).sum()) / len(pdf)


def write_sized(
    df: DataFrame,
    path: str,
    target_file_mb: int = 128,
    partition_cols: Sequence[str] = (),
    fmt: str = "parquet",
    mode: str = "overwrite",
    compression_ratio: float = 0.35,
    sample_rows: int = 2000,
) -> int:
    """Write with a target on-disk file size — the small-files problem is
    the classic 100-TB sink failure (a 1000-task job writing 1000 tiny
    files per partition kills the next scan).

    Spark-first sizing: compute rows-per-file from a bounded row-size
    sample and let ``maxRecordsPerFile`` split — no repartition guess,
    no extra shuffle. With ``partition_cols`` the frame is first
    hash-partitioned on them so each Hive partition is written by few
    tasks (instead of every task writing to every partition).

    Returns the rows-per-file used (also handy for tests/telemetry).
    ``compression_ratio`` converts in-memory sample bytes to expected
    parquet bytes (documented heuristic default).
    """
    row_bytes = estimate_row_bytes(df, sample_rows) * compression_ratio
    rows_per_file = max(int(target_file_mb * 1024 * 1024 / max(row_bytes, 1.0)), 1)
    out = df
    if partition_cols:
        out = out.repartition(*[F.col(c) for c in partition_cols])
    writer = (
        out.write.mode(mode)
        .option("maxRecordsPerFile", rows_per_file)
        .format(fmt)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)
    return rows_per_file


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    path_col: str = "path",
    size_col: str = "size_bytes",
) -> DataFrame:
    """Small-file compaction plan: assign files to merge groups of
    ~``target_bytes`` each (the lakehouse maintenance pass that turns
    thousands of streaming-committed small files into scan-friendly
    ones).

    Greedy by cumulative size in (size, path) order: group id =
    ``floor((cumsum - size) / target)`` — every group's input is below
    target + one file, and the assignment is a pure function of the file
    listing (idempotent across reruns; a re-listed unchanged directory
    yields the identical plan). The cumulative sum is the two-phase
    distributed prefix sum (packing.global_prefix_sum) — file listings
    of a 100 TB table are millions of rows, not driver material.

    Output: (path, size_bytes, group_id, group_total_bytes). Reference
    parity: the file-maintenance arm of the reference's load manager
    (src/utils/incremental_load_manager.py's write path) which rewrites
    per-partition; the plan here is engine-agnostic metadata.
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    from metadata_etl_framework_spark.ops.packing import global_prefix_sum

    # (size, path) gives a deterministic total order even with duplicate
    # sizes; the prefix sum requires a unique order key, so order by the
    # path string (unique by construction of a file listing)
    ordered = files.select(
        F.col(path_col).alias("path"),
        F.col(size_col).cast("long").alias("size_bytes"),
    )
    summed = global_prefix_sum(ordered, "path", "size_bytes", out="__cum")
    grouped = summed.withColumn(
        "group_id",
        F.floor(
            (F.col("__cum") - F.col("size_bytes")).cast("double")
            / float(target_bytes)
        ).cast("long"),
    )
    w = Window.partitionBy("group_id")
    return grouped.withColumn(
        "group_total_bytes", F.sum("size_bytes").over(w).cast("long")
    ).select("path", "size_bytes", "group_id", "group_total_bytes")


def partition_plan(
    df: DataFrame,
    candidate_cols: Sequence[str],
    min_partitions: int = 2,
    max_partitions: int = 10_000,
    max_top_share: float = 0.5,
) -> DataFrame:
    """Advise which columns are sane ``partitionBy`` keys for a write —
    the three failure modes it screens for are the classic ones:
    cardinality too high (millions of tiny directories), cardinality
    too low (no pruning), and a dominant value (one partition holds the
    table, small-files everywhere else).

    ALL candidates are profiled in ONE pass: the frame melts to
    (column, value) cells (a ×|candidates| projection, no extra scan),
    one groupBy counts per-value occupancy, and the per-column verdict
    aggregates the ≤ Σcardinality count rows. Exact statistics —
    cardinality screening with approximate distinct counts flips
    verdicts right at the boundary.

    Output: (column, n_distinct, null_frac, top1_share, recommended),
    6-dp fractions.
    """
    if not candidate_cols:
        raise ValueError("candidate_cols must be non-empty")
    k = len(candidate_cols)
    stack_args: list[Column] = []
    for c in candidate_cols:
        stack_args += [F.lit(c), F.col(c).cast("string")]
    melted = df.select(
        F.stack(F.lit(k), *stack_args).alias("column", "value")
    )
    per_value = melted.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_col = per_value.groupBy("column").agg(
        F.count(F.when(F.col("value").isNotNull(), 1)).alias("n_distinct"),
        F.coalesce(
            F.sum(F.when(F.col("value").isNull(), F.col("cnt"))), F.lit(0)
        ).alias("_nulls"),
        F.coalesce(
            F.max(F.when(F.col("value").isNotNull(), F.col("cnt"))), F.lit(0)
        ).alias("_top1"),
        F.sum("cnt").alias("_total"),
    )
    top_share = F.when(
        F.col("_total") > F.col("_nulls"),
        F.col("_top1") / (F.col("_total") - F.col("_nulls")),
    ).otherwise(F.lit(0.0))
    return per_col.select(
        "column",
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.round(F.col("_nulls") / F.col("_total"), 6).alias("null_frac"),
        F.round(top_share, 6).alias("top1_share"),
        (
            (F.col("n_distinct") >= min_partitions)
            & (F.col("n_distinct") <= max_partitions)
            & (top_share <= F.lit(float(max_top_share)))
        ).alias("recommended"),
    )


# ----------------------------------------------------------- versioning
# Poor-man's table versioning over plain parquet directories — snapshot
# isolation for readers and instant rollback without a table format
# (when Delta IS available, incremental/delta.py's arm is the real
# thing; this covers the plain-parquet estate). Single-writer
# discipline: the manifest is an append-only parquet log, and two
# concurrent writers could allocate the same version — serialize writes
# per table path (the reference's loaders assume the same).


def _manifest_path(path: str) -> str:
    import os

    return os.path.join(path, "_manifest")


def _read_manifest(spark, path: str):
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(_manifest_path(path))
    except AnalysisException:
        return None


def versioned_write(df: DataFrame, path: str) -> int:
    """Write ``df`` as a NEW immutable version under ``path/v=N/`` and
    record it in the append-only manifest log. Readers pinned to an
    older version (or reading mid-write) are untouched — the new data
    directory is complete before the manifest row lands, so the version
    only becomes visible atomically with its data. Returns N."""
    import os

    spark = df.sparkSession
    m = _read_manifest(spark, path)
    next_v = 1
    if m is not None:
        row = m.agg(
            F.coalesce(F.max("version"), F.lit(0)).alias("v"),
            F.coalesce(F.max("seq"), F.lit(0)).alias("s"),
        ).first()
        next_v, next_seq = int(row["v"]) + 1, int(row["s"]) + 1
    else:
        next_seq = 1
    df.write.mode("overwrite").parquet(os.path.join(path, f"v={next_v}"))
    spark.createDataFrame(
        [(next_seq, "write", next_v)], "seq long, action string, version long"
    ).coalesce(1).write.mode("append").parquet(_manifest_path(path))
    return next_v


def current_version(spark, path: str) -> "int | None":
    """The version a plain read should serve: the target of the
    highest-sequence manifest row — a rollback simply appends a row
    pointing back at an old version (nothing is deleted; roll FORWARD
    again by rolling back to the newer version)."""
    m = _read_manifest(spark, path)
    if m is None:
        return None
    row = m.orderBy(F.desc("seq")).select("version").first()
    return int(row["version"]) if row else None


def read_version(spark, path: str, version: "int | None" = None) -> DataFrame:
    """Read a pinned ``version`` (time travel) or the current one."""
    import os

    v = version if version is not None else current_version(spark, path)
    if v is None:
        raise ValueError(f"no versions written under {path!r}")
    return spark.read.parquet(os.path.join(path, f"v={v}"))


def rollback_version(spark, path: str, version: int) -> int:
    """Append a manifest row making ``version`` current again. The data
    directories are immutable — rollback is O(1) metadata, and the
    rolled-back-from version remains readable by pin."""
    m = _read_manifest(spark, path)
    if m is None:
        raise ValueError(f"no versions written under {path!r}")
    known = {int(r["version"]) for r in m.select("version").collect()}
    if version not in known:
        raise ValueError(f"unknown version {version} (have {sorted(known)})")
    next_seq = int(m.agg(F.max("seq")).first()[0]) + 1
    spark.createDataFrame(
        [(next_seq, "rollback", version)],
        "seq long, action string, version long",
    ).coalesce(1).write.mode("append").parquet(_manifest_path(path))
    return version


def list_versions(spark, path: str) -> DataFrame:
    """The manifest log: (seq, action, version), ascending — the audit
    trail of writes and rollbacks."""
    m = _read_manifest(spark, path)
    if m is None:
        raise ValueError(f"no versions written under {path!r}")
    return m.orderBy("seq")
