"""File source/sink: csv / json / parquet, local + object stores.

Parity targets (reference):
- FileConnector.read   src/connectors/file_connector.py:104-201
- FileConnector.write  src/connectors/file_connector.py:203-333
- get_schema           src/connectors/file_connector.py:335-348

Spark-first notes: the reference hand-rolled boto3/Blob/GCS/HDFS clients
per scheme; Spark reads the same formats through the Hadoop FS layer, so
``s3a://``, ``abfss://``, ``gs://``, ``hdfs://`` URIs work with the SAME
reader code — nothing scheme-specific lives here. Excel has no native
Spark reader; it is bridged through pandas on the driver (small files
only, as in the reference).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {"csv", "json", "parquet", "orc", "text"}


def _infer_format(path: str, fmt: str | None) -> str:
    if fmt:
        return fmt.lower()
    suffix = path.rstrip("/").rsplit(".", 1)[-1].lower()
    if suffix in _FORMATS or suffix in {"xlsx", "xls"}:
        return "excel" if suffix in {"xlsx", "xls"} else suffix
    return "parquet"


class FileConnector:
    """Reads/writes files of any supported format on any Hadoop-visible FS."""

    def __init__(self, spark: SparkSession, options: dict[str, Any] | None = None):
        self.spark = spark
        self.options = options or {}

    def read(
        self,
        path: str,
        fmt: str | None = None,
        schema: Any | None = None,
        **options: Any,
    ) -> DataFrame:
        fmt = _infer_format(path, fmt)
        opts = {**self.options, **options}
        if fmt == "excel":
            return self._read_excel(path, **opts)
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        if fmt == "csv":
            opts.setdefault("header", "true")
            opts.setdefault("inferSchema", "true" if schema is None else "false")
        return reader.options(**opts).format(fmt).load(path)

    def write(
        self,
        df: DataFrame,
        path: str,
        fmt: str | None = None,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        **options: Any,
    ) -> None:
        """Write with mode ∈ {overwrite, append, ignore, errorifexists}.

        ``partition_by`` produces hive-style partition directories — the
        scale path for incremental pruning at 100 TB.
        """
        fmt = _infer_format(path, fmt)
        if fmt == "excel":
            self._write_excel(df, path, **options)
            return
        writer = df.write.mode(mode).options(**{**self.options, **options})
        if fmt == "csv":
            writer = writer.option("header", "true")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.format(fmt).save(path)

    def get_schema(self, path: str, fmt: str | None = None) -> dict[str, Any]:
        """Schema sample in the reference's ``{"columns": [...]}`` shape."""
        df = self.read(path, fmt)
        return {
            "columns": df.columns,
            "fields": [
                {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
                for f in df.schema.fields
            ],
        }

    # ---------------------------------------------- object management
    # (reference cloud_connector.py:334-389 — list/delete per cloud SDK;
    # here ONE Hadoop FileSystem code path serves file://, s3a://,
    # abfss://, gs://, hdfs:// identically)

    def _fs_and_path(self, path: str):
        sc = self.spark.sparkContext
        hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
        return fs, hpath

    def list_objects(self, path: str, recursive: bool = False) -> list[str]:
        """Object/file listing under a URI prefix (any Hadoop-visible FS)."""
        fs, hpath = self._fs_and_path(path)
        if not fs.exists(hpath):
            return []
        out: list[str] = []
        it = fs.listFiles(hpath, recursive)
        while it.hasNext():
            out.append(it.next().getPath().toString())
        return sorted(out)

    def object_exists(self, path: str) -> bool:
        fs, hpath = self._fs_and_path(path)
        return bool(fs.exists(hpath))

    def delete_object(self, path: str, recursive: bool = False) -> bool:
        """Delete a file or (with recursive) a directory tree; False when
        the path didn't exist."""
        fs, hpath = self._fs_and_path(path)
        if not fs.exists(hpath):
            return False
        return bool(fs.delete(hpath, recursive))

    def _read_excel(self, path: str, **opts: Any) -> DataFrame:
        try:
            import pandas as pd
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("pandas required for excel reads") from e
        pdf = pd.read_excel(path, sheet_name=opts.get("sheet_name", 0))
        return self.spark.createDataFrame(pdf)

    # default guard: xlsx is a driver-side single-file format; a silent
    # multi-GB toPandas() is an OOM, so the cap is explicit and overridable
    EXCEL_MAX_ROWS = 1_000_000

    def _write_excel(self, df: DataFrame, path: str, **opts: Any) -> None:
        """Driver-side xlsx sink (reference: file_connector.py:203-333).

        Size-guarded: counts first and refuses beyond ``max_rows`` (also
        Excel's own sheet limit is ~1,048,576 rows). Requires openpyxl —
        import-gated with a clear error."""
        max_rows = int(opts.pop("max_rows", self.EXCEL_MAX_ROWS))
        n = df.count()
        if n > max_rows:
            raise ValueError(
                f"excel sink refuses {n} rows (> {max_rows}); xlsx is a "
                "driver-side format — write parquet/csv for data this size"
            )
        try:
            import openpyxl  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "openpyxl required for excel writes (pip install openpyxl)"
            ) from e
        sheet = opts.pop("sheet_name", "Sheet1")
        df.toPandas().to_excel(path, sheet_name=sheet, index=False, **opts)
