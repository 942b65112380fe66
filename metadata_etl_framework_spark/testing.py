"""Seeded mock-data generation from schema dicts.

Parity target: MockDataGenerator (reference:
tests/mock_data_generator.py:22-279) — valid rows from a schema dict,
invalid rows (nulls / wrong types / out-of-range / invalid formats on
~30% of columns), and edge cases (empty string, min/max, unicode,
specials, zero, null). seed=42 convention preserved.

Generation happens driver-side with stdlib ``random`` (rows are
test-sized); `as_dataframe` lands them in Spark for distributed use.
"""

from __future__ import annotations

import random
import string
import uuid
from datetime import date, datetime, timedelta
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from metadata_etl_framework_spark.catalog.schema import schema_dict_to_structtype

EDGE_STRINGS = ["", "测试数据🚀", "!@#$%^&*()", " leading space", "trailing space "]


class MockDataGenerator:
    def __init__(self, seed: int = 42):
        self.rng = random.Random(seed)

    # ------------------------------------------------------------- valid

    def _value(self, spec: dict[str, Any]):
        t = str(spec.get("type", "string")).lower()
        rng = self.rng
        if spec.get("nullable", True) and rng.random() < 0.05:
            return None
        if spec.get("allowed_values"):
            return rng.choice(list(spec["allowed_values"]))
        if t in ("int64", "int32", "int"):
            return rng.randint(int(spec.get("min", 0)), int(spec.get("max", 10**6)))
        if t in ("float64", "float32", "float"):
            return rng.uniform(float(spec.get("min", 0.0)), float(spec.get("max", 1e6)))
        if t == "bool":
            return rng.random() < 0.5
        if t == "uuid":
            return str(uuid.UUID(int=rng.getrandbits(128)))
        if t == "date":
            start = date.fromisoformat(str(spec.get("start_date", "2020-01-01")))
            end = date.fromisoformat(str(spec.get("end_date", "2024-12-31")))
            return start + timedelta(days=rng.randint(0, (end - start).days))
        if t in ("datetime64[ns]", "datetime", "timestamp"):
            base = datetime(2023, 1, 1)
            return base + timedelta(seconds=rng.randint(0, 365 * 24 * 3600))
        max_len = int(spec.get("max_length", 20))
        n = rng.randint(1, max(1, min(max_len, 20)))
        return "".join(rng.choices(string.ascii_letters, k=n))

    def generate_valid(self, schema: dict[str, dict], rows: int) -> list[dict]:
        return [
            {c: self._value(s) for c, s in schema.items()} for _ in range(rows)
        ]

    # ----------------------------------------------------------- invalid

    def generate_invalid(
        self, schema: dict[str, dict], rows: int, error_rate: float = 0.3
    ) -> list[dict]:
        """~error_rate of columns get one corruption mode each."""
        cols = list(schema)
        bad_cols = self.rng.sample(cols, k=max(1, int(len(cols) * error_rate)))
        modes = ["nulls", "out_of_range", "invalid_format"]
        col_mode = {c: self.rng.choice(modes) for c in bad_cols}
        out = []
        for row in self.generate_valid(schema, rows):
            for c, mode in col_mode.items():
                if self.rng.random() > 0.3:
                    continue
                spec = schema[c]
                if mode == "nulls":
                    row[c] = None
                elif mode == "out_of_range" and spec.get("max") is not None:
                    row[c] = type(row[c])(spec["max"] * 10) if row[c] is not None else None
                elif mode == "invalid_format" and str(spec.get("type")) == "string":
                    row[c] = self.rng.choice(["not-a-date", "99/99/99", ""])
            out.append(row)
        return out

    # -------------------------------------------------------------- edge

    def generate_edge_cases(self, schema: dict[str, dict]) -> list[dict]:
        """One row per edge mode, applied to every eligible column."""
        rows = []
        for mode in ("zero_or_min", "maximum", "empty_or_unicode", "null"):
            row: dict[str, Any] = {}
            for c, spec in schema.items():
                t = str(spec.get("type", "string")).lower()
                if mode == "null":
                    row[c] = None if spec.get("nullable", True) else self._value(spec)
                elif t.startswith(("int", "float")):
                    lo = spec.get("min", 0)
                    hi = spec.get("max", 10**6)
                    row[c] = (
                        type(self._value({**spec, "nullable": False}))(lo)
                        if mode in ("zero_or_min", "empty_or_unicode")
                        else type(self._value({**spec, "nullable": False}))(hi)
                    )
                elif t in ("string", "uuid"):
                    row[c] = (
                        self.rng.choice(EDGE_STRINGS)
                        if mode == "empty_or_unicode"
                        else self._value({**spec, "nullable": False})
                    )
                else:
                    row[c] = self._value({**spec, "nullable": False})
            rows.append(row)
        return rows

    # ------------------------------------------------------------- spark

    def as_dataframe(
        self, spark: SparkSession, schema: dict[str, dict], rows: list[dict]
    ) -> DataFrame:
        # all-nullable variant of the declared schema: dirty test data
        # violates declared nullability BY DESIGN (that's what the DQ
        # rules are there to catch) and must still load
        from pyspark.sql import types as T

        declared = schema_dict_to_structtype(schema)
        struct = T.StructType(
            [T.StructField(f.name, f.dataType, True) for f in declared.fields]
        )
        return spark.createDataFrame(
            [tuple(r[f.name] for f in struct.fields) for r in rows], struct
        )


EMPLOYEE_SCHEMA = {
    "employee_id": {"type": "int64", "nullable": False, "min": 1, "max": 999999},
    "first_name": {"type": "string", "nullable": False, "max_length": 50},
    "email": {"type": "string", "nullable": False, "max_length": 100,
              "regex": r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$"},
    "age": {"type": "int64", "nullable": True, "min": 18, "max": 65},
    "salary": {"type": "float64", "nullable": True, "min": 30000, "max": 200000},
    "hire_date": {"type": "date", "nullable": False},
    "department": {"type": "string", "nullable": True,
                   "allowed_values": ["HR", "IT", "Finance", "Marketing"]},
    "is_active": {"type": "bool", "nullable": False},
}
