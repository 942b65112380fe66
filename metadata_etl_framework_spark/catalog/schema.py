"""Schema system: schema-dict language → StructType, declared validation,
and rule generation from schema constraints.

Parity targets (reference):
- schema-dict language    tests/mock_data_generator.py:286-326
  ``{col: {type, nullable, min, max, max_length, ...}}``,
  type ∈ {int64, float64, string, date, datetime64[ns], bool, uuid}
- validate_schema         src/transform/transform_engine.py:305-313
- create_schema_from_metadata (pandera)  src/quality/dq_rule_examples.py:1169-1203
  — here constraints compile to this engine's own rule dicts
  (quality/rules.py) instead of pandera Checks.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_TYPE_MAP: dict[str, T.DataType] = {
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "int": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "float": T.DoubleType(),
    "string": T.StringType(),
    "str": T.StringType(),
    "date": T.DateType(),
    "datetime64[ns]": T.TimestampType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "uuid": T.StringType(),
}


def schema_dict_to_structtype(schema: dict[str, dict[str, Any]]) -> T.StructType:
    """Compile the reference's schema-dict language to a StructType."""
    fields = []
    for name, spec in schema.items():
        dtype = _TYPE_MAP.get(str(spec.get("type", "string")).lower())
        if dtype is None:
            raise ValueError(f"unknown schema type {spec.get('type')!r} for {name!r}")
        fields.append(T.StructField(name, dtype, bool(spec.get("nullable", True))))
    return T.StructType(fields)


def validate_schema(
    df: DataFrame, expected: dict[str, dict[str, Any]] | T.StructType
) -> list[str]:
    """Declared-schema validation; returns problems (empty = conforming).

    Checks column presence and type equality (nullable is advisory in
    Spark — parquet always allows nulls — so nullability mismatches
    report as warnings-style problems too).
    """
    if isinstance(expected, dict):
        expected = schema_dict_to_structtype(expected)
    actual = {f.name: f for f in df.schema.fields}
    problems = []
    for f in expected.fields:
        got = actual.get(f.name)
        if got is None:
            problems.append(f"missing column {f.name!r}")
        elif got.dataType != f.dataType:
            problems.append(
                f"column {f.name!r}: expected {f.dataType.simpleString()}, "
                f"got {got.dataType.simpleString()}"
            )
    extra = set(actual) - {f.name for f in expected.fields}
    for name in sorted(extra):
        problems.append(f"unexpected column {name!r}")
    return problems


def rules_from_schema(schema: dict[str, dict[str, Any]]) -> list[dict[str, Any]]:
    """Compile schema constraints to DQ rule dicts (quality/rules.py).

    Mirrors create_schema_from_metadata: not_null ← nullable=False,
    value_range ← min/max, regex_pattern ← regex, allowed_values ←
    allowed_values, data_type ← declared type coercibility.
    """
    rules: list[dict[str, Any]] = []
    for name, spec in schema.items():
        if not spec.get("nullable", True):
            rules.append({"name": f"{name}_not_null", "type": "not_null",
                          "column": name})
        if spec.get("min") is not None or spec.get("max") is not None:
            rules.append(
                {"name": f"{name}_range", "type": "value_range", "column": name,
                 "min": spec.get("min"), "max": spec.get("max")}
            )
        if spec.get("regex"):
            rules.append({"name": f"{name}_regex", "type": "regex_pattern",
                          "column": name, "pattern": spec["regex"]})
        if spec.get("allowed_values"):
            rules.append({"name": f"{name}_allowed", "type": "allowed_values",
                          "column": name,
                          "allowed_values": list(spec["allowed_values"])})
        if spec.get("max_length"):
            rules.append({"name": f"{name}_maxlen", "type": "expression",
                          "expression":
                              f"{name} IS NULL OR length({name}) <= {int(spec['max_length'])}"})
    return rules
