"""Schema system + mock-generator tests (SURVEY §1.3, §5)."""

from __future__ import annotations

from pyspark.sql import types as T

from metadata_etl_framework_spark.catalog.schema import (
    rules_from_schema,
    schema_dict_to_structtype,
    validate_schema,
)
from metadata_etl_framework_spark.quality.rules import evaluate_rules
from metadata_etl_framework_spark.testing import EMPLOYEE_SCHEMA, MockDataGenerator


def test_schema_dict_compiles_to_structtype():
    st = schema_dict_to_structtype(EMPLOYEE_SCHEMA)
    by_name = {f.name: f for f in st.fields}
    assert isinstance(by_name["employee_id"].dataType, T.LongType)
    assert not by_name["employee_id"].nullable
    assert isinstance(by_name["salary"].dataType, T.DoubleType)
    assert isinstance(by_name["hire_date"].dataType, T.DateType)
    assert isinstance(by_name["is_active"].dataType, T.BooleanType)


def test_validate_schema_reports_mismatches(spark):
    df = spark.createDataFrame([(1, "x", 2.0)], "employee_id long, extra string, age double")
    problems = validate_schema(
        df,
        {"employee_id": {"type": "int64", "nullable": False},
         "age": {"type": "int64"}},
    )
    assert any("age" in p and "bigint" in p for p in problems)
    assert any("unexpected column 'extra'" in p for p in problems)
    assert validate_schema(
        df.select("employee_id"), {"employee_id": {"type": "int64"}}
    ) == []


def test_rules_from_schema_and_generated_data(spark):
    """Round-trip: generated-valid data passes the schema-derived rules;
    generated-invalid data fails some of them."""
    gen = MockDataGenerator(seed=42)
    rules = rules_from_schema(EMPLOYEE_SCHEMA)
    rule_types = {r["type"] for r in rules}
    assert {"not_null", "value_range", "regex_pattern", "allowed_values",
            "expression"} <= rule_types

    # valid data: every rule except email regex (random strings aren't
    # emails) must pass at 100%
    valid = gen.generate_valid(
        {**EMPLOYEE_SCHEMA,
         "email": {**EMPLOYEE_SCHEMA["email"], "regex": None}}, 200)
    df = gen.as_dataframe(spark, EMPLOYEE_SCHEMA, valid)
    results = evaluate_rules(df, [r for r in rules if r["type"] != "regex_pattern"])
    assert all(r.failed_rows == 0 for r in results), [
        (r.rule_name, r.failed_rows) for r in results
    ]

    # invalid data: corruption must surface as failures somewhere
    bad = gen.generate_invalid(EMPLOYEE_SCHEMA, 200)
    bad_df = gen.as_dataframe(spark, EMPLOYEE_SCHEMA, bad)
    bad_results = evaluate_rules(bad_df, rules)
    assert sum(r.failed_rows for r in bad_results) > 0


def test_edge_cases_cover_modes(spark):
    gen = MockDataGenerator(seed=42)
    edges = gen.generate_edge_cases(EMPLOYEE_SCHEMA)
    assert len(edges) == 4
    df = gen.as_dataframe(spark, EMPLOYEE_SCHEMA, edges)
    assert df.count() == 4
    ages = [r.age for r in df.collect()]
    assert 18 in ages and 65 in ages  # min/max rows present


def test_generator_is_deterministic():
    a = MockDataGenerator(seed=42).generate_valid(EMPLOYEE_SCHEMA, 50)
    b = MockDataGenerator(seed=42).generate_valid(EMPLOYEE_SCHEMA, 50)
    assert a == b
    c = MockDataGenerator(seed=7).generate_valid(EMPLOYEE_SCHEMA, 50)
    assert a != c
