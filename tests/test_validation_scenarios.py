"""Mirror of the reference's data-validation scenario suite
(tests/data_validation_tests.py) through THIS engine's surfaces:
schema conformance, per-dtype validation, referential integrity,
business rules, and completeness variants — each scenario a compact
assertion against the rule compiler / schema validator."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_etl_framework_spark.catalog.schema import validate_schema
from metadata_etl_framework_spark.functions import (
    referential_integrity_violations,
)
from metadata_etl_framework_spark.quality.rules import evaluate_rules


def _results_by_name(results):
    return {r.rule_name: r for r in results}


# ----------------------------------------------------- schema conformance


def test_schema_conformance_scenarios(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5)], "id bigint, name string, score double"
    )
    expected = {
        "id": {"type": "int64"},
        "name": {"type": "string"},
        "score": {"type": "float64"},
    }
    # valid data conforms
    assert validate_schema(df, expected) == []
    # missing column
    probs = validate_schema(df.drop("score"), expected)
    assert any("missing column 'score'" in p for p in probs)
    # wrong type
    probs = validate_schema(
        df.withColumn("score", F.col("score").cast("string")), expected
    )
    assert any("expected double" in p for p in probs)
    # unexpected extra column
    probs = validate_schema(df.withColumn("extra", F.lit(1)), expected)
    assert any("unexpected column 'extra'" in p for p in probs)


def test_dtype_validation_with_nulls(spark):
    """data_type rule per dtype, nulls never counted as violations
    (reference :141-184)."""
    df = spark.createDataFrame(
        [("1", "1.5", "2024-01-02", None), ("x", "y", "nope", "z")],
        "i string, f string, d string, n string",
    )
    res = _results_by_name(evaluate_rules(df, [
        {"name": "int_ok", "type": "data_type", "column": "i",
         "expected_type": "int"},
        {"name": "float_ok", "type": "data_type", "column": "f",
         "expected_type": "double"},
        {"name": "date_ok", "type": "date_format", "column": "d"},
        {"name": "null_col", "type": "data_type", "column": "n",
         "expected_type": "int"},
    ]))
    assert res["int_ok"].failed_rows == 1      # 'x'
    assert res["float_ok"].failed_rows == 1    # 'y'
    assert res["date_ok"].failed_rows == 1     # 'nope'
    assert res["null_col"].failed_rows == 1    # 'z'; the NULL row passes


# -------------------------------------------------- referential integrity


def test_foreign_key_scenarios(spark):
    """FK violation surface mirrors :243-271 (employee→department)."""
    employees = spark.createDataFrame(
        [(1, "Alice", 10), (2, "Bob", 20), (3, "Charlie", 99), (4, "Dana", None)],
        "emp_id int, emp_name string, dept_id int",
    )
    departments = spark.createDataFrame(
        [(10, "HR"), (20, "IT")], "dept_id int, dept_name string"
    )
    viol = referential_integrity_violations(
        employees, departments, "dept_id", "dept_id"
    )
    rows = viol.collect()
    # exactly the orphan (Charlie); NULL FK rows are not violations
    assert [r.emp_name for r in rows] == ["Charlie"]
    # and the rule-engine path agrees
    res = _results_by_name(evaluate_rules(
        employees,
        [{"name": "fk", "type": "referential_integrity", "column": "dept_id",
          "ref": "departments", "ref_column": "dept_id"}],
        refs={"departments": departments},
    ))
    assert res["fk"].failed_rows == 1


# ---------------------------------------------------------- business rules


def test_business_rule_scenarios(spark):
    """Range / date-logic / conditional / membership rules (:308-400)."""
    df = spark.createDataFrame(
        [
            (1, 25, 30000.0, "2020-01-01", "2023-01-01", "HR"),
            (2, 30, 50000.0, "2019-01-01", None, "IT"),
            (3, 17, 70000.0, "2018-01-01", None, "Finance"),   # underage
            (4, 40, 500.0, "2017-01-01", None, "IT"),          # salary low
            (5, 45, 110000.0, "2026-01-01", "2016-01-01", "Sales"),  # term<hire, bad dept
        ],
        "id int, age int, salary double, hire_date string, term_date string, dept string",
    ).select(
        "id", "age", "salary",
        F.col("hire_date").cast("timestamp").alias("hire_date"),
        F.col("term_date").cast("timestamp").alias("term_date"),
        "dept",
    )
    res = _results_by_name(evaluate_rules(df, [
        {"name": "age_range", "type": "value_range", "column": "age",
         "min": 18, "max": 70},
        {"name": "salary_range", "type": "value_range", "column": "salary",
         "min": 20000.0, "max": 200000.0},
        {"name": "date_logic", "type": "date_sequence",
         "start_column": "hire_date", "end_column": "term_date"},
        {"name": "dept_membership", "type": "allowed_values", "column": "dept",
         "allowed_values": ["HR", "IT", "Finance"]},
        {"name": "conditional", "type": "expression",
         "expression": "NOT (dept = 'IT') OR salary >= 40000"},
    ]))
    assert res["age_range"].failed_rows == 1        # id 3
    assert res["salary_range"].failed_rows == 1     # id 4
    assert res["date_logic"].failed_rows == 1       # id 5
    assert res["dept_membership"].failed_rows == 1  # id 5 (Sales)
    assert res["conditional"].failed_rows == 1      # id 4 (IT under 40k)


# ----------------------------------------------------------- completeness


def test_completeness_scenarios(spark):
    """Required / optional / always-null / never-null / multi-field
    completeness (:406-465), incl. the percentage calculation."""
    df = spark.createDataFrame(
        [(1, "a", None, 1.0), (2, None, None, 2.0),
         (3, "c", None, 3.0), (4, "d", None, 4.0)],
        "id int, opt string, always_null string, never_null double",
    )
    res = _results_by_name(evaluate_rules(df, [
        {"name": "req", "type": "required_fields", "columns": ["id", "never_null"]},
        {"name": "opt", "type": "not_null", "column": "opt", "threshold": 70.0},
        {"name": "always", "type": "not_null", "column": "always_null"},
        {"name": "never", "type": "not_null", "column": "never_null"},
        {"name": "multi", "type": "completeness_score",
         "columns": ["opt", "always_null", "never_null"], "threshold": 50.0},
    ]))
    assert res["req"].failed_rows == 0
    assert res["opt"].failed_rows == 1 and res["opt"].passed  # 75% ≥ 70%
    assert res["always"].failed_rows == 4 and not res["always"].passed
    assert res["never"].failed_rows == 0 and res["never"].passed
    # completeness pct: null cells = 1 (opt) + 4 (always) + 0 = 5 of 12
    assert res["multi"].failed_rows == 5
    assert abs(res["multi"].score - 100.0 * (1 - 5 / 12)) < 1e-9
    assert res["multi"].passed  # 58.3% ≥ 50%
