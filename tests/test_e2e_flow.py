"""End-to-end extract → transform → load flows mirroring the reference's
integration tests (tests/integration_tests.py:131-258): derive-columns
transform then load-and-verify, and the incremental upsert pattern where
the updated record wins."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_etl_framework_spark.incremental.merge import merge_upsert
from metadata_etl_framework_spark.operators import TransformEngine
from metadata_etl_framework_spark.sources.file_connector import FileConnector


def test_transform_and_load_flow(spark, tmp_path):
    """Mirror of test_transform_and_load_integration: derive full_name /
    age_group / annual_salary, load to a target, verify the row count and
    derived values."""
    source = spark.createDataFrame(
        [(1, "Alice", 25, 50000.0), (2, "Bob", 30, 60000.0),
         (3, "Charlie", 35, 70000.0)],
        "id int, name string, age int, salary double",
    )
    engine = TransformEngine(spark)
    transformed = engine.execute_transformations(
        {"source_data": source},
        {
            "primary_source": "source_data",
            "steps": [
                {
                    "type": "map",
                    "config": {
                        "derive": {
                            "full_name": "name",
                            "age_group": (
                                "CASE WHEN age < 30 THEN 'Young' "
                                "WHEN age < 40 THEN 'Middle' "
                                "ELSE 'Senior' END"
                            ),
                            "annual_salary": "salary",
                            "processed_date": "DATE '2023-01-01'",
                        },
                        "drop": ["name", "age", "salary"],
                    },
                }
            ],
        },
    )
    target = str(tmp_path / "target")
    fc = FileConnector(spark)
    fc.write(transformed, target, fmt="parquet")

    back = fc.read(target, fmt="parquet")
    assert back.count() == 3
    groups = {r.full_name: r.age_group for r in back.collect()}
    assert groups == {"Alice": "Young", "Bob": "Middle", "Charlie": "Middle"}


def test_incremental_upsert_flow(spark, tmp_path):
    """Mirror of test_incremental_load_simulation: initial load, then an
    incremental batch where an updated record replaces the original and a
    new record appends."""
    target_path = str(tmp_path / "incr_target")
    initial = spark.createDataFrame(
        [(1, "Alice", "2023-01-01"), (2, "Bob", "2023-01-01")],
        "id int, full_name string, processed_date string",
    )
    initial.write.parquet(target_path)

    incremental = spark.createDataFrame(
        [(2, "Bob Updated", "2023-01-02"), (3, "Charlie", "2023-01-02")],
        "id int, full_name string, processed_date string",
    )
    merged = merge_upsert(spark.read.parquet(target_path), incremental, ["id"])
    out_path = str(tmp_path / "incr_out")
    merged.write.parquet(out_path)

    result = spark.read.parquet(out_path)
    assert result.count() == 3
    rows = {r.id: (r.full_name, r.processed_date) for r in result.collect()}
    assert rows[1] == ("Alice", "2023-01-01")      # untouched
    assert rows[2] == ("Bob Updated", "2023-01-02")  # source wins
    assert rows[3] == ("Charlie", "2023-01-02")    # new key appended


def test_tolerant_write_quarantines_bad_rows(spark):
    """Batch insert fails → per-row retry → persistent failures quarantine
    (the reference's skip-bad-rows relational insert semantics)."""
    from metadata_etl_framework_spark.utils.error_recovery import tolerant_write

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id int, v string"
    )
    sink: list[dict] = []
    rejects: list[dict] = []

    def write_batch(rows):
        if any(r["id"] % 4 == 0 for r in rows):
            raise IOError("constraint violation")
        sink.extend(rows)

    stats = tolerant_write(
        df, write_batch, on_reject=rejects.extend, batch_size=3
    )
    assert stats == {"written": 7, "rejected": 3}  # ids 0,4,8 rejected
    assert {r["id"] for r in sink} == {1, 2, 3, 5, 6, 7, 9}
    assert {r["id"] for r in rejects} == {0, 4, 8}


def test_curation_pipeline_end_to_end(spark, tmp_path):
    """The README's declarative curation pipeline: documents → near dedup
    → quality filter → weighted sample → leakage-safe split → parquet,
    entirely through the config step compiler; the written output must
    be deduplicated, above the quality floor, sized by the sample k, and
    carry a total split assignment."""
    from metadata_etl_framework_spark.sources.file_connector import (
        FileConnector,
    )
    from metadata_etl_framework_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    engine = TransformEngine(spark)
    curated = engine.execute_transformations(
        {"docs": docs},
        {"primary_source": "docs",
         "steps": [
            {"type": "dedup", "config": {"method": "near",
                                         "threshold": 0.5,
                                         "num_hashes": 32,
                                         "num_bands": 8}},
            {"type": "quality_filter", "config": {"min_score": 0.3,
                                                  "keep_score": True}},
            {"type": "sample", "config": {"mode": "weighted_k", "k": 50,
                                          "weight_column": "n_chars"}},
            {"type": "split", "config": {"fractions": {"train": 0.9,
                                                       "val": 0.05,
                                                       "test": 0.05}}},
         ]},
    )
    target = str(tmp_path / "curated")
    FileConnector(spark).write(curated, target, fmt="parquet")
    back = FileConnector(spark).read(target, fmt="parquet")

    rows = back.collect()
    assert len(rows) == 50
    assert all(r.quality_score >= 0.3 for r in rows)
    assert all(r.split in ("train", "val", "test") for r in rows)
    assert len({r.doc_id for r in rows}) == 50  # dedup upheld
    # deterministic: rerunning the same config reproduces the output
    again = engine.execute_transformations(
        {"docs": docs},
        {"primary_source": "docs",
         "steps": [
            {"type": "dedup", "config": {"method": "near",
                                         "threshold": 0.5,
                                         "num_hashes": 32,
                                         "num_bands": 8}},
            {"type": "quality_filter", "config": {"min_score": 0.3,
                                                  "keep_score": True}},
            {"type": "sample", "config": {"mode": "weighted_k", "k": 50,
                                          "weight_column": "n_chars"}},
            {"type": "split", "config": {"fractions": {"train": 0.9,
                                                       "val": 0.05,
                                                       "test": 0.05}}},
         ]},
    )
    assert {(r.doc_id, r.split) for r in again.collect()} == {
        (r.doc_id, r.split) for r in rows
    }
