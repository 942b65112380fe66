from metadata_etl_framework_spark.operators.step_compiler import (  # noqa: F401
    TransformEngine,
)
