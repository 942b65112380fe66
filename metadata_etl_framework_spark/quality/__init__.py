from metadata_etl_framework_spark.quality.rules import (  # noqa: F401
    RuleResult,
    compile_rule,
    evaluate_rules,
)
