"""Transformation library: pure DataFrame -> DataFrame functions.

Spark-first re-expression of the reference transformation library
(reference: src/transform/transformation_library.py). Every function is
lazy — it returns a transformed DataFrame and never triggers an action —
so a chain of these compiles into ONE Catalyst plan with full predicate
pushdown / column pruning / join planning.
"""

from metadata_etl_framework_spark.functions.filters import (  # noqa: F401
    filter_by_condition,
    filter_by_date_range,
    filter_by_multiple_conditions,
    filter_expr,
)
from metadata_etl_framework_spark.functions.projections import (  # noqa: F401
    drop_columns,
    melt,
    rename_columns,
    reorder_columns,
)
from metadata_etl_framework_spark.functions.conversions import (  # noqa: F401
    convert_to_datetime,
    convert_to_numeric,
    convert_to_string,
    convert_types,
    parse_json_column,
)
from metadata_etl_framework_spark.functions.joins import (
    asof_join,
    range_count,
    range_join,  # noqa: F401
    detect_deletes,
    inner_join,
    join_data,
    left_join,
    merge_multiple,
    referential_integrity_violations,
)
from metadata_etl_framework_spark.functions.aggregations import (  # noqa: F401
    correlation,
    deduplicate_data,
    duplicate_rows,
    groupby_aggregate,
    groupwise_quantiles,
    heavy_hitters,
    histogram,
    pivot_table,
    profile_columns,
    sample_n_per_group,
    topk_per_group,
    value_counts_topk,
)
from metadata_etl_framework_spark.functions.skew import diagnose_skew, salted_join  # noqa: F401
from metadata_etl_framework_spark.functions.udfs import (  # noqa: F401
    apply_custom_function,
    apply_row_wise_function,
)
from metadata_etl_framework_spark.functions.windows import (  # noqa: F401
    lag_lead,
    rank_within_group,
    rolling_aggregate,
    running_total,
)
